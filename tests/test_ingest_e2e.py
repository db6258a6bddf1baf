"""End-to-end DICOM ingest through the dcm2csv CLI with the in-repo converter.

Builds a synthetic qMRI tree (dicom/YYYYMMDDHH/MMSS0000/*.dcm + the master
log_dcms.csv), runs ``--check`` and ``--process``, and verifies the BIDS
NIfTI, enriched sidecar, and per-session metadata CSV outputs — the full C1/C2
surface with NO external dcm2niix binary.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from fetal_t2mapping_tpu.cli import dcm2csv
from fetal_t2mapping_tpu.core import nifti
from fetal_t2mapping_tpu.utils.ingest import dcm2niix_available
from tests.test_dcm2nifti import write_test_dicom


@pytest.fixture
def qmri_tree(tmp_path):
    session = tmp_path / "qMRI" / "dicom" / "2024080610" / "30540000"
    session.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i, te in enumerate([114.0, 202.0, 299.0]):
        pix = rng.integers(0, 3000, (16, 16)).astype(np.uint16)
        write_test_dicom(str(session / f"im{i}.dcm"), pix,
                         ipp=(0.0, 0.0, 2.0 * i), te=te, instance=i + 1,
                         series_uid=f"1.2.3.{i}")
    logs = tmp_path / "qMRI" / "dicom" / "logs"
    logs.mkdir()
    pd.DataFrame([{"date": "2024080610", "dcm_parent": "30540000",
                   "prj": "prj-003", "sub": "sub-001", "ses": "ses-01"}]
                 ).to_csv(logs / "log_dcms.csv", index=False)
    return tmp_path / "qMRI", session


def test_check_lists_series(qmri_tree, capsys):
    qmri, session = qmri_tree
    rc = dcm2csv.main(["--path", str(session), "--check"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("t2_haste_test") == 3


@pytest.mark.skipif(dcm2niix_available(), reason="exercises the in-repo converter")
def test_process_end_to_end(qmri_tree):
    qmri, session = qmri_tree
    rc = dcm2csv.main(["--path", str(session), "--process"])
    assert rc == 0

    anat = qmri / "projects" / "prj-003" / "sub-001" / "ses-01" / "anat"
    niis = sorted(os.listdir(anat))
    assert [n for n in niis if n.endswith(".nii.gz")] == [
        f"sub-001_ses-01_run-{r:02d}_T2w.nii.gz" for r in (1, 2, 3)]

    vol = nifti.read(str(anat / "sub-001_ses-01_run-01_T2w.nii.gz"))
    assert vol.shape == (1, 16, 16)
    side = json.load(open(anat / "sub-001_ses-01_run-01_T2w.json"))
    assert side["Rows"] == 16 and side["Columns"] == 16
    assert side["EchoTime"] == pytest.approx(0.114)
    assert side["ImageOrientationPatientSTR"] == "ax"
    assert side["PixelSpacingX"] == pytest.approx(1.5)

    csvs = [f for f in os.listdir(qmri / "dicom" / "logs")
            if f.startswith("2024080610_")]
    assert csvs == ["2024080610_30540000.csv"]
    md = pd.read_csv(qmri / "dicom" / "logs" / csvs[0])
    assert len(md) == 3
    assert set(md["run"]) == {"run-01", "run-02", "run-03"}
    assert md["EchoTime"].tolist() == pytest.approx([0.114, 0.202, 0.299])


def test_process_rejects_pathless_dicom_dir():
    assert dcm2csv.main(["--path", "/tmp/definitely_missing_x", "--process"]) == 1
