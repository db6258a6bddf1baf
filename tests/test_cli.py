"""CLI entry points driven through main(argv) — the real user surface."""

import os

import numpy as np
import pandas as pd
import pytest

from fetal_t2mapping_tpu import config as C
from fetal_t2mapping_tpu.cli import qmri_reconstruction, t2mapping
from fetal_t2mapping_tpu.core import Volume, nifti
from fetal_t2mapping_tpu.labels.phantom import phantom_labels_from_seeds
from fetal_t2mapping_tpu.utils.bids import get_img_path

TES = [114, 202, 299]
SEEDS = [[8, 8, 10], [24, 8, 10], [40, 8, 10]]
GT = [594, 416, 284]


def _make_tree(root):
    bids = os.path.join(root, "projects/")
    logs = os.path.join(root, "dicom/logs/")
    os.makedirs(logs, exist_ok=True)
    shape = (20, 48, 48)
    geom = Volume(np.zeros(shape, np.float32), spacing=(1, 1, 1), origin=(0, 0, 0))
    labels = np.asarray(phantom_labels_from_seeds(geom, SEEDS, radius=3).data)
    t2 = np.zeros(shape, np.float32)
    for i, gt in enumerate(GT, start=1):
        t2[labels == i] = gt
    mask = (labels > 0).astype(np.uint8)
    rows = []
    for te in TES:
        acq = {"prj": "prj-003", "sub": "sub-001", "ses": "ses-01",
               "run": f"run-{te}", "EchoTime": te / 1000.0,
               "ImageOrientationPatientSTR": "ax", "CoilString": "Body"}
        sig = np.where(mask > 0, 650.0 * np.exp(-te / np.maximum(t2, 1e-3)), 0.0)
        nifti.write(get_img_path(bids, acq, C.RECON_DIRNAME),
                    geom.with_data(sig.astype(np.float32)))
        nifti.write(get_img_path(bids, acq, C.MASK_DIRNAME), geom.with_data(mask))
        nifti.write(get_img_path(bids, acq, C.PHANTOM_LABELS_DIRNAME),
                    geom.with_data(labels.astype(np.uint8)))
        rows.append(acq)
    pd.DataFrame(rows).to_csv(os.path.join(logs, "synthetic.csv"), index=False)
    return bids


def test_t2mapping_cli_end_to_end(tmp_path):
    bids = _make_tree(str(tmp_path))
    rc = t2mapping.main([
        "--path", str(tmp_path), "--csv", "synthetic.csv",
        "--in_vitro", "--gaussian", "--lf", "--sim", "7",
    ])
    assert rc == 0
    acq = {"prj": "prj-003", "sub": "sub-001", "ses": "ses-01",
           "run": f"run-{TES[0]}", "EchoTime": TES[0] / 1000.0,
           "ImageOrientationPatientSTR": "ax"}
    t2_path = get_img_path(bids, acq, C.T2MAP_DIRNAME).replace(
        "t2map.nii.gz", "sim-7_t2map_ada-gaussian.nii.gz")
    assert os.path.exists(t2_path), t2_path
    roi_path = t2_path.replace("sim-7_t2map_ada-gaussian.nii.gz",
                               "sim-7_ROI_data_ada-gaussian.csv")
    roi = pd.read_csv(roi_path)
    # the CSV lists every GT sphere; only the 3 synthesized ones have data
    np.testing.assert_allclose(roi["meanT2"][:3], roi["trueT2"][:3], rtol=0.02)
    assert roi["meanT2"][3:].isna().all()


def test_t2mapping_cli_bad_path():
    assert t2mapping.main(["--path", "/nope", "--csv", "x.csv",
                           "--in_vivo", "--gaussian", "--lf", "--sim", "1"]) == 1


def test_t2mapping_cli_rejects_model_conflict(tmp_path):
    with pytest.raises(SystemExit):
        t2mapping.main(["--path", str(tmp_path), "--csv", "x.csv", "--in_vivo",
                        "--gaussian", "--rician", "--lf", "--sim", "1"])


def test_recon_cli_in_vitro(tmp_path):
    _make_tree(str(tmp_path))
    rc = qmri_reconstruction.main([
        "--path", str(tmp_path), "--csv", "synthetic.csv",
        "--in_vitro", "--lf", "--synthseg", "fake",
    ])
    assert rc == 0
