"""DICOM mini-parser + ingest helpers, tested on hand-crafted DICOM files."""

import os
import struct

import numpy as np
import pandas as pd
import pytest

from fetal_t2mapping_tpu.utils.dicom import is_dcm_file, read_dcm
from fetal_t2mapping_tpu.utils.ingest import (
    assign_bids,
    dcms2csv,
    get_dcms,
    get_metabids,
    get_orientation_dcm,
)


def _el(group, elem, vr, value: bytes) -> bytes:
    """Encode one explicit-VR-LE data element."""
    if len(value) % 2:
        value += b"\x00" if vr != b"UI" else b"\x00"
    head = struct.pack("<HH", group, elem)
    if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
        return head + vr + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + vr + struct.pack("<H", len(value)) + value


def _sq_item(content: bytes) -> bytes:
    return struct.pack("<HHI", 0xFFFE, 0xE000, len(content)) + content


def make_dicom(path, *, series="haste_ax", acq_time="20240806103000.000000",
               rows=320, cols=320, spacing=(0.7, 0.8), iop=(1, 0, 0, 0, 1, 0)):
    """Write a minimal Part-10 explicit-VR-LE DICOM file."""
    meta_body = b""
    ts = b"1.2.840.10008.1.2.1\x00"
    meta_el = _el(0x0002, 0x0010, b"UI", ts)
    glen = _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_el)))
    meta_body = glen + meta_el

    iop_str = "\\".join(str(v) for v in iop).encode()
    pm_inner = _el(0x0028, 0x0030, b"DS", f"{spacing[0]}\\{spacing[1]}".encode())
    pm_seq = _el(0x0028, 0x9110, b"SQ", _sq_item(pm_inner))
    perframe = _el(0x5200, 0x9230, b"SQ", _sq_item(pm_seq))

    ds = (
        _el(0x0008, 0x002A, b"DT", acq_time.encode())
        + _el(0x0008, 0x103E, b"LO", series.encode())
        + _el(0x0020, 0x0037, b"DS", iop_str)
        + _el(0x0028, 0x0010, b"US", struct.pack("<H", rows))
        + _el(0x0028, 0x0011, b"US", struct.pack("<H", cols))
        + perframe
    )
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta_body + ds)


class TestMiniDicom:
    def test_magic_detection(self, tmp_path):
        p = str(tmp_path / "a.dcm")
        make_dicom(p)
        assert is_dcm_file(p)
        q = str(tmp_path / "b.txt")
        with open(q, "w") as f:
            f.write("not a dicom")
        assert not is_dcm_file(q)

    def test_parse_tags(self, tmp_path):
        p = str(tmp_path / "a.dcm")
        make_dicom(p, series="t2_haste_cor", rows=256, cols=192,
                   spacing=(0.5, 0.75), iop=(1, 0, 0, 0, 0, -1))
        ds = read_dcm(p)
        assert ds.SeriesDescription == "t2_haste_cor"
        assert ds.Rows == 256 and ds.Columns == 192
        assert ds.AcquisitionDateTime.startswith("20240806")
        iop = ds.ImageOrientationPatient
        assert get_orientation_dcm(iop) == "cor"
        pm = ds.PerFrameFunctionalGroupsSequence[0].PixelMeasuresSequence[0]
        np.testing.assert_allclose(pm.PixelSpacing, [0.5, 0.75])

    def test_orientation_classifier(self):
        assert get_orientation_dcm([1, 0, 0, 0, 1, 0]) == "ax"
        assert get_orientation_dcm([1, 0, 0, 0, 0, -1]) == "cor"
        assert get_orientation_dcm([0, 1, 0, 0, 0, -1]) == "sag"
        assert get_orientation_dcm([0.7, 0.7, 0, 0, 0, -1]) == "custom"


class TestIngest:
    def _session(self, tmp_path):
        d = tmp_path / "dicom" / "2024080610" / "30540000"
        d.mkdir(parents=True)
        for i, (series, t) in enumerate(
                [("haste_ax", "20240806103001"), ("haste_cor", "20240806103102"),
                 ("haste_sag", "20240806103203")]):
            make_dicom(str(d / f"IM{i:04d}"), series=series, acq_time=t)
        logs = tmp_path / "dicom" / "logs"
        logs.mkdir()
        pd.DataFrame([{"date": "2024080610", "dcm_parent": "30540000",
                       "prj": "prj-003", "sub": "sub-001", "ses": "ses-01"}]).to_csv(
            logs / "log_dcms.csv", index=False)
        return str(d), str(logs / "log_dcms.csv"), str(logs)

    def test_scan_assign_and_log(self, tmp_path):
        dcm_dir, log_path, logs_dir = self._session(tmp_path)
        dcms = get_dcms(dcm_dir)
        assert len(dcms) == 3
        # sorted by acquisition time
        assert [d["description"] for d in dcms] == ["haste_ax", "haste_cor", "haste_sag"]
        df = assign_bids(dcms, log_path)
        assert list(df["run"]) == ["run-01", "run-02", "run-03"]
        assert (df["prj"] == "prj-003").all()
        paths = dcms2csv(logs_dir, df)
        assert len(paths) == 1 and os.path.exists(paths[0])
        back = pd.read_csv(paths[0])
        assert len(back) == 3

    def test_get_metabids_reads_sidecars(self, tmp_path):
        dcm_dir, log_path, logs_dir = self._session(tmp_path)
        df = assign_bids(get_dcms(dcm_dir), log_path)
        # fabricate sidecars as dcm2niix would have left them
        import json
        for _, e in df.iterrows():
            anat = tmp_path / "projects" / e["prj"] / e["sub"] / e["ses"] / "anat"
            anat.mkdir(parents=True, exist_ok=True)
            with open(anat / f"{e['sub']}_{e['ses']}_{e['run']}_T2w.json", "w") as f:
                json.dump({"EchoTime": 0.114, "CoilString": "Body"}, f)
        out = get_metabids(df, ["EchoTime", "CoilString"], str(tmp_path / "projects"))
        assert (out["EchoTime"] == 0.114).all()
        assert (out["CoilString"] == "Body").all()
