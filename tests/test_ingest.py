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


class TestSeqJsonHelpers:
    """gen_config_json / gen_seq_json (reference utils/dcm_utils.py:316-419)."""

    def test_gen_config_json(self, tmp_path):
        import json

        from fetal_t2mapping_tpu.utils.ingest import gen_config_json

        df = pd.DataFrame({
            "sub": ["sub-001"] * 3 + ["sub-001"] * 2 + ["sub-002"],
            "ses": ["ses-01"] * 3 + ["ses-02"] * 2 + ["ses-01"],
            "run": ["run-01", "run-02", "run-03", "run-01", "run-02", "run-01"],
        })
        out = gen_config_json(df, str(tmp_path) + os.sep)
        assert out["sub-001"][0] == {
            "sr-id": 0, "session": "ses-01", "stacks": [1, 2, 3],
            "custom_interfaces": {"do_anat_orientation": True}}
        assert out["sub-001"][1]["stacks"] == [1, 2]
        assert out["sub-002"][0]["session"] == "ses-01"
        on_disk = json.load(open(str(tmp_path / "001_params.json")))
        assert on_disk == out
        # reference column names accepted too
        out2 = gen_config_json(df.rename(columns={"sub": "sub_id", "ses": "ses_id"}),
                               str(tmp_path) + os.sep)
        assert out2 == out

    def test_gen_seq_json(self, tmp_path):
        import json

        from fetal_t2mapping_tpu.utils.ingest import gen_seq_json

        # enhanced-MR style file: shared + per-frame functional groups
        timing = (_el(0x0018, 0x0080, b"DS", b"1200")
                  + _el(0x0018, 0x0091, b"IS", b"88")
                  + _el(0x0018, 0x1314, b"DS", b"120"))
        modifier = (_el(0x0018, 0x9078, b"CS", b"SENSE")
                    + _el(0x0018, 0x9081, b"CS", b"YES"))
        shared = _el(0x5200, 0x9229, b"SQ", _sq_item(
            _el(0x0018, 0x9112, b"SQ", _sq_item(timing))
            + _el(0x0018, 0x9115, b"SQ", _sq_item(modifier))))
        echo = _el(0x0018, 0x9114, b"SQ", _sq_item(
            _el(0x0018, 0x9082, b"FD", struct.pack("<d", 0.114))))
        pm = _el(0x0028, 0x9110, b"SQ", _sq_item(
            _el(0x0028, 0x0030, b"DS", b"0.7\\0.8")
            + _el(0x0018, 0x0050, b"DS", b"3.0")))
        perframe = _el(0x5200, 0x9230, b"SQ", _sq_item(echo + pm))
        body = (
            _el(0x0008, 0x0020, b"DA", b"20260816")
            + _el(0x0008, 0x0060, b"CS", b"MR")
            + _el(0x0008, 0x0070, b"LO", b"SIEMENS")
            + _el(0x0008, 0x1010, b"SH", b"FREEMAX")
            + _el(0x0008, 0x1030, b"LO", b"qMRI study")
            + _el(0x0018, 0x0023, b"CS", b"2D")
            + _el(0x0018, 0x0087, b"DS", b"0.55")
            + _el(0x0018, 0x1030, b"LO", b"t2_haste_tra")
            + _el(0x0028, 0x0010, b"US", struct.pack("<H", 320))
            + _el(0x0028, 0x0011, b"US", struct.pack("<H", 260))
            + shared + perframe
        )
        ts = b"1.2.840.10008.1.2.1\x00"
        meta_el = _el(0x0002, 0x0010, b"UI", ts)
        glen = _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_el)))
        p = str(tmp_path / "enh.dcm")
        with open(p, "wb") as f:
            f.write(b"\x00" * 128 + b"DICM" + glen + meta_el + body)

        jp = str(tmp_path / "seq.json")
        seq = gen_seq_json(read_dcm(p), jp)
        assert seq["Manufacturer"] == "SIEMENS"
        assert seq["StationName"] == "FREEMAX"
        assert seq["MRAcquisitionType"] == "2D"
        assert seq["ParallelAcquisitionTechnique"] == "SENSE"
        assert seq["PartialFourier"] == "YES"
        assert float(seq["Repetition Time"]) == 1200.0
        assert int(seq["EchoTrainLength"]) == 88
        assert seq["EffectiveEchoTime"] == pytest.approx(0.114)
        assert seq["Rows"] == "320" and seq["Columns"] == "260"
        assert float(seq["SliceThickness"]) == 3.0
        assert seq["PixelSpacingX"] == 0.7 and seq["PixelSpacingY"] == 0.8
        assert seq["SoftwareVersions"] is None   # absent -> null, no raise
        assert json.load(open(jp))[0]["Manufacturer"] == "SIEMENS"
