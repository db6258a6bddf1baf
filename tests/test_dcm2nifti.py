"""In-repo DICOM -> NIfTI converter: geometry, ordering, rescale, fallback.

Test DICOM files are synthesized directly (explicit/implicit VR little
endian) so no scanner data or external tools are needed.
"""

import os
import struct

import numpy as np

from fetal_t2mapping_tpu.core import nifti
from fetal_t2mapping_tpu.utils.dcm2nifti import convert_series, group_series, series_to_volume
from fetal_t2mapping_tpu.utils.dicom import read_dcm

_TS_EXPLICIT = "1.2.840.10008.1.2.1"
_TS_IMPLICIT = "1.2.840.10008.1.2"


def _el_explicit(group, elem, vr, value: bytes) -> bytes:
    if len(value) % 2:
        value += b"\x00"
    if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
        return struct.pack("<HH2sHI", group, elem, vr, 0, len(value)) + value
    return struct.pack("<HH2sH", group, elem, vr, len(value)) + value


def _el_implicit(group, elem, value: bytes) -> bytes:
    if len(value) % 2:
        value += b"\x00"
    return struct.pack("<HHI", group, elem, len(value)) + value


def write_test_dicom(path, pixel: np.ndarray, *, ipp, iop=(1, 0, 0, 0, 1, 0),
                     spacing=(1.5, 2.0), te=114.0, instance=1, series_uid="1.2.3.4",
                     slope=None, intercept=None, explicit=True):
    """Minimal single-frame Part-10 file (uncompressed little endian)."""
    rows, cols = pixel.shape
    ts = _TS_EXPLICIT if explicit else _TS_IMPLICIT
    meta_body = _el_explicit(0x0002, 0x0010, b"UI", ts.encode())
    meta = _el_explicit(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))) + meta_body

    def s(v):
        return str(v).encode()

    def ds_list(vals):
        return "\\".join(f"{v:g}" for v in vals).encode()

    el = _el_explicit if explicit else (lambda g, e, vr, v: _el_implicit(g, e, v))
    body = b"".join([
        el(0x0008, 0x0060, b"CS", b"MR"),
        el(0x0008, 0x103E, b"LO", b"t2_haste_test"),
        el(0x0018, 0x0050, b"DS", s(3.0)),
        el(0x0018, 0x0081, b"DS", s(te)),
        el(0x0020, 0x000E, b"UI", series_uid.encode()),
        el(0x0020, 0x0013, b"IS", s(instance)),
        el(0x0020, 0x0032, b"DS", ds_list(ipp)),
        el(0x0020, 0x0037, b"DS", ds_list(iop)),
        el(0x0028, 0x0002, b"US", struct.pack("<H", 1)),
        el(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
        el(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
        el(0x0028, 0x0030, b"DS", ds_list(spacing)),
        el(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        el(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
    ])
    if slope is not None:
        body += el(0x0028, 0x1053, b"DS", s(slope))
    if intercept is not None:
        body += el(0x0028, 0x1052, b"DS", s(intercept))
    pix = np.ascontiguousarray(pixel, np.uint16).tobytes()
    body += el(0x7FE0, 0x0010, b"OW", pix)
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)


def write_test_dicom_multiframe(path, frames: np.ndarray, *, ipp,
                                iop=(1, 0, 0, 0, 1, 0), spacing=(1.0, 1.0),
                                dz=4.0, te=114.0, series_uid="1.2.3.7"):
    """Enhanced-style multi-frame Part-10 file: NumberOfFrames frames
    stacked along the IOP normal from ImagePositionPatient at
    SpacingBetweenSlices — the one-file-per-acquisition layout the
    reference ingests with ``dcm2niix -s y`` (reference
    utils/dcm_utils.py:259-312). Geometry is top-level (no per-frame
    functional groups), which series_to_volume supports as the fallback."""
    n, rows, cols = frames.shape
    meta_body = _el_explicit(0x0002, 0x0010, b"UI", _TS_EXPLICIT.encode())
    meta = _el_explicit(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))) + meta_body

    def s(v):
        return str(v).encode()

    def ds_list(vals):
        return "\\".join(f"{v:g}" for v in vals).encode()

    body = b"".join([
        _el_explicit(0x0008, 0x0060, b"CS", b"MR"),
        _el_explicit(0x0008, 0x103E, b"LO", b"t2_haste_mf"),
        _el_explicit(0x0018, 0x0050, b"DS", s(dz)),
        _el_explicit(0x0018, 0x0081, b"DS", s(te)),
        _el_explicit(0x0018, 0x0088, b"DS", s(dz)),
        _el_explicit(0x0020, 0x000E, b"UI", series_uid.encode()),
        _el_explicit(0x0020, 0x0013, b"IS", s(1)),
        _el_explicit(0x0020, 0x0032, b"DS", ds_list(ipp)),
        _el_explicit(0x0020, 0x0037, b"DS", ds_list(iop)),
        _el_explicit(0x0028, 0x0002, b"US", struct.pack("<H", 1)),
        _el_explicit(0x0028, 0x0008, b"IS", s(n)),
        _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
        _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
        _el_explicit(0x0028, 0x0030, b"DS", ds_list(spacing)),
        _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
        _el_explicit(0x7FE0, 0x0010, b"OW",
                     np.ascontiguousarray(frames, np.uint16).tobytes()),
    ])
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)


def test_multiframe_enhanced_geometry(tmp_path):
    """The enhanced single-file branch of series_to_volume: frames stack
    along the IOP normal at SpacingBetweenSlices from the top-level IPP."""
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 4000, size=(5, 6, 8)).astype(np.uint16)
    p = str(tmp_path / "mf.dcm")
    # coronal: rows = -z, cols = +x -> normal = +y
    write_test_dicom_multiframe(p, frames, ipp=(1.0, 2.0, 30.0),
                                iop=(1, 0, 0, 0, 0, -1), spacing=(1.5, 2.0),
                                dz=4.0)
    vol, ref = series_to_volume([p])
    np.testing.assert_array_equal(np.asarray(vol.data), frames.astype(np.float32))
    assert vol.spacing == (2.0, 1.5, 4.0)
    assert vol.origin == (1.0, 2.0, 30.0)
    D = np.asarray(vol.direction).reshape(3, 3)
    np.testing.assert_allclose(D[:, 0], [1, 0, 0])    # x = row dir
    np.testing.assert_allclose(D[:, 1], [0, 0, -1])   # y = col dir
    np.testing.assert_allclose(D[:, 2], [0, 1, 0])    # z = normal
    assert int(ref.get("NumberOfFrames")) == 5


def _make_series(tmp_path, n_slices=5, explicit=True, shuffle=True):
    rng = np.random.default_rng(0)
    truth = rng.integers(0, 4000, size=(n_slices, 6, 8)).astype(np.uint16)
    order = list(range(n_slices))
    if shuffle:
        order = order[::-1]  # write in reverse to exercise sorting
    paths = []
    for i in order:
        p = str(tmp_path / f"sl{i}.dcm")
        write_test_dicom(p, truth[i], ipp=(10.0, 20.0, 30.0 + 3.0 * i),
                         instance=i + 1, explicit=explicit)
        paths.append(p)
    return paths, truth


def test_series_geometry_and_order(tmp_path):
    paths, truth = _make_series(tmp_path)
    vol, ref = series_to_volume(paths)
    np.testing.assert_array_equal(np.asarray(vol.data), truth.astype(np.float32))
    assert vol.spacing == (2.0, 1.5, 3.0)       # (dx=cols, dy=rows, dz)
    assert vol.origin == (10.0, 20.0, 30.0)     # lowest slice after sorting
    np.testing.assert_allclose(vol.direction, np.eye(3).reshape(-1))


def test_implicit_vr_series(tmp_path):
    paths, truth = _make_series(tmp_path, explicit=False)
    vol, _ = series_to_volume(paths)
    np.testing.assert_array_equal(np.asarray(vol.data), truth.astype(np.float32))


def test_rescale_slope_intercept(tmp_path):
    pix = np.arange(48, dtype=np.uint16).reshape(6, 8)
    p = str(tmp_path / "r.dcm")
    write_test_dicom(p, pix, ipp=(0, 0, 0), slope=2.0, intercept=-10.0)
    vol, _ = series_to_volume([p])
    np.testing.assert_allclose(np.asarray(vol.data)[0], pix * 2.0 - 10.0)


def test_convert_series_writes_nifti_and_sidecar(tmp_path):
    paths, truth = _make_series(tmp_path)
    base = str(tmp_path / "out" / "sub-001_ses-01_run-1_T2w")
    os.makedirs(os.path.dirname(base))
    nii, js = convert_series(paths, base)
    back = nifti.read(nii)
    # lossless integer data stores as int16 like dcm2niix (half the bytes
    # of float32 on disk and over the device link)
    assert np.asarray(back.data).dtype == np.int16
    np.testing.assert_array_equal(np.asarray(back.data), truth.astype(np.float32))
    np.testing.assert_allclose(back.spacing, (2.0, 1.5, 3.0), atol=1e-5)
    import json
    side = json.load(open(js))
    assert side["EchoTime"] == 0.114            # seconds, BIDS convention
    assert side["Rows"] == 6 and side["Columns"] == 8
    assert side["ImageOrientationPatientDICOM"] == [1, 0, 0, 0, 1, 0]


def test_convert_series_dtype_selection(tmp_path):
    # non-integral rescaled values must stay float32; large unsigned values
    # that don't fit int16 fall back to uint16
    pix = np.arange(48, dtype=np.uint16).reshape(6, 8)
    p = str(tmp_path / "r.dcm")
    write_test_dicom(p, pix, ipp=(0, 0, 0), slope=0.5, intercept=0.25)
    nii, _ = convert_series([p], str(tmp_path / "float_case"))
    back = nifti.read(nii)
    assert np.asarray(back.data).dtype == np.float32
    np.testing.assert_allclose(np.asarray(back.data)[0], pix * 0.5 + 0.25)

    big = (pix.astype(np.uint16) + 40000)
    p2 = str(tmp_path / "b.dcm")
    write_test_dicom(p2, big, ipp=(0, 0, 0))
    nii2, _ = convert_series([p2], str(tmp_path / "uint_case"))
    back2 = nifti.read(nii2)
    assert np.asarray(back2.data).dtype == np.uint16
    np.testing.assert_array_equal(np.asarray(back2.data)[0], big)


def test_group_series(tmp_path):
    paths_a, _ = _make_series(tmp_path, n_slices=2)
    p_b = str(tmp_path / "other.dcm")
    write_test_dicom(p_b, np.zeros((6, 8), np.uint16), ipp=(0, 0, 0),
                     series_uid="9.9.9")
    groups = group_series(paths_a + [p_b])
    assert len(groups) == 2
    assert sorted(len(v) for v in groups.values()) == [1, 2]


def test_sagittal_orientation(tmp_path):
    # sagittal: rows along +y, columns along -z (a common sag IOP)
    pix = np.arange(48, dtype=np.uint16).reshape(6, 8)
    p = str(tmp_path / "sag.dcm")
    write_test_dicom(p, pix, ipp=(5, 6, 7), iop=(0, 1, 0, 0, 0, -1))
    vol, _ = series_to_volume([p])
    d = np.asarray(vol.direction).reshape(3, 3)
    np.testing.assert_allclose(d[:, 0], [0, 1, 0])    # +x index -> +y world
    np.testing.assert_allclose(d[:, 1], [0, 0, -1])   # +y index -> -z world
    np.testing.assert_allclose(d[:, 2], [-1, 0, 0])   # normal


# ----------------------------------------------------------- RLE Lossless
def _packbits_encode(data: bytes) -> bytes:
    """Naive PackBits encoder (runs >= 3 as replicates, else literals)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        while i < n and i - lit_start < 128:
            nxt = 1
            while i + nxt < n and nxt < 3 and data[i + nxt] == data[i]:
                nxt += 1
            if nxt >= 3:
                break
            i += 1
        out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


def write_test_dicom_rle(path, pixel: np.ndarray, *, ipp, te=114.0,
                         instance=1, series_uid="1.2.3.9"):
    """Single-frame RLE Lossless (1.2.840.10008.1.2.5) Part-10 file."""
    rows, cols = pixel.shape
    ts = "1.2.840.10008.1.2.5"
    meta_body = _el_explicit(0x0002, 0x0010, b"UI", ts.encode())
    meta = _el_explicit(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))) + meta_body

    def s(v):
        return str(v).encode()

    def ds_list(vals):
        return "\\".join(f"{v:g}" for v in vals).encode()

    body = b"".join([
        _el_explicit(0x0008, 0x0060, b"CS", b"MR"),
        _el_explicit(0x0008, 0x103E, b"LO", b"t2_haste_rle"),
        _el_explicit(0x0018, 0x0050, b"DS", s(3.0)),
        _el_explicit(0x0018, 0x0081, b"DS", s(te)),
        _el_explicit(0x0020, 0x000E, b"UI", series_uid.encode()),
        _el_explicit(0x0020, 0x0013, b"IS", s(instance)),
        _el_explicit(0x0020, 0x0032, b"DS", ds_list(ipp)),
        _el_explicit(0x0020, 0x0037, b"DS", ds_list((1, 0, 0, 0, 1, 0))),
        _el_explicit(0x0028, 0x0002, b"US", struct.pack("<H", 1)),
        _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
        _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
        _el_explicit(0x0028, 0x0030, b"DS", ds_list((1.5, 2.0))),
        _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
    ])
    # RLE frame: 64-byte header (2 segments: MSB plane, LSB plane)
    pix = np.ascontiguousarray(pixel, np.uint16)
    msb = (pix >> 8).astype(np.uint8).tobytes()
    lsb = (pix & 0xFF).astype(np.uint8).tobytes()
    seg0 = _packbits_encode(msb)
    seg1 = _packbits_encode(lsb)
    header = struct.pack("<16I", 2, 64, 64 + len(seg0), *([0] * 13))
    frame = header + seg0 + seg1
    if len(frame) % 2:
        frame += b"\x00"
    # encapsulated PixelData: OB, undefined length, empty BOT + 1 fragment
    pd = struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF)
    pd += struct.pack("<HHI", 0xFFFE, 0xE000, 0)              # empty BOT
    pd += struct.pack("<HHI", 0xFFFE, 0xE000, len(frame)) + frame
    pd += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)              # seq delimiter
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body + pd)


def test_rle_pixels_roundtrip(tmp_path):
    rng = np.random.default_rng(9)
    truth = rng.integers(0, 4000, size=(6, 8)).astype(np.uint16)
    truth[2:4, 2:6] = 777  # a run, so PackBits replicates are exercised
    p = str(tmp_path / "rle.dcm")
    write_test_dicom_rle(p, truth, ipp=(0.0, 0.0, 0.0))
    ds = read_dcm(p, with_pixels=True)
    arr = np.frombuffer(ds.get("PixelData"), "<u2").reshape(6, 8)
    np.testing.assert_array_equal(arr, truth)


def test_rle_series_to_volume(tmp_path):
    rng = np.random.default_rng(10)
    truth = rng.integers(0, 4000, size=(3, 6, 8)).astype(np.uint16)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"rle{i}.dcm")
        write_test_dicom_rle(p, truth[i], ipp=(0.0, 0.0, 3.0 * i), instance=i + 1)
        paths.append(p)
    vol, _ = series_to_volume(paths)
    np.testing.assert_array_equal(np.asarray(vol.data), truth.astype(np.float32))
    assert vol.spacing == (2.0, 1.5, 3.0)


# ------------------------------------------------------------ JPEG Lossless
def write_test_dicom_jpegll(path, pixel: np.ndarray, *, ipp, te=114.0,
                            instance=1, series_uid="1.2.3.11",
                            predictor=1, n_fragments=1):
    """Single-frame JPEG Lossless Part-10 file (SV1 -> .4.70, else .4.57)."""
    from fetal_t2mapping_tpu.utils import jpegll

    rows, cols = pixel.shape
    ts = ("1.2.840.10008.1.2.4.70" if predictor == 1
          else "1.2.840.10008.1.2.4.57")
    meta_body = _el_explicit(0x0002, 0x0010, b"UI", ts.encode())
    meta = _el_explicit(0x0002, 0x0000, b"UL",
                        struct.pack("<I", len(meta_body))) + meta_body

    def s(v):
        return str(v).encode()

    def ds_list(vals):
        return "\\".join(f"{v:g}" for v in vals).encode()

    body = b"".join([
        _el_explicit(0x0008, 0x0060, b"CS", b"MR"),
        _el_explicit(0x0008, 0x103E, b"LO", b"t2_haste_jll"),
        _el_explicit(0x0018, 0x0050, b"DS", s(3.0)),
        _el_explicit(0x0018, 0x0081, b"DS", s(te)),
        _el_explicit(0x0020, 0x000E, b"UI", series_uid.encode()),
        _el_explicit(0x0020, 0x0013, b"IS", s(instance)),
        _el_explicit(0x0020, 0x0032, b"DS", ds_list(ipp)),
        _el_explicit(0x0020, 0x0037, b"DS", ds_list((1, 0, 0, 0, 1, 0))),
        _el_explicit(0x0028, 0x0002, b"US", struct.pack("<H", 1)),
        _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
        _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
        _el_explicit(0x0028, 0x0030, b"DS", ds_list((1.5, 2.0))),
        _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
    ])
    stream = jpegll.encode(np.ascontiguousarray(pixel, np.uint16),
                           predictor=predictor, precision=16)
    if len(stream) % 2:
        stream += b"\x00"
    # a frame may span several fragments (PS3.5 A.4)
    cut = max(2, (len(stream) // n_fragments) // 2 * 2)
    frags = [stream[i:i + cut] for i in range(0, len(stream), cut)] \
        if n_fragments > 1 else [stream]
    pd = struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF)
    pd += struct.pack("<HHI", 0xFFFE, 0xE000, 0)              # empty BOT
    for fr in frags:
        pd += struct.pack("<HHI", 0xFFFE, 0xE000, len(fr)) + fr
    pd += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)              # seq delimiter
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body + pd)


def test_jpegll_pixels_roundtrip(tmp_path):
    rng = np.random.default_rng(12)
    truth = rng.integers(0, 4000, size=(6, 8)).astype(np.uint16)
    p = str(tmp_path / "jll.dcm")
    write_test_dicom_jpegll(p, truth, ipp=(0.0, 0.0, 0.0))
    ds = read_dcm(p, with_pixels=True)
    arr = np.frombuffer(ds.get("PixelData"), "<u2").reshape(6, 8)
    np.testing.assert_array_equal(arr, truth)


def test_jpegll_multifragment_and_process14(tmp_path):
    rng = np.random.default_rng(13)
    truth = rng.integers(0, 65535, size=(16, 12)).astype(np.uint16)
    p = str(tmp_path / "jll57.dcm")
    write_test_dicom_jpegll(p, truth, ipp=(0.0, 0.0, 0.0), predictor=4,
                            n_fragments=3)
    ds = read_dcm(p, with_pixels=True)
    arr = np.frombuffer(ds.get("PixelData"), "<u2").reshape(16, 12)
    np.testing.assert_array_equal(arr, truth)


def test_jpegll_series_to_volume(tmp_path):
    rng = np.random.default_rng(14)
    truth = rng.integers(0, 4000, size=(3, 6, 8)).astype(np.uint16)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"jll{i}.dcm")
        write_test_dicom_jpegll(p, truth[i], ipp=(0.0, 0.0, 3.0 * i),
                                instance=i + 1)
        paths.append(p)
    vol, _ = series_to_volume(paths)
    np.testing.assert_array_equal(np.asarray(vol.data), truth.astype(np.float32))
    assert vol.spacing == (2.0, 1.5, 3.0)


def test_jpegll_python_fallback_path(tmp_path, monkeypatch):
    # force the pure-Python decode path (native unavailable)
    from fetal_t2mapping_tpu import native as native_mod

    monkeypatch.setattr(native_mod, "jpegll_decode", lambda data: None)
    rng = np.random.default_rng(15)
    truth = rng.integers(0, 4000, size=(6, 8)).astype(np.uint16)
    p = str(tmp_path / "jllpy.dcm")
    write_test_dicom_jpegll(p, truth, ipp=(0.0, 0.0, 0.0))
    ds = read_dcm(p, with_pixels=True)
    arr = np.frombuffer(ds.get("PixelData"), "<u2").reshape(6, 8)
    np.testing.assert_array_equal(arr, truth)


# ------------------------------------------------------------- JPEG 2000
def _j2k_available() -> bool:
    try:
        from PIL import features

        return bool(features.check("jpg_2000"))
    except Exception:
        return False


def _j2k_encode(pixel: np.ndarray, *, jp2: bool = False) -> bytes:
    """Reversible (5/3) JPEG 2000 codestream via PIL/OpenJPEG."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(pixel).save(buf, format="JPEG2000", irreversible=False,
                                no_jp2=not jp2)
    return buf.getvalue()


def write_test_dicom_j2k(path, pixel: np.ndarray, *, ipp, te=114.0,
                         instance=1, series_uid="1.2.3.12",
                         n_fragments=1, jp2=False):
    """Single-frame JPEG 2000 Lossless (1.2.840.10008.1.2.4.90) file."""
    rows, cols = pixel.shape
    ts = "1.2.840.10008.1.2.4.90"
    meta_body = _el_explicit(0x0002, 0x0010, b"UI", ts.encode())
    meta = _el_explicit(0x0002, 0x0000, b"UL",
                        struct.pack("<I", len(meta_body))) + meta_body

    def s(v):
        return str(v).encode()

    def ds_list(vals):
        return "\\".join(f"{v:g}" for v in vals).encode()

    body = b"".join([
        _el_explicit(0x0008, 0x0060, b"CS", b"MR"),
        _el_explicit(0x0008, 0x103E, b"LO", b"t2_haste_j2k"),
        _el_explicit(0x0018, 0x0050, b"DS", s(3.0)),
        _el_explicit(0x0018, 0x0081, b"DS", s(te)),
        _el_explicit(0x0020, 0x000E, b"UI", series_uid.encode()),
        _el_explicit(0x0020, 0x0013, b"IS", s(instance)),
        _el_explicit(0x0020, 0x0032, b"DS", ds_list(ipp)),
        _el_explicit(0x0020, 0x0037, b"DS", ds_list((1, 0, 0, 0, 1, 0))),
        _el_explicit(0x0028, 0x0002, b"US", struct.pack("<H", 1)),
        _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
        _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
        _el_explicit(0x0028, 0x0030, b"DS", ds_list((1.5, 2.0))),
        _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
    ])
    stream = _j2k_encode(np.ascontiguousarray(pixel, np.uint16), jp2=jp2)
    if len(stream) % 2:
        stream += b"\x00"
    cut = max(2, (len(stream) // n_fragments) // 2 * 2)
    frags = [stream[i:i + cut] for i in range(0, len(stream), cut)] \
        if n_fragments > 1 else [stream]
    pd = struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF)
    pd += struct.pack("<HHI", 0xFFFE, 0xE000, 0)              # empty BOT
    for fr in frags:
        pd += struct.pack("<HHI", 0xFFFE, 0xE000, len(fr)) + fr
    pd += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)              # seq delimiter
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body + pd)


def test_j2k_pixels_roundtrip(tmp_path):
    import pytest

    if not _j2k_available():
        pytest.skip("PIL lacks OpenJPEG")
    rng = np.random.default_rng(16)
    truth = rng.integers(0, 65535, size=(16, 12)).astype(np.uint16)
    p = str(tmp_path / "j2k.dcm")
    write_test_dicom_j2k(p, truth, ipp=(0.0, 0.0, 0.0))
    ds = read_dcm(p, with_pixels=True)
    arr = np.frombuffer(ds.get("PixelData"), "<u2").reshape(16, 12)
    np.testing.assert_array_equal(arr, truth)


def test_j2k_multifragment_and_jp2(tmp_path):
    import pytest

    if not _j2k_available():
        pytest.skip("PIL lacks OpenJPEG")
    rng = np.random.default_rng(17)
    truth = rng.integers(0, 4000, size=(16, 16)).astype(np.uint16)
    p = str(tmp_path / "j2kfrag.dcm")
    write_test_dicom_j2k(p, truth, ipp=(0.0, 0.0, 0.0), n_fragments=3)
    ds = read_dcm(p, with_pixels=True)
    arr = np.frombuffer(ds.get("PixelData"), "<u2").reshape(16, 16)
    np.testing.assert_array_equal(arr, truth)
    # JP2-wrapped codestream (PS3.5 discourages but tolerated on read)
    p2 = str(tmp_path / "j2kjp2.dcm")
    write_test_dicom_j2k(p2, truth, ipp=(0.0, 0.0, 0.0), jp2=True)
    ds2 = read_dcm(p2, with_pixels=True)
    arr2 = np.frombuffer(ds2.get("PixelData"), "<u2").reshape(16, 16)
    np.testing.assert_array_equal(arr2, truth)


def test_j2k_series_to_volume(tmp_path):
    import pytest

    if not _j2k_available():
        pytest.skip("PIL lacks OpenJPEG")
    rng = np.random.default_rng(18)
    truth = rng.integers(0, 4000, size=(3, 6, 8)).astype(np.uint16)
    for i in range(3):
        write_test_dicom_j2k(str(tmp_path / f"j2k{i}.dcm"), truth[i],
                             ipp=(0.0, 0.0, 3.0 * i), instance=i + 1)
    vol, _ = series_to_volume([str(tmp_path / f"j2k{i}.dcm")
                               for i in range(3)])
    np.testing.assert_array_equal(np.asarray(vol.data),
                                  truth.astype(np.float32))
    assert vol.spacing == (2.0, 1.5, 3.0)


def test_jpeg_lossy_baseline_decodes_via_pil(tmp_path):
    # 8-bit Baseline Process 1 (TS .4.50): decoded through PIL/libjpeg;
    # lossy, so gate on a small reconstruction error, not bit-equality
    import io

    from PIL import Image

    yy, xx = np.mgrid[0:32, 0:32]
    truth = (96 + 2 * yy + xx).astype(np.uint8)          # smooth ramp
    buf = io.BytesIO()
    Image.fromarray(truth).save(buf, format="JPEG", quality=95)
    stream = buf.getvalue()
    if len(stream) % 2:
        stream += b"\x00"
    p = str(tmp_path / "jlossy.dcm")
    ts = "1.2.840.10008.1.2.4.50"
    meta_body = _el_explicit(0x0002, 0x0010, b"UI", ts.encode())
    meta = _el_explicit(0x0002, 0x0000, b"UL",
                        struct.pack("<I", len(meta_body))) + meta_body
    body = b"".join([
        _el_explicit(0x0008, 0x0060, b"CS", b"MR"),
        _el_explicit(0x0028, 0x0002, b"US", struct.pack("<H", 1)),
        _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", 32)),
        _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", 32)),
        _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 8)),
        _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
    ])
    pd_el = struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF)
    pd_el += struct.pack("<HHI", 0xFFFE, 0xE000, 0)
    pd_el += struct.pack("<HHI", 0xFFFE, 0xE000, len(stream)) + stream
    pd_el += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    with open(p, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body + pd_el)
    ds = read_dcm(p, with_pixels=True)
    arr = np.frombuffer(ds.get("PixelData"), np.uint8).reshape(32, 32)
    assert np.max(np.abs(arr.astype(int) - truth.astype(int))) <= 4


def test_jpeg_encapsulated_raises_clear_error(tmp_path):
    # the JPEG family is NOT natively decoded: the error must name the TS
    # and the dcm2niix fallback
    import pytest

    from fetal_t2mapping_tpu.utils.dicom import InvalidDicomError

    rng = np.random.default_rng(11)
    truth = rng.integers(0, 100, size=(4, 4)).astype(np.uint16)
    p = str(tmp_path / "jpg.dcm")
    write_test_dicom_rle(p, truth, ipp=(0.0, 0.0, 0.0))
    # same byte length (UI padding included) so the meta group stays valid
    raw = open(p, "rb").read().replace(b"1.2.840.10008.1.2.5\x00",
                                       b"1.2.840.10008.1.2.4\x00")
    open(p, "wb").write(raw)
    with pytest.raises(InvalidDicomError, match="dcm2niix"):
        read_dcm(p, with_pixels=True)


def write_test_dicom_jpeg12(path, pixel: np.ndarray, *, ipp, te=114.0,
                            series_uid="1.2.3.21"):
    """Single-frame 12-bit Extended lossy JPEG (TS 1.2.840.10008.1.2.4.51)
    Part-10 file — the one transfer syntax that needed dcm2niix until
    round 3 (reference utils/dcm_utils.py:259-312)."""
    from fetal_t2mapping_tpu.utils import jpegdct

    rows, cols = pixel.shape
    ts = "1.2.840.10008.1.2.4.51"
    meta_body = _el_explicit(0x0002, 0x0010, b"UI", ts.encode())
    meta = _el_explicit(0x0002, 0x0000, b"UL",
                        struct.pack("<I", len(meta_body))) + meta_body

    def s(v):
        return str(v).encode()

    def ds_list(vals):
        return "\\".join(f"{v:g}" for v in vals).encode()

    body = b"".join([
        _el_explicit(0x0008, 0x0060, b"CS", b"MR"),
        _el_explicit(0x0008, 0x103E, b"LO", b"t2_haste_j12"),
        _el_explicit(0x0018, 0x0050, b"DS", s(3.0)),
        _el_explicit(0x0018, 0x0081, b"DS", s(te)),
        _el_explicit(0x0020, 0x000E, b"UI", series_uid.encode()),
        _el_explicit(0x0020, 0x0013, b"IS", s(1)),
        _el_explicit(0x0020, 0x0032, b"DS", ds_list(ipp)),
        _el_explicit(0x0020, 0x0037, b"DS", ds_list((1, 0, 0, 0, 1, 0))),
        _el_explicit(0x0028, 0x0002, b"US", struct.pack("<H", 1)),
        _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
        _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
        _el_explicit(0x0028, 0x0030, b"DS", ds_list((1.5, 2.0))),
        _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        _el_explicit(0x0028, 0x0101, b"US", struct.pack("<H", 12)),
        _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
    ])
    stream = jpegdct.encode(np.ascontiguousarray(pixel, np.uint16),
                            precision=12, quant=1)
    if len(stream) % 2:
        stream += b"\x00"
    pd = struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF)
    pd += struct.pack("<HHI", 0xFFFE, 0xE000, 0)              # empty BOT
    pd += struct.pack("<HHI", 0xFFFE, 0xE000, len(stream)) + stream
    pd += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)              # delimiter
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body + pd)


def test_jpeg12_extended_pixels_and_convert(tmp_path):
    """12-bit Extended (.4.51) decodes in-repo: read_dcm pixel accuracy +
    full conversion to NIfTI through convert_series."""
    yy, xx = np.mgrid[0:24, 0:16].astype(np.float64)
    truth = np.clip(np.round(2000 + 900 * np.sin(yy / 4) * np.cos(xx / 3)),
                    0, 4095).astype(np.uint16)
    p = str(tmp_path / "j12.dcm")
    write_test_dicom_jpeg12(p, truth, ipp=(1.0, 2.0, 3.0))
    ds = read_dcm(p, with_pixels=True)
    arr = np.frombuffer(ds.get("PixelData"), "<u2").reshape(24, 16)
    # lossy only through coefficient rounding at quant=1
    assert np.max(np.abs(arr.astype(int) - truth.astype(int))) <= 4

    out = str(tmp_path / "j12")
    convert_series([p], out)
    vol = nifti.read(out + ".nii.gz")
    assert vol.shape == (1, 24, 16)
    assert np.max(np.abs(np.asarray(vol.data)[0] - truth.astype(np.float32))) <= 4


class TestParserCorruptionFuzz:
    """The parser must never hang, crash, or allocate unboundedly on
    corrupt input: every corruption of a valid Part-10 file either parses
    (harmless corruption) or raises a controlled error (InvalidDicomError
    or a ValueError/struct.error subclass) promptly. Deterministic seeds —
    any failure is reproducible."""

    def _valid_bytes(self, tmp_path):
        import numpy as np
        frames = np.random.default_rng(0).integers(
            0, 4000, size=(2, 6, 8)).astype(np.uint16)
        p = str(tmp_path / "fuzz_base.dcm")
        write_test_dicom_multiframe(p, frames, ipp=(0.0, 0.0, 0.0),
                                    iop=(1, 0, 0, 0, 1, 0),
                                    spacing=(1.0, 1.0), dz=1.0)
        with open(p, "rb") as f:
            return bytearray(f.read())

    def test_corruptions_fail_cleanly(self, tmp_path):
        import struct
        import time

        import numpy as np

        from fetal_t2mapping_tpu.utils.dicom import read_dcm

        base = self._valid_bytes(tmp_path)
        rng = np.random.default_rng(42)
        n_parsed = n_raised = 0
        for i in range(80):
            buf = bytearray(base)
            kind = i % 4
            if kind == 0:      # truncation (always past the DICM magic)
                buf = buf[:rng.integers(136, len(buf))]
            elif kind == 1:    # single byte flip in the STRUCTURAL region
                               # (meta header + first elements — pixel
                               # payload flips are data, not structure)
                j = int(rng.integers(128, min(420, len(buf))))
                buf[j] ^= int(rng.integers(1, 256))
            elif kind == 2:    # blast a random 4-byte window (hits VRs,
                               # lengths, tags)
                j = int(rng.integers(132, min(420, len(buf) - 4)))
                buf[j:j + 4] = rng.integers(0, 256, 4).astype("uint8").tobytes()
            else:              # length-field explosion: huge little-endian
                               # 32-bit value somewhere in the element area
                j = int(rng.integers(150, min(420, len(buf) - 4)))
                buf[j:j + 4] = struct.pack("<I", 0xFFFFFFF0)
            p = str(tmp_path / f"fuzz_{i}.dcm")
            with open(p, "wb") as f:
                f.write(buf)
            t0 = time.monotonic()
            try:
                read_dcm(p, with_pixels=True)
                n_parsed += 1
            except (ValueError, struct.error, EOFError, KeyError,
                    IndexError, MemoryError) as e:
                # controlled failure: a typed exception, not a hang/abort.
                # MemoryError must NOT occur (allocation guards); assert it.
                assert not isinstance(e, MemoryError), \
                    f"corruption {i}: unbounded allocation ({e})"
                n_raised += 1
            assert time.monotonic() - t0 < 10.0, \
                f"corruption {i}: parser took >10 s"
        # the fuzz must actually exercise both outcomes
        assert n_raised >= 5, f"only {n_raised} corruptions raised"
        assert n_parsed >= 5, f"only {n_parsed} corruptions parsed"
        assert n_parsed + n_raised == 80
