"""Native IO runtime (ft2io.so): build, parity with pure-Python paths."""

import gzip
import os

import numpy as np
import pytest

from fetal_t2mapping_tpu import native
from fetal_t2mapping_tpu.core import nifti
from fetal_t2mapping_tpu.core.volume import Volume

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_version():
    assert native.version().startswith("ft2io")


def test_read_file_gz_and_raw(tmp_path):
    payload = os.urandom(100_000) + b"tail"
    raw_p = tmp_path / "a.bin"
    raw_p.write_bytes(payload)
    gz_p = tmp_path / "a.bin.gz"
    with gzip.open(gz_p, "wb") as f:
        f.write(payload)
    assert native.read_file(str(raw_p)) == payload
    assert native.read_file(str(gz_p)) == payload


def test_read_batch_parallel(tmp_path):
    payloads = [os.urandom(10_000 + i) for i in range(17)]
    paths = []
    for i, p in enumerate(payloads):
        fp = tmp_path / f"f{i}.gz"
        with gzip.open(fp, "wb") as f:
            f.write(p)
        paths.append(str(fp))
    out = native.read_batch(paths, n_threads=8)
    assert out == payloads


def test_read_missing_file_raises(tmp_path):
    with pytest.raises(OSError):
        native.read_file(str(tmp_path / "nope.gz"))


def test_write_file_roundtrip(tmp_path):
    data = os.urandom(50_000)
    gz_p = str(tmp_path / "w.gz")
    assert native.write_file(gz_p, data, gzip_level=6)
    with gzip.open(gz_p, "rb") as f:
        assert f.read() == data
    raw_p = str(tmp_path / "w.bin")
    assert native.write_file(raw_p, data)
    assert open(raw_p, "rb").read() == data


def test_dicom_probe(tmp_path):
    dcm = tmp_path / "x.dcm"
    dcm.write_bytes(b"\x00" * 128 + b"DICM" + b"\x00" * 16)
    not_dcm = tmp_path / "y.txt"
    not_dcm.write_bytes(b"hello world, definitely not dicom" * 10)
    flags = native.dicom_probe([str(dcm), str(not_dcm), str(tmp_path / "gone")])
    assert flags == [1, 0, -1]


def test_nifti_roundtrip_through_native(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(500, 100, (9, 8, 7)).astype(np.float32)
    vol = Volume(data=data, spacing=(1.5, 2.0, 2.5), origin=(3, 4, 5))
    path = str(tmp_path / "v.nii.gz")
    nifti.write(path, vol)           # native gzip write
    back = nifti.read(path)          # native inflate
    np.testing.assert_allclose(np.asarray(back.data), data, rtol=1e-6)
    np.testing.assert_allclose(back.spacing, vol.spacing, atol=1e-5)
    np.testing.assert_allclose(back.origin, vol.origin, atol=1e-4)
    # the same bytes must parse identically through the pure-Python path
    os.environ["FT2_DISABLE_NATIVE"] = "1"
    try:
        import importlib
        importlib.reload(native)
        assert not native.available()
        back2 = nifti.read(path)
        np.testing.assert_array_equal(np.asarray(back2.data), np.asarray(back.data))
    finally:
        del os.environ["FT2_DISABLE_NATIVE"]
        importlib.reload(native)


def test_nifti_read_batch(tmp_path):
    vols = []
    paths = []
    for i in range(5):
        d = np.full((4, 4, 4), float(i), np.float32)
        v = Volume(data=d, spacing=(1, 1, 1), origin=(0, 0, 0))
        p = str(tmp_path / f"b{i}.nii.gz")
        nifti.write(p, v)
        vols.append(v)
        paths.append(p)
    out = nifti.read_batch(paths)
    for v, o in zip(vols, out):
        np.testing.assert_array_equal(np.asarray(o.data), np.asarray(v.data))
