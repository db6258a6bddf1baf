"""JPEG Lossless (T.81 process 14) codec: Python reference + native parity.

The reference pipeline delegates lossless-JPEG DICOMs to the dcm2niix
binary (reference utils/dcm_utils.py:259-312); here both the pure-Python
codec (utils/jpegll.py) and the C++ fast path (native ft2_jpegll_decode)
are exercised against each other and against ground truth.
"""

import numpy as np
import pytest

from fetal_t2mapping_tpu import native
from fetal_t2mapping_tpu.utils import jpegll

CASES = [
    # (shape, bits, predictor, point_transform, restart_interval)
    ((6, 8), 16, 1, 0, 0),        # SV1: the DICOM .4.70 configuration
    ((13, 7), 12, 1, 0, 0),       # 12-bit (common scanner depth)
    ((16, 16), 16, 4, 0, 0),      # Ra+Rb-Rc
    ((9, 5), 8, 7, 0, 0),         # 8-bit, averaged predictor
    ((12, 10), 16, 1, 0, 17),     # restart markers, interval !| cols
    ((8, 8), 10, 2, 2, 0),        # point transform
    ((1, 1), 16, 1, 0, 0),        # single sample (default prediction only)
    ((1, 9), 16, 3, 0, 0),        # single line (Ra rule throughout)
    ((64, 64), 16, 6, 0, 100),
]


def _rand(shape, bits, seed):
    return np.random.default_rng(seed).integers(
        0, 1 << bits, size=shape).astype(np.uint16)


@pytest.mark.parametrize("shape,bits,pred,pt,ri", CASES)
def test_python_roundtrip(shape, bits, pred, pt, ri):
    img = _rand(shape, bits, 0)
    enc = jpegll.encode(img, predictor=pred, point_transform=pt,
                        precision=bits, restart_interval=ri)
    dec = np.asarray(jpegll.decode(enc), np.uint16)
    np.testing.assert_array_equal(dec, (img >> pt) << pt)


@pytest.mark.parametrize("shape,bits,pred,pt,ri", CASES)
def test_native_matches_python(shape, bits, pred, pt, ri):
    if not native.available():
        pytest.skip("native library unavailable")
    img = _rand(shape, bits, 1)
    enc = jpegll.encode(img, predictor=pred, point_transform=pt,
                        precision=bits, restart_interval=ri)
    a = native.jpegll_decode(enc)
    b = jpegll.decode(enc)
    assert a.dtype == b.dtype and a.shape == b.shape
    np.testing.assert_array_equal(a, b)


def test_eight_bit_output_dtype():
    img = _rand((5, 4), 8, 2)
    enc = jpegll.encode(img, precision=8)
    assert jpegll.decode(enc).dtype == np.uint8
    if native.available():
        assert native.jpegll_decode(enc).dtype == np.uint8


def test_smooth_image_compresses():
    y, x = np.mgrid[0:64, 0:48]
    img = (2000 * np.exp(-((y - 30) ** 2 + (x - 25) ** 2) / 400.0)).astype(
        np.uint16)
    enc = jpegll.encode(img)
    assert len(enc) < img.nbytes          # lossless but actually compressing
    np.testing.assert_array_equal(jpegll.decode(enc), img)


def test_rejects_non_lossless_sof():
    img = _rand((4, 4), 8, 3)
    enc = bytearray(jpegll.encode(img, precision=8))
    idx = enc.find(b"\xff\xc3")
    enc[idx + 1] = 0xC0                    # SOF3 -> SOF0 (baseline DCT)
    with pytest.raises(jpegll.JpegError):
        jpegll.decode(bytes(enc))
    if native.available():
        # native reports "unsupported" as None so the caller's fallback
        # produces the one uniform error message
        assert native.jpegll_decode(bytes(enc)) is None


def test_truncated_stream_raises():
    img = _rand((8, 8), 16, 4)
    enc = jpegll.encode(img)
    with pytest.raises(jpegll.JpegError):
        jpegll.decode(enc[: len(enc) // 2])
    if native.available():
        with pytest.raises(ValueError):
            native.jpegll_decode(enc[:8])


def test_encoder_validates_args():
    img = _rand((4, 4), 16, 5)
    with pytest.raises(jpegll.JpegError):
        jpegll.encode(img, predictor=0)
    with pytest.raises(jpegll.JpegError):
        jpegll.encode(img[None])           # 3-D
    with pytest.raises(jpegll.JpegError):
        jpegll.encode(img, precision=17)
