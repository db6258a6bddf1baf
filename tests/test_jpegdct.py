"""Sequential-DCT JPEG codec (utils/jpegdct.py): 12-bit Extended decode.

The reference covers the 12-bit Extended (.4.51) transfer syntax only
through the dcm2niix binary; jpegdct decodes it in-repo. Validation is
(a) encode->decode roundtrips at quant=1 (near-lossless: quantization
error is the DCT coefficient rounding, an orthonormal-basis perturbation),
(b) an independent-decoder cross-check against PIL/libjpeg on an 8-bit
stream libjpeg CAN read, and (c) structural error paths.
"""

import io

import numpy as np
import pytest

from fetal_t2mapping_tpu.utils import jpegdct
from fetal_t2mapping_tpu.utils.jpegdct import JpegError


def _smooth12(shape, seed=0, top=4095):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float64)
    img = (top / 2) * (1 + np.sin(yy / 7.0) * np.cos(xx / 5.0))
    img += rng.normal(0, top / 60.0, shape)
    return np.clip(np.round(img), 0, top).astype(np.uint16)


@pytest.mark.parametrize("shape", [(8, 8), (32, 24), (19, 13)])
def test_roundtrip_12bit_quant1(shape):
    truth = _smooth12(shape, seed=shape[0])
    stream = jpegdct.encode(truth, precision=12, quant=1)
    got = jpegdct.decode(stream)
    assert got.dtype == np.uint16 and got.shape == shape
    # quant=1: the only loss is coefficient rounding (|err|<=0.5 per coef,
    # orthonormal IDCT) — a few LSB of a 4095-range image
    assert np.max(np.abs(got.astype(int) - truth.astype(int))) <= 4


def test_roundtrip_with_quant_table_and_restarts():
    truth = _smooth12((40, 40), seed=3)
    q = np.concatenate([[8], np.full(63, 16)]).astype(np.int64)
    stream = jpegdct.encode(truth, precision=12, quant=q, restart_interval=3)
    got = jpegdct.decode(stream)
    # coarse quantization: lossy but structurally faithful
    err = np.abs(got.astype(int) - truth.astype(int))
    assert np.mean(err) < 20 and np.max(err) < 200


def test_roundtrip_16bit_quant_table():
    # Pq=1 (16-bit DQT entries) path
    truth = _smooth12((16, 16), seed=5)
    q = np.full(64, 300, np.int64)
    got = jpegdct.decode(jpegdct.encode(truth, precision=12, quant=q))
    assert got.shape == (16, 16)


def test_cross_check_against_libjpeg_8bit():
    """Decode a PIL/libjpeg-ENCODED baseline stream with jpegdct and
    compare to PIL's own decode — two independent implementations of the
    same bitstream must agree to IDCT rounding."""
    from PIL import Image

    truth = (_smooth12((48, 40), seed=7, top=255)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(truth).save(buf, format="JPEG", quality=92)
    stream = buf.getvalue()
    ours = jpegdct.decode(stream)
    with Image.open(io.BytesIO(stream)) as im:
        theirs = np.asarray(im)
    assert ours.dtype == np.uint8
    assert np.max(np.abs(ours.astype(int) - theirs.astype(int))) <= 2


def test_rejects_progressive_and_bad_headers():
    truth = _smooth12((8, 8))
    stream = bytearray(jpegdct.encode(truth, precision=12))
    i = stream.find(b"\xff\xc1")
    stream[i + 1] = 0xC2                     # SOF1 -> SOF2 (progressive)
    with pytest.raises(JpegError, match="SOF0/SOF1"):
        jpegdct.decode(bytes(stream))
    with pytest.raises(JpegError, match="SOI"):
        jpegdct.decode(b"\x00\x00\x00\x00")


def test_implausible_header_dims_capped():
    stream = bytearray(jpegdct.encode(_smooth12((8, 8)), precision=12))
    i = stream.find(b"\xff\xc1")
    # rows=cols=65535: must refuse before allocating
    stream[i + 5:i + 9] = b"\xff\xff\xff\xff"
    with pytest.raises(JpegError, match="implausible"):
        jpegdct.decode(bytes(stream))
