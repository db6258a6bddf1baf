"""Regressions for defects found in the round-1 code review."""

import os

import numpy as np
from scipy import ndimage

from fetal_t2mapping_tpu.ops.morphology import binary_erode, build_slice_mask, fill_holes
from fetal_t2mapping_tpu.utils.bids import get_img_path


def test_box_erosion_matches_scipy_at_borders():
    # out-of-volume must be background: a solid cube erodes to its interior
    m = np.ones((4, 4, 4), bool)
    ours = np.asarray(binary_erode(m, 1, box=True))
    ref = ndimage.binary_erosion(m, structure=np.ones((3, 3, 3)))
    np.testing.assert_array_equal(ours, ref)
    assert ours.sum() == 8  # only the 2x2x2 interior survives


def test_fill_holes_on_single_slice_slab():
    # a (z, y, 1) slab is a 2-D slice: its size-1 axis must not seed the
    # outside flood or every cavity counts as outside and nothing fills
    m = np.zeros((16, 16, 1), bool)
    m[2:14, 2:14, 0] = True
    m[5:9, 5:9, 0] = False           # cavity
    filled = np.asarray(fill_holes(m))
    assert filled[6, 6, 0]
    ref = ndimage.binary_fill_holes(m[:, :, 0])
    np.testing.assert_array_equal(filled[:, :, 0], ref)


def test_build_slice_mask_fills_2d_holes():
    # build_slice_mask iterates (z, y) planes along the LAST (x) axis
    img = np.zeros((20, 20, 2), np.float32)
    img[3:17, 3:17, :] = 100.0
    img[8:12, 8:12, :] = 0.0         # interior cavity in each slice
    mask = np.asarray(build_slice_mask(img, threshold=1.0))
    assert mask[10, 10, 0]


def test_nifti_slope_zero_means_no_scaling(tmp_path):
    # NIfTI-1: scl_slope == 0 -> ignore scaling entirely, including a stale
    # nonzero scl_inter (common in the wild; nibabel/SimpleITK do the same)
    import struct

    from fetal_t2mapping_tpu.core import Volume, nifti

    data = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    p = str(tmp_path / "v.nii")
    nifti.write(p, Volume(data, spacing=(1, 1, 1), origin=(0, 0, 0)))
    raw = bytearray(open(p, "rb").read())
    struct.pack_into("<f", raw, 112, 0.0)    # scl_slope = 0
    struct.pack_into("<f", raw, 116, 99.0)   # stale intercept
    open(p, "wb").write(bytes(raw))
    back = nifti.read(p)
    np.testing.assert_array_equal(np.asarray(back.data), data)


def test_te_filename_has_no_spaces():
    acq = {"prj": "prj-003", "sub": "sub-001", "ses": "ses-01", "run": "run-80",
           "EchoTime": 0.080, "ImageOrientationPatientSTR": "ax"}
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        p = get_img_path(d, acq, "recon_1mm")
        assert " " not in p
        assert "te-80_" in p


def test_sample_nearest_envelope_matches_trilinear():
    import jax.numpy as jnp

    from fetal_t2mapping_tpu.ops.interp import sample_nearest, sample_trilinear

    vol = np.arange(27, dtype=np.float32).reshape(3, 3, 3)
    # z = 2.3 is outside the continuous support [0, 2]: both samplers -> cval
    coords = jnp.asarray([[2.3, 1.0, 1.0], [1.5, 1.0, 1.0]])
    tri = np.asarray(sample_trilinear(vol, coords, cval=-1.0))
    nn = np.asarray(sample_nearest(vol, coords, cval=-1.0))
    assert tri[0] == -1.0 and nn[0] == -1.0
    assert nn[1] == vol[2, 1, 1]  # floor(1.5 + 0.5) = 2, scipy/ITK convention


def test_dicom_deflated_transfer_syntax(tmp_path):
    import struct
    import zlib

    from tests.test_dcm2nifti import _el_explicit
    from fetal_t2mapping_tpu.utils.dicom import read_dcm

    body = _el_explicit(0x0008, 0x103E, b"LO", b"deflated_series")
    body += _el_explicit(0x0018, 0x0081, b"DS", b"114")
    deflated = zlib.compress(body, 6)[2:-4]  # raw deflate (strip zlib wrapper)
    ts = "1.2.840.10008.1.2.1.99".encode()
    meta_body = _el_explicit(0x0002, 0x0010, b"UI", ts)
    meta = _el_explicit(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))) + meta_body
    p = tmp_path / "defl.dcm"
    p.write_bytes(b"\x00" * 128 + b"DICM" + meta + deflated)
    ds = read_dcm(str(p))
    assert ds.get("SeriesDescription") == "deflated_series"
    assert ds.get("EchoTime") == 114


def test_implicit_vr_numeric_tags_decode_as_numbers(tmp_path):
    from tests.test_dcm2nifti import write_test_dicom
    from fetal_t2mapping_tpu.utils.dicom import read_dcm

    p = str(tmp_path / "i.dcm")
    write_test_dicom(p, np.zeros((4, 4), np.uint16), ipp=(1.5, 2.5, 3.5),
                     explicit=False)
    ds = read_dcm(p)
    assert ds.get("EchoTime") == 114.0
    assert ds.get("ImagePositionPatient") == [1.5, 2.5, 3.5]
    assert isinstance(ds.get("SliceThickness"), float)


def test_echostack_rejects_geometry_mismatch():
    from fetal_t2mapping_tpu.core import Volume
    from fetal_t2mapping_tpu.core.stack import EchoStack

    a = Volume(np.ones((4, 4, 4), np.float32), spacing=(1, 1, 1), origin=(0, 0, 0))
    b = Volume(np.ones((4, 4, 4), np.float32), spacing=(1, 1, 1), origin=(5, 0, 0))
    m = Volume(np.ones((4, 4, 4), np.uint8), spacing=(1, 1, 1), origin=(0, 0, 0))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="physical-grid mismatch"):
        EchoStack.from_volumes([a, b], [m, m], [114.0, 202.0])


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------- round 2
def test_min_mask_frac_covers_capacity_floor():
    # ADVICE r1: int(n*frac)//128*128 floors capacity; the suggested frac
    # must actually yield capacity >= the touched blocks for awkward n
    from fetal_t2mapping_tpu.models.volume_fit import (_block_capacity,
                                                       _min_mask_frac)

    for n, n_masked in [(64 ** 3, 40000), (100003, 99990), (128, 128),
                        (250047, 31217), (1 << 24, 1350011)]:
        for block in (1, 32, 64):
            n_blocks = min(-(-n_masked // block), -(-n // block))
            frac = _min_mask_frac(n, n_blocks, block)
            assert _block_capacity(n, frac, block) >= n_blocks, (
                n, n_masked, block, frac)
            assert frac <= 1.0


def test_series_to_volume_rejects_interleaved_echoes(tmp_path):
    # ADVICE r1: multi-file series with repeated slice positions (one file
    # per echo) must refuse to stack instead of interleaving echoes
    import pytest

    from fetal_t2mapping_tpu.utils.dcm2nifti import series_to_volume
    from tests.test_dcm2nifti import write_test_dicom

    img = np.ones((6, 8), np.uint16)
    paths = []
    for i, te in enumerate([114.0, 202.0]):
        for z in range(3):
            p = str(tmp_path / f"e{i}_z{z}.dcm")
            write_test_dicom(p, img, ipp=(0.0, 0.0, 3.0 * z),
                             te=te, instance=i * 3 + z + 1)
            paths.append(p)
    with pytest.raises(ValueError, match="EchoTime"):
        series_to_volume(paths)


def test_wilcoxon_pairing_aligns_on_index():
    # VERDICT r1 weak #7: pandas Series must pair by index identity, and
    # unequal-length plain arrays must not be truncate-paired
    import pandas as pd

    from fetal_t2mapping_tpu.analysis.figures import _aligned_pair

    a = pd.Series([1.0, 2.0, 3.0], index=["roi_a", "roi_b", "roi_c"])
    b = pd.Series([30.0, 10.0, 99.0], index=["roi_c", "roi_a", "roi_zzz"])
    xa, xb = _aligned_pair(a, b)
    # common index {roi_a, roi_c}: values must line up by ROI, not position
    assert sorted(zip(xa, xb)) == [(1.0, 10.0), (3.0, 30.0)]

    xa, xb = _aligned_pair(np.arange(5.0), np.arange(7.0))
    assert xa is None and xb is None
    xa, xb = _aligned_pair(np.arange(5.0), np.arange(5.0) + 1)
    assert len(xa) == 5


def test_masks_and_bet_raises_on_missing_mask(tmp_path):
    # ADVICE r1: recon/mask pairing must derive the mask path from the recon
    # filename and fail loudly when it is missing (was: zip of two globs)
    import pandas as pd
    import pytest

    from fetal_t2mapping_tpu import config as C
    from fetal_t2mapping_tpu.core.volume import Volume
    from fetal_t2mapping_tpu.core import nifti
    from fetal_t2mapping_tpu.pipeline.recon_pipeline import run_masks_and_bet

    md = pd.DataFrame([{"prj": "prj-XXX", "sub": "sub-001", "ses": "ses-01"}])
    recon_dir = tmp_path / "prj-XXX" / "derivatives" / C.RECON_DIRNAME / "sub-001" / "ses-01" / "anat"
    recon_dir.mkdir(parents=True)
    vol = Volume(data=np.ones((4, 4, 4), np.float32), spacing=(1, 1, 1),
                 origin=(0, 0, 0), direction=(1, 0, 0, 0, 1, 0, 0, 0, 1))
    nifti.write(str(recon_dir / f"sub-001_ses-01_te-114_{C.RECON_DIRNAME}.nii.gz"), vol)
    # no synthseg labels -> no mask file gets built -> must raise, not skip
    with pytest.raises(FileNotFoundError, match="no mask for recon"):
        run_masks_and_bet(md, str(tmp_path))


def test_persistent_compile_cache_config(tmp_path):
    # the package enables a persistent XLA compile cache by default (compiles
    # cost 15-40 s/shape on the target chip and were repaid every process);
    # env must be able to relocate and disable it
    import subprocess
    import sys

    code = ("import fetal_t2mapping_tpu, jax; "
            "print(jax.config.jax_compilation_cache_dir or '')")
    on = subprocess.run([sys.executable, "-c", code],
                        env={**__import__('os').environ,
                             "FT2_COMPILE_CACHE": str(tmp_path / "cc")},
                        capture_output=True, text=True, cwd=_REPO_ROOT)
    assert on.stdout.strip() == str(tmp_path / "cc"), on.stderr[-500:]
    off = subprocess.run([sys.executable, "-c", code],
                         env={**__import__('os').environ,
                              "FT2_COMPILE_CACHE": "0"},
                         capture_output=True, text=True, cwd=_REPO_ROOT)
    assert off.stdout.strip() == "", off.stderr[-500:]
