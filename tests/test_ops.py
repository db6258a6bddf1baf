"""Device kernels vs scipy references: morphology, interpolation, TV."""

import numpy as np
import pytest
from scipy import ndimage
from scipy.interpolate import RegularGridInterpolator

from fetal_t2mapping_tpu.ops.interp import sample_nearest, sample_trilinear
from fetal_t2mapping_tpu.ops.morphology import (
    binary_closing,
    binary_dilate,
    binary_erode,
    fill_holes,
)
from fetal_t2mapping_tpu.ops.tv import tv_denoise_slices


def _ball(radius):
    g = np.arange(-radius, radius + 1)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    return zz * zz + yy * yy + xx * xx <= radius * radius


class TestMorphology:
    def test_ball_dilate_matches_scipy(self):
        rng = np.random.default_rng(0)
        m = rng.random((16, 18, 20)) > 0.97
        for r in (1, 2, 4):
            ours = np.asarray(binary_dilate(m, r))
            ref = ndimage.binary_dilation(m, structure=_ball(r))
            np.testing.assert_array_equal(ours, ref)

    def test_ball_erode_matches_scipy(self):
        m = np.zeros((14, 14, 14), bool)
        m[3:11, 2:12, 4:12] = True
        for r in (1, 2):
            ours = np.asarray(binary_erode(m, r))
            ref = ndimage.binary_erosion(m, structure=_ball(r))
            np.testing.assert_array_equal(ours, ref)

    def test_box_matches_scipy(self):
        rng = np.random.default_rng(1)
        m = rng.random((10, 11, 12)) > 0.9
        ours = np.asarray(binary_dilate(m, 1, box=True))
        ref = ndimage.binary_dilation(m, structure=np.ones((3, 3, 3)))
        np.testing.assert_array_equal(ours, ref)
        ours_e = np.asarray(binary_erode(m, 1, box=True))
        ref_e = ndimage.binary_erosion(m, structure=np.ones((3, 3, 3)))
        np.testing.assert_array_equal(ours_e, ref_e)

    def test_fill_holes_matches_scipy(self):
        m = np.zeros((12, 12, 12), bool)
        m[2:10, 2:10, 2:10] = True
        m[5:7, 5:7, 5:7] = False          # internal cavity
        m[0:2, 0:2, 0:2] = False          # border-open region stays
        ours = np.asarray(fill_holes(m))
        ref = ndimage.binary_fill_holes(m)
        np.testing.assert_array_equal(ours, ref)

    def test_closing(self):
        m = np.zeros((12, 12, 12), bool)
        m[3:9, 3:9, 3:9] = True
        m[5, 5, 5] = False
        closed = np.asarray(binary_closing(m, 2))
        assert closed[5, 5, 5]


class TestInterp:
    def test_trilinear_matches_scipy(self):
        rng = np.random.default_rng(2)
        vol = rng.standard_normal((9, 10, 11)).astype(np.float32)
        z, y, x = np.arange(9), np.arange(10), np.arange(11)
        rgi = RegularGridInterpolator((z, y, x), vol, method="linear")
        pts = rng.uniform([0, 0, 0], [8, 9, 10], size=(500, 3))
        ref = rgi(pts)
        ours = np.asarray(sample_trilinear(vol, pts.astype(np.float32)))
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)

    def test_out_of_bounds_cval(self):
        vol = np.ones((4, 4, 4), np.float32)
        pts = np.array([[-1.0, 0, 0], [0, 0, 5.0], [1, 1, 1]], np.float32)
        out = np.asarray(sample_trilinear(vol, pts, cval=-7.0))
        np.testing.assert_allclose(out, [-7.0, -7.0, 1.0])

    def test_nearest(self):
        vol = np.arange(27, dtype=np.int32).reshape(3, 3, 3)
        # x = 2.4 is outside the continuous support [0, 2]: cval, matching
        # sample_trilinear's envelope (a NN-resampled mask must never extend
        # beyond the linearly-resampled image)
        pts = np.array([[0.4, 1.6, 2.4], [2.0, 0.0, 0.0], [0.4, 1.6, 1.6]], np.float32)
        out = np.asarray(sample_nearest(vol, pts, cval=-1))
        assert out[0] == -1
        assert out[1] == vol[2, 0, 0]
        assert out[2] == vol[0, 2, 2]

    def test_trilinear_flat_matches_unflat_per_block(self):
        """sample_trilinear_flat on a concatenated buffer == sample_trilinear
        on each block — including out-of-bounds cval and the guarantee that
        clamped reads never leak into a neighbouring block."""
        from fetal_t2mapping_tpu.ops.interp import sample_trilinear_flat

        rng = np.random.default_rng(4)
        blocks = rng.standard_normal((3, 6, 7, 8)).astype(np.float32)
        flat = blocks.reshape(-1)
        pts = rng.uniform([-1, -1, -1], [6.5, 7.5, 8.5], size=(400, 3)).astype(np.float32)
        for p in range(3):
            ref = np.asarray(sample_trilinear(blocks[p], pts, cval=-3.0))
            got = np.asarray(sample_trilinear_flat(
                flat, (6, 7, 8), pts, base=p * 6 * 7 * 8, cval=-3.0))
            np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    def test_gradient_flows_through_coords(self):
        import jax
        import jax.numpy as jnp

        vol = jnp.asarray(np.linspace(0, 1, 64, dtype=np.float32).reshape(4, 4, 4))
        f = lambda c: sample_trilinear(vol, c).sum()
        g = jax.grad(f)(jnp.asarray([[1.2, 1.7, 2.1]], jnp.float32))
        assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0


class TestTV:
    def test_reduces_noise_preserves_edges(self):
        rng = np.random.default_rng(3)
        truth = np.zeros((4, 32, 32), np.float32)
        truth[:, 8:24, 8:24] = 1.0
        noisy = truth + rng.normal(0, 0.15, truth.shape).astype(np.float32)
        den = np.asarray(tv_denoise_slices(noisy, weight=0.1))
        assert den.shape == noisy.shape
        err_noisy = np.mean((noisy - truth) ** 2)
        err_den = np.mean((den - truth) ** 2)
        assert err_den < 0.5 * err_noisy

    def test_constant_image_fixed_point(self):
        img = np.full((2, 16, 16), 3.25, np.float32)
        den = np.asarray(tv_denoise_slices(img))
        np.testing.assert_allclose(den, img, atol=1e-5)
