"""Recon layer tests: resampling, registration recovery, fusion, denoise."""

import numpy as np
import pytest

from fetal_t2mapping_tpu.core.volume import Volume
from fetal_t2mapping_tpu.recon.denoise import denoise_volume
from fetal_t2mapping_tpu.recon.fuse import fuse_orientations
from fetal_t2mapping_tpu.recon.registration import register_rigid
from fetal_t2mapping_tpu.recon.resample import resample_to_reference, resample_volume

FAST_REG = dict(levels=(2, 1), sigmas=(1.0, 0.0), iters=(80, 40), lr=0.8)


def _blob_volume(shape=(24, 24, 24), spacing=(2.0, 2.0, 2.0), seed=0):
    """Smooth multi-blob image with enough structure to register."""
    rng = np.random.default_rng(seed)
    nz, ny, nx = shape
    zz, yy, xx = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx), indexing="ij")
    data = np.zeros(shape, np.float32)
    for _ in range(6):
        cz, cy, cx = rng.uniform(6, np.array(shape) - 6)
        s = rng.uniform(2, 4)
        a = rng.uniform(0.5, 1.5)
        data += a * np.exp(-(((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s)))
    return Volume(data.astype(np.float32), spacing=spacing, origin=(-20.0, -20.0, -20.0))


def _rigid_world_matrix(rx, ry, rz, t, center):
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    R = Rz @ Rx @ Ry
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = np.asarray(center) - R @ np.asarray(center) + np.asarray(t)
    return T


class TestResample:
    def test_size_formula(self):
        vol = Volume(np.zeros((10, 20, 30), np.float32), spacing=(0.5, 1.0, 2.0))
        out = resample_volume(vol, (1.0, 1.0, 1.0))
        # size (x,y,z) = round(old_size * old_spacing / 1) = (15, 20, 20)
        assert out.size == (15, 20, 20)
        assert out.spacing == (1.0, 1.0, 1.0)
        assert out.origin == vol.origin

    def test_upsampling_preserves_linear_field(self):
        # a linear ramp is reproduced exactly by trilinear interpolation
        nz, ny, nx = 8, 8, 8
        zz, yy, xx = np.meshgrid(*(np.arange(8),) * 3, indexing="ij")
        ramp = (1.0 * xx + 2.0 * yy + 3.0 * zz).astype(np.float32)
        vol = Volume(ramp, spacing=(2.0, 2.0, 2.0))
        out = resample_volume(vol, (1.0, 1.0, 1.0))
        # world-space linear field: value = x/2 + y + 1.5z (index in fine grid)
        zz2, yy2, xx2 = np.meshgrid(*(np.arange(s) for s in out.shape), indexing="ij")
        expected = 0.5 * xx2 + 1.0 * yy2 + 1.5 * zz2
        interior = (slice(0, 15), slice(0, 15), slice(0, 15))
        np.testing.assert_allclose(out.data[interior], expected[interior].astype(np.float32),
                                   atol=1e-4)

    def test_translation_transform(self):
        vol = _blob_volume()
        T = np.eye(4)
        T[:3, 3] = [4.0, -2.0, 6.0]  # world mm shift
        out = resample_to_reference(vol, vol, transform=T)
        # sampling vol at w+t == shifting content by -t/spacing voxels
        shift_vox = np.array([4.0, -2.0, 6.0]) / np.asarray(vol.spacing)
        sz, sy, sx = int(shift_vox[2]), int(shift_vox[1]), int(shift_vox[0])
        inner = np.s_[8:16, 8:16, 8:16]
        np.testing.assert_allclose(
            out.data[inner],
            vol.data[8 + sz:16 + sz, 8 + sy:16 + sy, 8 + sx:16 + sx],
            atol=1e-4)


class TestRegistration:
    def test_recovers_known_rigid_transform(self):
        fixed = _blob_volume(seed=3)
        center = np.asarray(fixed.center_world())
        T_true = _rigid_world_matrix(0.05, -0.04, 0.06, [3.0, -2.0, 2.5], center)
        moving = resample_to_reference(fixed, fixed, transform=T_true)
        # registering moving onto fixed must recover T_true^{-1}... i.e. the
        # composition should be ~identity on the overlap
        reg = register_rigid(fixed, moving, **FAST_REG)
        comp = T_true @ reg.matrix
        np.testing.assert_allclose(comp[:3, :3], np.eye(3), atol=0.02)
        assert np.abs(comp[:3, 3] - center + comp[:3, :3] @ center).max() < 1.0  # mm
        # and the warped image should match the fixed one closely
        warped = resample_to_reference(moving, fixed, transform=reg.matrix)
        inner = np.s_[4:-4, 4:-4, 4:-4]
        f, w = fixed.data[inner], warped.data[inner]
        ncc = np.corrcoef(f.ravel(), w.ravel())[0, 1]
        assert ncc > 0.98, f"NCC after registration {ncc}"

    def test_metric_history_decreases(self):
        fixed = _blob_volume(seed=4)
        T = np.eye(4)
        T[:3, 3] = [3.0, 0.0, -3.0]
        moving = resample_to_reference(fixed, fixed, transform=T)
        reg = register_rigid(fixed, moving, **FAST_REG)
        h = reg.metric_history
        assert h[-1] < h[0]
        assert reg.final_metric < -0.9  # NCC > 0.9 achieved

    def test_warm_start_from_init_params(self):
        # warm-starting from a previous solve's parameters must converge at
        # least as well with a fraction of the budget (the hf->lf step's
        # use case: successive echoes share most of the motion)
        fixed = _blob_volume(seed=6)
        T = np.eye(4)
        T[:3, 3] = [4.0, -3.0, 2.0]
        moving = resample_to_reference(fixed, fixed, transform=T)
        full = register_rigid(fixed, moving, **FAST_REG)
        assert full.final_metric < -0.9
        warm_kwargs = dict(FAST_REG)
        warm_kwargs["iters"] = tuple(max(i // 5, 2)
                                     for i in FAST_REG.get("iters", (30, 20)))
        warm = register_rigid(fixed, moving, init_params=full.params,
                              **warm_kwargs)
        assert warm.final_metric <= full.final_metric + 0.01

    def test_device_lazy_result_consistency(self):
        # the device views (matrix_device/params_device) must agree with
        # the host fields, and a device-transform warp must match the host-
        # transform warp — the sync-free fusion chain depends on both
        import jax

        fixed = _blob_volume(seed=8)
        T = np.eye(4)
        T[:3, 3] = [3.0, -2.0, 4.0]
        moving = resample_to_reference(fixed, fixed, transform=T)
        reg = register_rigid(fixed, moving, **FAST_REG)
        assert isinstance(reg.matrix_device, jax.Array)
        assert isinstance(reg.params_device, jax.Array)
        np.testing.assert_allclose(np.asarray(reg.matrix_device), reg.matrix,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(reg.params_device), reg.params,
                                   atol=1e-6)
        w_host = resample_to_reference(moving, fixed, transform=reg.matrix)
        w_dev = resample_to_reference(moving, fixed,
                                      transform=reg.matrix_device, device=True)
        np.testing.assert_allclose(np.asarray(w_dev.data),
                                   np.asarray(w_host.data), atol=1e-2)
        # warm-starting from the device params matches host-params behavior
        warm = register_rigid(fixed, moving, init_params=reg.params_device,
                              **dict(FAST_REG, iters=(4, 2)))
        assert warm.final_metric <= reg.final_metric + 0.01

    def test_level_config_length_mismatch_raises(self):
        # a short samples/iters/sigmas sequence must not silently skip the
        # finest pyramid level(s)
        import pytest

        fixed = _blob_volume(seed=5)
        with pytest.raises(ValueError, match="samples"):
            register_rigid(fixed, fixed, levels=(4, 2, 1),
                           samples=(1 << 14, 1 << 14))
        with pytest.raises(ValueError, match="lengths differ"):
            register_rigid(fixed, fixed, levels=(4, 2), sigmas=(1.0,),
                           iters=(5, 5))


class TestFusion:
    def test_identical_inputs_identity_fusion(self):
        vol = _blob_volume(seed=5)
        fused = fuse_orientations({"ax": vol, "cor": vol, "sag": vol},
                                  registration_kwargs=FAST_REG)
        inner = np.s_[4:-4, 4:-4, 4:-4]
        np.testing.assert_allclose(fused.data[inner], vol.data[inner], atol=0.02)

    def test_missing_orientation_raises(self):
        vol = _blob_volume()
        with pytest.raises(ValueError, match="missing"):
            fuse_orientations({"ax": vol, "cor": vol})


class TestDenoise:
    def test_geometry_preserved(self):
        vol = _blob_volume(seed=6)
        out = denoise_volume(vol, weight=0.05)
        assert out.same_geometry(vol)
        assert np.isfinite(out.data).all()
