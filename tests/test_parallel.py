"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax

from fetal_t2mapping_tpu.models import loglinear_init, fit_batch
from fetal_t2mapping_tpu.parallel import (
    fit_batch_sharded,
    pad_to_devices,
    shard_voxels,
    voxel_mesh,
)


def _signals(n, seed=0):
    rng = np.random.default_rng(seed)
    te = np.array([114.0, 202.0, 299.0], np.float32)
    k = rng.uniform(600, 5000, n).astype(np.float32)
    t2 = rng.uniform(20, 500, n).astype(np.float32)
    s = np.maximum(k[:, None] * np.exp(-te[None, :] / t2[:, None]), 1e-3).astype(np.float32)
    return s, te, k, t2


class TestMesh:
    def test_eight_virtual_devices(self):
        assert jax.device_count() == 8
        mesh = voxel_mesh()
        assert mesh.devices.size == 8

    def test_pad_to_devices(self):
        mesh = voxel_mesh()
        assert pad_to_devices(1, mesh, lane=8) == 64
        assert pad_to_devices(65, mesh, lane=8) == 128

    def test_shard_placement(self):
        mesh = voxel_mesh()
        x = np.zeros((128, 3), np.float32)
        sx = shard_voxels(x, mesh)
        assert len(sx.sharding.device_set) == 8

    def test_sharded_fit_matches_single(self):
        mesh = voxel_mesh()
        n = pad_to_devices(100, mesh, lane=8)
        s, te, k, t2 = _signals(n)
        lo, hi = (0.0, 10.0), (1e6, 2000.0)
        x0 = np.asarray(loglinear_init(s, te, lo, hi))
        sharded = fit_batch_sharded(s, te, x0, lo, hi, mesh=mesh, model="gaussian")
        single = fit_batch(s, te, x0, lo, hi, model="gaussian")
        np.testing.assert_allclose(np.asarray(sharded.x), np.asarray(single.x), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sharded.x)[:, 1], t2, rtol=1e-3)


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __graft_entry__ as ge

        fn, args = ge.entry()
        x, conv, res = jax.jit(fn)(*args)
        assert x.shape == (args[0].shape[0], 2)
        assert np.asarray(conv).mean() > 0.9
        assert np.isfinite(np.asarray(res)).all()

    def test_dryrun_multichip(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestAdversarialSharding:
    """VERDICT r1 item 10: shard-nonuniform convergence behavior.

    The per-shard straggler compaction must give bit-identical results to a
    single-chip run even when unconverged voxels are concentrated in ONE
    shard (worst-case straggler skew: some shards' phase-2 buffers overflow
    while others are empty)."""

    def _skewed_signals(self, n, n_shards=8, seed=3):
        """Clean fast-converging voxels everywhere except shard 0, which is
        ALL noise-floor stragglers."""
        rng = np.random.default_rng(seed)
        te = np.array([114.0, 202.0, 299.0], np.float32)
        k = rng.uniform(600, 5000, n).astype(np.float32)
        t2 = rng.uniform(80, 400, n).astype(np.float32)
        s = (k[:, None] * np.exp(-te[None, :] / t2[:, None])).astype(np.float32)
        shard = n // n_shards
        # shard 0: heavy noise on steep decays -> slow/ridge voxels
        t2[:shard] = rng.uniform(12, 25, shard).astype(np.float32)
        s[:shard] = np.maximum(
            k[:shard, None] * np.exp(-te[None, :] / t2[:shard, None])
            + rng.normal(0, 30.0, (shard, 3)).astype(np.float32), 1e-2)
        return s, te

    def test_skewed_stragglers_match_single_chip(self):
        from fetal_t2mapping_tpu.models.pallas_fit import fit_fused
        from fetal_t2mapping_tpu.parallel import fit_fused_sharded

        mesh = voxel_mesh()
        n = pad_to_devices(2000, mesh, lane=128)
        s, te = self._skewed_signals(n)
        lo, hi = (0.0, 10.0), (1e6, 2000.0)
        kw = dict(phase1_iters=6, max_iters=40, tail_frac=0.02, tail_rounds=2,
                  strategy="twophase")  # pin: this test targets compaction
        sharded = fit_fused_sharded(s, tuple(te.tolist()), lo, hi, mesh=mesh, **kw)
        single = fit_fused(s, tuple(te.tolist()), lo, hi, **kw)

        # per-shard compaction: every shard refits ITS stragglers with the
        # full budget; parity must hold voxel-for-voxel wherever the refit
        # actually happened in both (the straggler shard may overflow its
        # smaller per-shard buffer in one and not the other, which is
        # exactly what n_overflow reports)
        x_s, x_1 = np.asarray(sharded.x), np.asarray(single.x)
        conv_s = np.asarray(sharded.converged)
        conv_1 = np.asarray(single.converged)
        both = conv_s & conv_1
        assert both.mean() > 0.8
        np.testing.assert_allclose(x_s[both], x_1[both], rtol=1e-5, atol=1e-5)
        # overflow is REPORTED, not silent, on both paths
        assert int(sharded.n_overflow) >= 0
        assert int(single.n_overflow) >= 0

    def test_skewed_stragglers_full_budget_bitwise_parity(self):
        # with enough tail capacity nobody overflows and the sharded result
        # is exactly the single-chip result, straggler skew or not
        from fetal_t2mapping_tpu.models.pallas_fit import fit_fused
        from fetal_t2mapping_tpu.parallel import fit_fused_sharded

        mesh = voxel_mesh()
        n = pad_to_devices(2000, mesh, lane=128)
        s, te = self._skewed_signals(n)
        lo, hi = (0.0, 10.0), (1e6, 2000.0)
        kw = dict(phase1_iters=6, max_iters=40, tail_frac=0.5, tail_rounds=3,
                  strategy="twophase")  # pin: this test targets compaction
        sharded = fit_fused_sharded(s, tuple(te.tolist()), lo, hi, mesh=mesh, **kw)
        single = fit_fused(s, tuple(te.tolist()), lo, hi, **kw)
        assert int(sharded.n_overflow) == 0 and int(single.n_overflow) == 0
        np.testing.assert_array_equal(np.asarray(sharded.converged),
                                      np.asarray(single.converged))
        np.testing.assert_allclose(np.asarray(sharded.x), np.asarray(single.x),
                                   rtol=0, atol=0)  # bitwise

    def test_fit_volume_sharded_8dev(self):
        """8-device masked volume fit: shard the flattened voxel grid of a
        (Z,Y,X,T) stack, fit, scatter — and match the single-device
        fit_volume maps exactly."""
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fetal_t2mapping_tpu.models.volume_fit import fit_volume

        mesh = voxel_mesh()
        rng = np.random.default_rng(5)
        z, y, x = 8, 16, 16
        te = np.array([114.0, 202.0, 299.0], np.float32)
        t2 = rng.uniform(50, 400, (z, y, x)).astype(np.float32)
        k = rng.uniform(600, 4000, (z, y, x)).astype(np.float32)
        sig = (k[..., None] * np.exp(-te / t2[..., None])).astype(np.float32)
        mask = np.zeros((z, y, x), bool)
        mask[2:6, 4:12, 4:12] = True

        res_1 = fit_volume(sig, mask, tuple(te.tolist()), (0.0, 10.0),
                           (1e6, 2000.0), mask_frac=0.5, compact=True)
        # device-put the stack sharded over Z (leading axis) and run the
        # same single-jit program: XLA partitions compaction+fit+scatter
        sig_sh = jax.device_put(sig, NamedSharding(mesh, P("vox", None, None, None)))
        mask_sh = jax.device_put(mask, NamedSharding(mesh, P("vox", None, None)))
        res_8 = fit_volume(sig_sh, mask_sh, tuple(te.tolist()), (0.0, 10.0),
                           (1e6, 2000.0), mask_frac=0.5, compact=True)
        assert int(res_8.n_overflow) == 0
        np.testing.assert_allclose(np.asarray(res_8.t2), np.asarray(res_1.t2),
                                   rtol=1e-6, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(res_8.converged),
                                      np.asarray(res_1.converged))
        rel = np.abs(np.asarray(res_8.t2)[mask] - t2[mask]) / t2[mask]
        assert rel.max() < 1e-3

        # the DENSE serving path (no compaction) must partition trivially
        # over the same mesh and agree with its own single-device run
        res_1d = fit_volume(sig, mask, tuple(te.tolist()), (0.0, 10.0),
                            (1e6, 2000.0), compact=False)
        res_8d = fit_volume(sig_sh, mask_sh, tuple(te.tolist()), (0.0, 10.0),
                            (1e6, 2000.0), compact=False)
        np.testing.assert_allclose(np.asarray(res_8d.t2),
                                   np.asarray(res_1d.t2),
                                   rtol=1e-6, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(res_8d.converged),
                                      np.asarray(res_1d.converged))

    def test_fit_volume_sharded_large_nondivisible(self):
        """VERDICT r2 item 9: a >=10^5-voxel sharded fit with mask geometry
        that divides into the 8-way mesh UNEVENLY — per-shard masked counts
        all different and none a multiple of the 128-lane/8-row tiles — so
        per-shard padding and block-capacity rounding actually interact
        like production masks. Asserts map parity with the single-device
        program and first-class overflow accounting on both paths."""
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fetal_t2mapping_tpu.models.volume_fit import fit_volume

        mesh = voxel_mesh()
        rng = np.random.default_rng(11)
        z, y, x = 56, 48, 48                      # 129,024 voxels; 56 = 8*7
        te = np.array([114.0, 202.0, 299.0], np.float32)
        t2 = rng.uniform(30, 450, (z, y, x)).astype(np.float32)
        k = rng.uniform(600, 4000, (z, y, x)).astype(np.float32)
        sig = (k[..., None] * np.exp(-te / t2[..., None])).astype(np.float32)
        sig = np.maximum(sig + rng.normal(0, 6.0, sig.shape), 1e-2).astype(np.float32)

        # ragged brain-ish mask: tilted ellipsoid + holes -> per-shard
        # masked counts are all different and never tile-aligned
        zz, yy, xx = np.meshgrid(np.linspace(-1, 1, z), np.linspace(-1, 1, y),
                                 np.linspace(-1, 1, x), indexing="ij")
        mask = ((zz + 0.15 * yy) / 0.8) ** 2 + (yy / 0.7) ** 2 \
            + ((xx - 0.1 * zz) / 0.6) ** 2 <= 1.0
        mask &= rng.uniform(size=mask.shape) > 0.05   # 5% holes
        per_shard = mask.reshape(8, -1).sum(axis=1)
        assert len(set(per_shard.tolist())) > 4       # genuinely uneven
        assert int(mask.sum()) > 20_000

        # compact=True pinned: this test is ABOUT the compaction machinery
        # (capacity rounding / per-shard padding); 'auto' at this mask_frac
        # would reroute to the dense path and silently stop covering it
        kw = dict(model="gaussian", mask_frac=0.6, compact=True)
        res_1 = fit_volume(sig, mask, tuple(te.tolist()), (0.0, 10.0),
                           (1e6, 2000.0), **kw)
        sig_sh = jax.device_put(sig, NamedSharding(mesh, P("vox", None, None, None)))
        mask_sh = jax.device_put(mask, NamedSharding(mesh, P("vox", None, None)))
        res_8 = fit_volume(sig_sh, mask_sh, tuple(te.tolist()), (0.0, 10.0),
                           (1e6, 2000.0), **kw)

        assert int(res_8.n_masked) == int(res_1.n_masked) == int(mask.sum())
        assert int(res_8.n_overflow) == 0 and int(res_1.n_overflow) == 0
        np.testing.assert_array_equal(np.asarray(res_8.converged),
                                      np.asarray(res_1.converged))
        np.testing.assert_allclose(np.asarray(res_8.t2), np.asarray(res_1.t2),
                                   rtol=1e-6, atol=1e-5)
        np.testing.assert_allclose(np.asarray(res_8.k), np.asarray(res_1.k),
                                   rtol=1e-6, atol=1e-3)
        # accuracy against simulation truth on identifiable masked voxels
        ident = mask & (k * np.exp(-te[-1] / t2) >= 3 * 6.0)
        got = np.asarray(res_8.t2)[ident]
        rel = np.abs(got - t2[ident]) / t2[ident]
        assert np.median(rel) < 2e-2


def test_fit_fused_sharded_rejects_bad_tail_block():
    """Same clear contract error as fit_fused — not an opaque XLA shape
    failure deep inside the shard_mapped program."""
    import pytest

    from fetal_t2mapping_tpu.parallel.mesh import fit_fused_sharded, voxel_mesh

    sig = np.ones((128, 3), np.float32)
    with pytest.raises(ValueError, match="tail_block must divide 128"):
        fit_fused_sharded(sig, (114.0, 202.0, 299.0), (0.0, 10.0),
                          (1e6, 2000.0), voxel_mesh(), model="gaussian",
                          strategy="twophase", tail_block=12)


class TestShardedRegistration:
    """register_* with mesh=: the metric's fixed-sample axis sharded over
    the 8-device mesh, GSPMD psum collectives for the sample reductions
    (the production surface of dryrun_multichip's path 4)."""

    def _pair(self, seed=3, shape=(24, 24, 24)):
        from tests.test_recon import _blob_volume, _rigid_world_matrix
        from fetal_t2mapping_tpu.recon.resample import resample_to_reference

        fixed = _blob_volume(shape=shape, seed=seed)
        center = np.asarray(fixed.center_world())
        T_true = _rigid_world_matrix(0.04, -0.03, 0.05, [3.0, -2.0, 2.0],
                                     center)
        moving = resample_to_reference(fixed, fixed, transform=T_true)
        return fixed, moving, T_true, center

    @staticmethod
    def _assert_recovers(reg, T_true, center, atol_rot=0.02, atol_mm=1.0):
        comp = T_true @ reg.matrix
        np.testing.assert_allclose(comp[:3, :3], np.eye(3), atol=atol_rot)
        resid = np.abs(comp[:3, 3] - center + comp[:3, :3] @ center)
        assert resid.max() < atol_mm, resid

    def test_mesh_rigid_matches_single_device(self):
        from fetal_t2mapping_tpu.recon.registration import register_rigid
        from tests.test_recon import FAST_REG

        fixed, moving, T_true, center = self._pair()
        mesh = voxel_mesh()
        # fixed iteration budget on both sides: the trajectories see the
        # same gradients up to reduction-order rounding, so the solves
        # must land on (near-)identical transforms
        kw = dict(FAST_REG, stop_tol=None)
        reg1 = register_rigid(fixed, moving, **kw)
        reg8 = register_rigid(fixed, moving, mesh=mesh, **kw)
        self._assert_recovers(reg1, T_true, center)
        self._assert_recovers(reg8, T_true, center)
        np.testing.assert_allclose(reg8.matrix[:3, :3], reg1.matrix[:3, :3],
                                   atol=5e-3)
        np.testing.assert_allclose(reg8.matrix[:3, 3], reg1.matrix[:3, 3],
                                   atol=0.3)

    def test_mesh_mi_histogram_collectives(self):
        """MI's Parzen joint histogram is a (B,N)x(N,B) matmul over the
        SHARDED sample axis — the genuine cross-shard reduction. A
        non-power-of-two level grid (21^3 = 9261 samples) also exercises
        the even-resample-to-multiple fallback."""
        from fetal_t2mapping_tpu.recon.registration import register_rigid

        fixed, moving, T_true, center = self._pair(seed=5, shape=(21, 21, 21))
        reg8 = register_rigid(fixed, moving, mesh=voxel_mesh(), metric="mi",
                              levels=(2, 1), sigmas=(1.0, 0.0),
                              iters=(100, 60), lr=0.8, stop_tol=None)
        self._assert_recovers(reg8, T_true, center, atol_rot=0.03,
                              atol_mm=1.5)

    def test_mesh_multi_pair(self):
        from fetal_t2mapping_tpu.recon.registration import register_rigid_multi
        from fetal_t2mapping_tpu.recon.resample import resample_to_reference
        from tests.test_recon import (FAST_REG, _blob_volume,
                                      _rigid_world_matrix)

        fixed = _blob_volume(seed=7)
        center = np.asarray(fixed.center_world())
        poses = [
            _rigid_world_matrix(0.03, 0.02, -0.04, [2.0, -1.5, 2.5], center),
            _rigid_world_matrix(-0.04, 0.03, 0.02, [-2.5, 2.0, -1.5], center),
        ]
        movings = [resample_to_reference(fixed, fixed, transform=T)
                   for T in poses]
        regs = register_rigid_multi(fixed, movings, mesh=voxel_mesh(),
                                    **dict(FAST_REG, stop_tol=None))
        for reg, T_true in zip(regs, poses):
            self._assert_recovers(reg, T_true, center)


class TestMeshUNet:
    """Spatially-partitioned U-Net inference: segment_volume(mesh=...)
    shards the volume's z axis over the mesh with replicated weights;
    GSPMD inserts the conv halo exchanges. Output must match the
    single-device program exactly (same fp32 program, partitioned)."""

    def test_segment_volume_mesh_matches_single(self):
        from fetal_t2mapping_tpu.labels.unet3d import (
            UNetConfig, random_params, segment_volume)
        import jax.numpy as jnp

        cfg = UNetConfig(n_levels=3, base_features=4, n_labels=7)
        params = random_params(cfg, seed=6)
        data = np.abs(np.random.default_rng(6).normal(
            500, 120, (30, 17, 13))).astype(np.float32)   # pads to z=32 -> 4/shard
        single = segment_volume(params, data, cfg, compute_dtype=jnp.float32)
        sharded = segment_volume(params, data, cfg, compute_dtype=jnp.float32,
                                 mesh=voxel_mesh())
        np.testing.assert_array_equal(sharded, single)

    def test_mesh_non_divisible_z(self):
        """z not a multiple of the mesh size: the volume pads up to
        lcm(divisor, ndev), runs partitioned, and crops back — shape and
        label validity preserved (boundary labels may see extra zero
        context vs single-device; that's documented padding semantics)."""
        from fetal_t2mapping_tpu.labels.unet3d import (
            UNetConfig, random_params, segment_volume)
        import jax.numpy as jnp

        cfg = UNetConfig(n_levels=3, base_features=4, n_labels=7)
        params = random_params(cfg, seed=8)
        data = np.abs(np.random.default_rng(8).normal(
            500, 120, (20, 13, 9))).astype(np.float32)  # pads 20 -> 24 on mesh
        sharded = segment_volume(params, data, cfg, compute_dtype=jnp.float32,
                                 mesh=voxel_mesh())
        assert sharded.shape == data.shape
        assert set(np.unique(sharded)) <= set(range(cfg.n_labels))

    def test_mesh_rejects_s2d(self):
        from fetal_t2mapping_tpu.labels.unet3d import (
            UNetConfig, random_params, segment_volume)

        cfg = UNetConfig(n_levels=2, base_features=2, n_labels=3)
        params = random_params(cfg, seed=0)
        with np.testing.assert_raises(ValueError):
            segment_volume(params, np.ones((8, 8, 8), np.float32), cfg,
                           use_s2d=True, mesh=voxel_mesh())
