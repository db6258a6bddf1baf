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
