"""Fused Pallas kernel vs the pure-JAX solver (interpret mode on CPU).

The kernel implements the same init + damped projected-Newton semantics as
models.solver.fit_batch; on well-posed voxels the two must agree to fp32
tolerance (noise-ridge voxels where neither converges are excluded, as in
the BASELINE.md accuracy gate).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fetal_t2mapping_tpu.models.init import loglinear_init
from fetal_t2mapping_tpu.models.pallas_fit import fit_fused
from fetal_t2mapping_tpu.models.solver import fit_batch, fit_batch_twophase

TES = (114.0, 202.0, 299.0)
LO = (0.0, 10.0)
HI = (1e6, 2000.0)


def _synthetic(n, noise=4.0, seed=0):
    rng = np.random.default_rng(seed)
    te = np.asarray(TES, np.float32)
    k = rng.uniform(600.0, 5000.0, n).astype(np.float32)
    t2 = rng.uniform(40.0, 500.0, n).astype(np.float32)
    sig = (k[:, None] * np.exp(-te[None, :] / t2[:, None])).astype(np.float32)
    sig = np.maximum(sig + rng.normal(0, noise, sig.shape).astype(np.float32), 1e-2)
    return sig, k, t2


def test_fused_matches_jax_solver():
    sig, k, t2 = _synthetic(512)
    r_f = fit_fused(sig, TES, LO, HI, phase1_iters=12, max_iters=40)
    x0 = loglinear_init(sig, jnp.asarray(TES, jnp.float32), LO, HI)
    r_j = fit_batch(sig, jnp.asarray(TES, jnp.float32), x0, LO, HI,
                    model="gaussian", max_iters=40)
    xf, xj = np.asarray(r_f.x), np.asarray(r_j.x)
    ok = np.asarray(r_j.converged) & np.asarray(r_f.converged)
    assert ok.mean() > 0.95
    rel = np.abs(xf[ok, 1] - xj[ok, 1]) / np.maximum(xj[ok, 1], 1e-6)
    assert rel.max() < 1e-3, rel.max()


def test_fused_recovers_truth_noiseless():
    sig, k, t2 = _synthetic(256, noise=0.0)
    r = fit_fused(sig, TES, LO, HI, phase1_iters=10, max_iters=30)
    x = np.asarray(r.x)
    assert np.all(np.asarray(r.converged))
    np.testing.assert_allclose(x[:, 1], t2, rtol=2e-3)
    np.testing.assert_allclose(x[:, 0], k, rtol=2e-3)


def test_fused_result_shapes_and_padding():
    # N deliberately not a multiple of 128 to exercise padding
    sig, _, _ = _synthetic(300)
    r = fit_fused(sig, TES, LO, HI, phase1_iters=8, max_iters=16)
    assert r.x.shape == (300, 2)
    assert r.fun.shape == (300,)
    assert r.converged.shape == (300,)
    assert r.n_iter.shape == (300,)
    assert np.all(np.isfinite(np.asarray(r.x)))


def test_fused_rejects_unknown_model():
    sig, _, _ = _synthetic(64)
    with pytest.raises(NotImplementedError):
        fit_fused(sig, TES, (0.0, 10.0, 0.0), (1e6, 2000.0, 1e4), model="rician")


def test_twophase_on_device_matches_single_phase():
    sig, _, _ = _synthetic(1024, noise=6.0, seed=3)
    te = jnp.asarray(TES, jnp.float32)
    x0 = loglinear_init(sig, te, LO, HI)
    r1 = fit_batch(sig, te, x0, LO, HI, model="gaussian", max_iters=60)
    r2 = fit_batch_twophase(sig, te, x0, LO, HI, model="gaussian",
                            phase1_iters=12, max_iters=60)
    ok = np.asarray(r1.converged) & np.asarray(r2.converged)
    x1, x2 = np.asarray(r1.x), np.asarray(r2.x)
    rel = np.abs(x1[ok, 1] - x2[ok, 1]) / np.maximum(x1[ok, 1], 1e-6)
    assert rel.max() < 1e-3
    # twophase must not silently lose voxels
    assert np.asarray(r2.converged).mean() >= np.asarray(r1.converged).mean() - 0.01
