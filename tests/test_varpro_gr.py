"""VARPRO-reduced gaussian_rician kernel (pallas_fit._gr_varpro_kernel_body).

The reduction: f = mean_t (s - sqrt(k^2 E + sg^2))^2 is linear in
(a, b) = (k^2, sg^2) inside the sqrt, and the inner profile min over the
(a, b) box at fixed t2 is CONVEX (exact Hessian = sum_t (s_t/M_t^3) *
rank1([E_t, 1]), s_t >= 0) — so the 3-D multistart collapses to 1-D damped
Newton on the envelope F(t2). These tests pin the kernel against the
same-model scipy L-BFGS-B oracle (the reference solver's objective,
run_t2mapping.py:133-155) and against the multistart kernel it replaces.
"""

import numpy as np
import pytest

from fetal_t2mapping_tpu.config import FitConfig
from fetal_t2mapping_tpu.models.oracle import _objective, fit_batch_scipy
from fetal_t2mapping_tpu.models.pallas_fit import (
    fit_fused, resolve_strategy, resolve_varpro3)

TES = (114.0, 202.0, 299.0)
LO = (550.0, 10.0, 2.0)
HI = (10000.0, 600.0, 1000.0)
GUESS = (650.0, 110.0, 40.0)


def _synthetic(n, sg_true=8.0, seed=0):
    rng = np.random.default_rng(seed)
    te = np.asarray(TES, np.float32)
    k = rng.uniform(600.0, 5000.0, n).astype(np.float32)
    t2 = rng.uniform(20.0, 500.0, n).astype(np.float32)
    a = k[:, None] * np.exp(-te[None, :] / t2[:, None])
    sig = np.maximum(a + rng.normal(0, sg_true, a.shape), 1e-2).astype(np.float32)
    ident = k * np.exp(-te[-1] / t2) >= 3 * sg_true
    return sig, k, t2, ident


@pytest.fixture(scope="module")
def fitted():
    sig, k, t2, ident = _synthetic(8192)
    r = fit_fused(sig, TES, LO, HI, model="gaussian_rician", guess=GUESS,
                  max_iters=60, ftol=1e-2, gtol=1e-2, varpro3=True)
    return sig, k, t2, ident, r


def test_varpro_converges_and_recovers_truth(fitted):
    sig, k, t2, ident, r = fitted
    conv = np.asarray(r.converged)
    assert conv.mean() > 0.99
    assert ((~conv) & ident).mean() == 0.0       # no unconverged identifiable
    assert int(r.n_overflow) == 0
    x = np.asarray(r.x)
    rel = np.abs(x[:, 1] - t2) / t2
    assert np.median(rel[ident]) < 5e-2
    # bounds respected exactly
    for j, (l, h) in enumerate(zip(LO, HI)):
        assert x[:, j].min() >= l - 1e-3 and x[:, j].max() <= h + 1e-3


def test_varpro_objective_vs_lbfgsb_oracle(fitted):
    """One-sided objective parity on identifiable voxels: the kernel must
    never land meaningfully above the tightly-polished scipy minimum (the
    bench gate; measured max ~1e-5 in interpret mode — 45x tighter than
    the multistart kernel's 4.7e-4, because basin selection seeds at the
    exact interpolant and the inner profile polishes to machine level)."""
    sig, k, t2, ident, r = fitted
    rng = np.random.default_rng(1)
    idx = rng.choice(np.flatnonzero(ident), 128, replace=False)
    cfg_o = FitConfig(model="gaussian_rician", initial_guess=GUESS,
                      lower=LO, upper=HI, ftol=1e-2, gtol=1e-2)
    xs = fit_batch_scipy(sig[idx], np.asarray(TES, np.float64), cfg_o,
                         tight=True)
    objf = _objective("gaussian_rician")
    te64 = np.asarray(TES, np.float64)
    x = np.asarray(r.x)
    f_k = np.array([objf(x[i].astype(np.float64), te64,
                         sig[i].astype(np.float64)) for i in idx])
    f_s = np.array([objf(xs[j], te64, sig[idx[j]].astype(np.float64))
                    for j in range(len(idx))])
    gap = (f_k - f_s) / np.maximum(np.abs(f_s), 1.0)
    assert gap.max() < 2e-3, gap.max()


def test_varpro_matches_multistart_optima(fitted):
    """Same constrained optima as the 3-start multistart kernel on
    identifiable voxels (different algorithm, same objective)."""
    sig, k, t2, ident, r = fitted
    r_ms = fit_fused(sig, TES, LO, HI, model="gaussian_rician", guess=GUESS,
                     max_iters=60, ftol=1e-2, gtol=1e-2, varpro3=False)
    xv, xm = np.asarray(r.x), np.asarray(r_ms.x)
    rel = np.abs(xv[ident, 1] - xm[ident, 1]) / np.maximum(xm[ident, 1], 1.0)
    assert np.median(rel) < 1e-3
    assert np.percentile(rel, 99) < 5e-2


def test_varpro_reported_fun_matches_params(fitted):
    """FitResult.fun must be the true objective of FitResult.x (the carry
    stays in sync through accept/reject and the sqrt(a), sqrt(b) unpack)."""
    sig, k, t2, ident, r = fitted
    objf = _objective("gaussian_rician")
    te64 = np.asarray(TES, np.float64)
    x = np.asarray(r.x)
    sub = np.flatnonzero(ident)[:64]
    f_chk = np.array([objf(x[i].astype(np.float64), te64,
                           sig[i].astype(np.float64)) for i in sub])
    np.testing.assert_allclose(np.asarray(r.fun)[sub], f_chk,
                               rtol=1e-2, atol=5e-5)


def test_varpro_sigma_bound_riding():
    """A voxel whose interpolant wants sigma ABOVE the box: the profile must
    ride b to its bound and still deliver the constrained optimum (the
    same case the multistart kernel's clipped interp start covers)."""
    # slow decay + large noise floor: sg* above hi_sg
    sig = np.array([[900.0, 850.0, 820.0]], np.float32)
    lo = (550.0, 10.0, 2.0)
    hi = (10000.0, 600.0, 50.0)     # tight sigma box
    r = fit_fused(sig, TES, lo, hi, model="gaussian_rician", guess=GUESS,
                  max_iters=60, ftol=1e-2, gtol=1e-2, varpro3=True)
    x = np.asarray(r.x)[0]
    cfg_o = FitConfig(model="gaussian_rician", initial_guess=GUESS,
                      lower=lo, upper=hi, ftol=1e-2, gtol=1e-2)
    xs = fit_batch_scipy(sig, np.asarray(TES, np.float64), cfg_o, tight=True)
    objf = _objective("gaussian_rician")
    te64 = np.asarray(TES, np.float64)
    f_k = objf(x.astype(np.float64), te64, sig[0].astype(np.float64))
    f_s = objf(xs[0], te64, sig[0].astype(np.float64))
    assert f_k <= f_s * (1 + 1e-2) + 1e-6, (f_k, f_s, x, xs[0])


def test_varpro_strategies_agree():
    """single vs twophase under the varpro kernel: the refit restarts from
    the same deterministic in-body basin selection, so a longer budget
    extends the shorter trajectory exactly and the merge is bit-exact."""
    sig, _, _, _ = _synthetic(1024, seed=5)
    kw = dict(model="gaussian_rician", guess=GUESS, phase1_iters=10,
              max_iters=40, ftol=1e-2, gtol=1e-2, varpro3=True)
    r_s = fit_fused(sig, TES, LO, HI, strategy="single", **kw)
    r_t = fit_fused(sig, TES, LO, HI, strategy="twophase", tail_frac=1.0, **kw)
    np.testing.assert_array_equal(np.asarray(r_s.x), np.asarray(r_t.x))
    assert int(r_s.n_overflow) == 0 and int(r_t.n_overflow) == 0


def test_resolve_varpro3(monkeypatch):
    from fetal_t2mapping_tpu.models.pallas_fit import _VARPRO3_DEFAULT

    assert resolve_varpro3(None, "gaussian") is False
    assert resolve_varpro3(True, "rician") is False      # no reduction exists
    assert resolve_varpro3(True, "gaussian_rician") is True
    assert resolve_varpro3(False, "gaussian_rician") is False
    assert resolve_varpro3(None, "gaussian_rician") is bool(_VARPRO3_DEFAULT)
    monkeypatch.setenv("FT2_FIT3_VARPRO", "0")
    assert resolve_varpro3(None, "gaussian_rician") is False
    monkeypatch.setenv("FT2_FIT3_VARPRO", "1")
    assert resolve_varpro3(None, "gaussian_rician") is True
    # strategy: the varpro kernel early-exits like the gaussian body
    assert resolve_strategy("auto", 10, 60, "gaussian_rician",
                            varpro3=True) == "single"
    assert resolve_strategy("twophase", 10, 60, "gaussian_rician",
                            varpro3=True) == "twophase"
