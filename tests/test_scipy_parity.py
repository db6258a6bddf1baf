"""Large per-voxel parity sweeps vs the scipy oracles (BASELINE.md evidence).

The BASELINE.md accuracy claim is "< 1e-3 max relative T2 error vs scipy
curve_fit". The bench gates that on a 256-voxel subsample; this file is the
bulk evidence: a 10^4-voxel per-voxel sweep for the gaussian model against
``curve_fit``, and objective-parity sweeps against the L-BFGS-B oracle
(reference run_t2mapping.py:120-312 semantics) for the 3-parameter models.

Identifiability: voxels whose noiseless signal at the last TE is below
3 sigma of the noise are fitting pure noise — the SSE argmin is a
degenerate (k, T2) ridge where two correct optimizers land on different
parameters of equal objective. Those voxels are gated on OBJECTIVE parity
(never meaningfully worse than scipy), not parameter agreement; the
reference itself prints per-voxel FAIL there (run_t2mapping.py:301-303).
"""

import numpy as np
import pytest

from fetal_t2mapping_tpu.config import FitConfig
from fetal_t2mapping_tpu.models.oracle import fit_batch_scipy, curve_fit_t2
from fetal_t2mapping_tpu.models.pallas_fit import fit_fused

TES = (114.0, 202.0, 299.0)
NOISE = 8.0


def _synthetic(n, seed=0, noise=NOISE):
    rng = np.random.default_rng(seed)
    te = np.asarray(TES, np.float32)
    k = rng.uniform(600.0, 5000.0, n).astype(np.float32)
    t2 = rng.uniform(20.0, 500.0, n).astype(np.float32)
    sig = (k[:, None] * np.exp(-te[None, :] / t2[:, None])).astype(np.float32)
    sig = np.maximum(sig + rng.normal(0, noise, sig.shape).astype(np.float32), 1e-2)
    ident = k * np.exp(-te[-1] / t2) >= 3 * noise
    return sig, k, t2, ident


def _sse(x, sig):
    te = np.asarray(TES, np.float32)
    pred = x[:, :1] * np.exp(-te[None, :] / x[:, 1:2])
    return np.mean((sig - pred) ** 2, axis=1)


def test_gaussian_parity_10k_vs_curvefit():
    n = 10_000
    sig, k, t2, ident = _synthetic(n)
    res = fit_fused(sig, TES, (0.0, 10.0), (1e6, 2000.0))
    x = np.asarray(res.x)
    ref = curve_fit_t2(sig, np.asarray(TES, np.float32),
                       lo=(0.0, 10.0), hi=(1e6, 2000.0))

    # identifiable voxels: per-voxel parameter parity at the headline bound
    rel = np.abs(x[ident, 1] - ref[ident, 1]) / np.maximum(ref[ident, 1], 1e-9)
    assert ident.sum() > 8_000
    assert rel.max() < 1e-3, rel.max()
    assert np.asarray(res.converged)[ident].all()

    # noise-floor voxels: objective parity — we may land elsewhere on the
    # ridge but never meaningfully above scipy's SSE (5% of sigma^2)
    sse_ours = _sse(x, sig)
    sse_ref = _sse(ref, sig)
    worst = np.max((sse_ours - sse_ref)[~ident]) if (~ident).any() else 0.0
    assert worst <= 0.05 * NOISE ** 2, worst


@pytest.mark.parametrize("model", ["gaussian_rician", "rician"])
def test_3param_objective_parity_vs_lbfgsb(model):
    # the 3-param objectives are non-convex with a flat sigma ridge at 3 TEs:
    # parameter-space agreement with a quasi-Newton path is not a meaningful
    # target (reference runs these at ftol 1e-2); the principled bound is
    # that our minimum is never worse than scipy's beyond tolerance, and T2
    # stays truth-accurate in the median. Objectives are compared in f64
    # through the numpy oracle: at sigma near its lower bound the Rician NLL
    # sums ~1e6-scale terms, where fp32 evaluation quantizes to O(1)
    from fetal_t2mapping_tpu.models.oracle import _objective

    n = 2_048
    sig, k, t2, ident = _synthetic(n, seed=model == "rician")
    lo = (1.0, 10.0, 1.0)
    hi = (1e6, 2000.0, 1000.0)
    guess = (650.0, 110.0, 40.0)
    res = fit_fused(sig, TES, lo, hi, model=model, guess=guess,
                    phase1_iters=12, max_iters=60)
    cfg = FitConfig(model=model, initial_guess=guess, lower=lo, upper=hi)
    ref = fit_batch_scipy(sig, np.asarray(TES, np.float32), cfg)

    obj = _objective(model)
    te64 = np.asarray(TES, np.float64)
    f_ours = np.asarray([obj(np.asarray(p, np.float64), te64, s.astype(np.float64))
                         for p, s in zip(np.asarray(res.x), sig)])
    f_ref = np.asarray([obj(np.asarray(p, np.float64), te64, s.astype(np.float64))
                        for p, s in zip(ref, sig)])

    # objective parity, split by identifiability (like the gaussian sweep
    # above): EVERY identifiable voxel must be no worse than scipy within
    # tolerance — that is the class where "the minimum" is well defined.
    # Noise-floor ridge voxels may land at marginally different points of a
    # flat valley (an fp32 Newton vs an f64 quasi-Newton; the reference
    # prints per-voxel FAIL on these, run_t2mapping.py:301): they get a
    # population bound and a worst-gap band instead of a per-voxel gate.
    tol = 1e-3 * np.maximum(np.abs(f_ref), 1.0)
    no_worse = f_ours <= f_ref + tol
    assert no_worse[ident].all(), (
        f"{(~no_worse & ident).sum()} identifiable voxels above scipy")
    assert no_worse.mean() >= 0.97, no_worse.mean()
    ridge_gap = ((f_ours - f_ref) / np.maximum(np.abs(f_ref), 1.0))[~ident]
    assert ridge_gap.max() < 0.15 if ridge_gap.size else True, ridge_gap.max()

    med_rel = np.median(np.abs(np.asarray(res.x)[ident, 1] - t2[ident]) / t2[ident])
    assert med_rel < 5e-2, med_rel
