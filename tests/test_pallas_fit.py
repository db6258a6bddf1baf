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


def test_fused_six_echoes():
    # the BASELINE north-star protocol is 5-8 TEs; exercise T=6 end to end
    tes6 = (50.0, 114.0, 160.0, 202.0, 250.0, 299.0)
    rng = np.random.default_rng(5)
    te = np.asarray(tes6, np.float32)
    k = rng.uniform(600.0, 5000.0, 300).astype(np.float32)
    t2 = rng.uniform(40.0, 500.0, 300).astype(np.float32)
    sig = (k[:, None] * np.exp(-te[None, :] / t2[:, None])).astype(np.float32)
    r = fit_fused(sig, tes6, LO, HI, phase1_iters=10, max_iters=30)
    x = np.asarray(r.x)
    np.testing.assert_allclose(x[:, 1], t2, rtol=2e-3)
    assert np.asarray(r.converged).all()


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
    with pytest.raises(ValueError):
        fit_fused(sig, TES, (0.0, 10.0), (1e6, 2000.0), model="laplacian")
    with pytest.raises(ValueError):
        # bound arity must match the model's parameter count
        fit_fused(sig, TES, (0.0, 10.0), (1e6, 2000.0), model="rician")


def test_fused_gaussian_rician_matches_multistart():
    from fetal_t2mapping_tpu.models.init import grid_init
    from fetal_t2mapping_tpu.models.solver import fit_batch_multistart

    rng = np.random.default_rng(11)
    n = 256
    te = np.asarray(TES, np.float32)
    k = rng.uniform(600.0, 3000.0, n).astype(np.float32)
    t2 = rng.uniform(40.0, 400.0, n).astype(np.float32)
    sg_true = 30.0
    a = k[:, None] * np.exp(-te[None, :] / t2[:, None])
    sig = np.sqrt(a * a + sg_true ** 2).astype(np.float32)

    lo = (0.0, 10.0, 1.0)
    hi = (1e5, 2000.0, 500.0)
    guess = (800.0, 110.0, 40.0)
    r_f = fit_fused(sig, TES, lo, hi, model="gaussian_rician", guess=guess,
                    phase1_iters=20, max_iters=40, varpro3=False)

    te_j = jnp.asarray(te)
    x0_ll = loglinear_init(sig, te_j, lo, hi)
    x0_gr = np.asarray(grid_init(sig, te_j, lo, hi))
    x0_cfg = np.clip(np.tile(np.asarray(guess, np.float32), (n, 1)), lo, hi)
    x0s = np.stack([np.asarray(x0_ll), x0_gr, x0_cfg])
    r_j = fit_batch_multistart(sig, te_j, x0s, lo, hi,
                               model="gaussian_rician", max_iters=40)

    xf, xj = np.asarray(r_f.x), np.asarray(r_j.x)
    ok = np.asarray(r_f.converged) & np.asarray(r_j.converged)
    assert ok.mean() > 0.9
    # noiseless gaussian_rician: T2 recoverable to fp32-fit tolerance
    rel_t2 = np.abs(xf[ok, 1] - t2[ok]) / t2[ok]
    assert np.median(rel_t2) < 1e-2
    rel_vs_jax = np.abs(xf[ok, 1] - xj[ok, 1]) / np.maximum(xj[ok, 1], 1e-6)
    assert np.median(rel_vs_jax) < 1e-2


def test_fused_rician_matches_scipy_oracle():
    """Parity of the fused Rician-ML kernel with scipy L-BFGS-B on the SAME
    negative log-likelihood (the reference's solver, run_t2mapping.py:157-177).

    Truth-recovery is NOT asserted tightly: at low SNR the per-voxel ML
    estimator is itself biased (both solvers show it identically). What the
    kernel owes is (a) per-voxel agreement with scipy where both converge to
    the same basin and (b) an equal-or-lower objective elsewhere (the
    in-kernel multistart should never lose to a single-start L-BFGS-B)."""
    from fetal_t2mapping_tpu.config import FitConfig
    from fetal_t2mapping_tpu.models import fgh
    from fetal_t2mapping_tpu.models.oracle import fit_batch_scipy

    rng = np.random.default_rng(4)
    n = 96
    tes5 = (50.0, 114.0, 202.0, 299.0, 400.0)
    te = np.asarray(tes5, np.float32)
    k_true, t2_true, sg_true = 200.0, 90.0, 25.0
    a = k_true * np.exp(-te[None, :] / t2_true)
    noise = rng.normal(0, sg_true, (n, len(tes5), 2))
    # magnitude of (true + complex gaussian noise): Rician by construction
    sig = np.sqrt((a + noise[..., 0]) ** 2 + noise[..., 1] ** 2).astype(np.float32)

    lo = (1.0, 10.0, 1.0)
    hi = (1e4, 2000.0, 500.0)
    guess = (100.0, 100.0, 20.0)
    r = fit_fused(sig, tes5, lo, hi, model="rician", guess=guess,
                  phase1_iters=20, max_iters=40)
    x = np.asarray(r.x)
    cfg = FitConfig(model="rician", initial_guess=guess, lower=lo, upper=hi)
    xs = fit_batch_scipy(sig.astype(np.float64), te.astype(np.float64), cfg)

    rel = np.abs(x[:, 1] - xs[:, 1]) / np.maximum(xs[:, 1], 1e-6)
    assert np.median(rel) < 1e-3, np.median(rel)

    s_list = [jnp.asarray(sig[:, i]) for i in range(len(tes5))]
    f_fused = np.asarray(fgh.rician_value(
        tuple(jnp.asarray(c) for c in (x[:, 0], x[:, 1], x[:, 2])), s_list, tes5))
    f_scipy = np.asarray(fgh.rician_value(
        tuple(jnp.asarray(xs[:, i].astype(np.float32)) for i in range(3)),
        s_list, tes5))
    # multistart should win or tie on the vast majority of voxels
    assert np.mean(f_fused <= f_scipy + 1e-3) > 0.8


def test_fused_no_prior_bounds():
    # no_prior: per-voxel k lower bound = signal at min TE, k<=10000, T2 in
    # (10, 2000) — reference run_t2mapping.py:243-245
    sig, k, t2 = _synthetic(256, noise=0.0, seed=9)
    r = fit_fused(sig, TES, (0.0, 10.0), (10000.0, 2000.0), no_prior=True)
    x = np.asarray(r.x)
    assert np.all(x[:, 0] >= sig[:, 0] - 1e-3)      # per-voxel bound honoured
    assert np.all(x[:, 0] <= 10000.0 + 1e-3)
    ok = k < 9000  # voxels whose true k fits inside the no-prior box
    np.testing.assert_allclose(x[ok, 1], t2[ok], rtol=5e-3)
    with pytest.raises(ValueError):
        fit_fused(sig, TES, (0.0, 10.0, 1.0), (1e4, 2000.0, 500.0),
                  model="rician", no_prior=True)


def test_fused_sharded_multichip_cpu_mesh():
    import jax

    from fetal_t2mapping_tpu.parallel.mesh import (
        fit_fused_sharded, pad_to_devices, voxel_mesh,
    )

    if len(jax.devices()) < 2:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = voxel_mesh()
    n = pad_to_devices(1000, mesh)
    sig, k, t2 = _synthetic(n, noise=0.0, seed=2)
    r = fit_fused_sharded(sig, TES, LO, HI, mesh, phase1_iters=10, max_iters=30)
    x = np.asarray(r.x)
    assert x.shape == (n, 2)
    np.testing.assert_allclose(x[:, 1], t2, rtol=5e-3)
    # parity with the single-device path
    r1 = fit_fused(sig, TES, LO, HI, phase1_iters=10, max_iters=30)
    np.testing.assert_allclose(x, np.asarray(r1.x), rtol=1e-5, atol=1e-3)


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


def test_tail_escalation_covers_overflow():
    # VERDICT r1 weak #4: voxels beyond the phase-2 buffer silently kept
    # phase-1 results. phase1_iters=0 leaves ALL voxels unconverged; a tiny
    # tail buffer (128 of 512) must escalate across rounds and report any
    # remainder in n_overflow instead of dropping it.
    sig, k, t2 = _synthetic(512, noise=0.0)
    tail_frac = 128 / 1024  # n pads to 1024 tile rows -> capacity 128

    r1 = fit_fused(sig, TES, LO, HI, phase1_iters=0, max_iters=40,
                   tail_frac=tail_frac, tail_rounds=1, strategy="twophase")
    assert int(r1.n_overflow) == 512 - 128
    assert int(np.asarray(r1.converged).sum()) == 128

    r4 = fit_fused(sig, TES, LO, HI, phase1_iters=0, max_iters=40,
                   tail_frac=tail_frac, tail_rounds=4, strategy="twophase")
    assert int(r4.n_overflow) == 0
    assert np.asarray(r4.converged).all()
    rel = np.abs(np.asarray(r4.x)[:, 1] - t2) / t2
    assert rel.max() < 1e-3

    # escalated == single big-buffer fit, voxel for voxel
    r_ref = fit_fused(sig, TES, LO, HI, phase1_iters=0, max_iters=40,
                      tail_frac=1.0, tail_rounds=1, strategy="twophase")
    np.testing.assert_allclose(np.asarray(r4.x), np.asarray(r_ref.x),
                               rtol=1e-6, atol=1e-6)


def test_fused_default_has_zero_overflow():
    sig, _, _ = _synthetic(2048, noise=4.0, seed=3)
    r = fit_fused(sig, TES, LO, HI)
    assert int(r.n_overflow) == 0


def test_fused_strategies_bit_identical():
    # 'single' (one full-budget kernel, per-block early exit) and 'twophase'
    # (compaction + refit) must agree voxel for voxel: same start, same
    # Newton recurrence, same per-voxel budget
    sig, _, _ = _synthetic(2048, noise=6.0, seed=7)
    r_s = fit_fused(sig, TES, LO, HI, phase1_iters=10, max_iters=40,
                    strategy="single")
    r_t = fit_fused(sig, TES, LO, HI, phase1_iters=10, max_iters=40,
                    strategy="twophase", tail_frac=1.0)
    np.testing.assert_array_equal(np.asarray(r_s.x), np.asarray(r_t.x))
    np.testing.assert_array_equal(np.asarray(r_s.converged),
                                  np.asarray(r_t.converged))
    np.testing.assert_array_equal(np.asarray(r_s.n_iter), np.asarray(r_t.n_iter))
    assert int(r_s.n_overflow) == 0

    # auto resolution: reference budgets -> single; huge straggler budget
    # -> twophase
    from fetal_t2mapping_tpu.models.pallas_fit import resolve_strategy

    assert resolve_strategy("auto", 10, 60) == "single"
    assert resolve_strategy("auto", 10, 300) == "twophase"
    assert resolve_strategy("single", 10, 300) == "single"
    # 3-param kernels (folded 3-start multistart, ~3x body) cross over much
    # earlier: production budgets stay twophase WITHOUT prefix pruning
    assert resolve_strategy("auto", 10, 60, "rician") == "twophase"
    assert resolve_strategy("auto", 10, 30, "gaussian_rician") == "single"
    # with prefix pruning active, rician's continuation early-exits well
    # and single wins (measured); gaussian_rician keeps its straggler tail
    # and stays twophase
    assert resolve_strategy("auto", 10, 60, "rician", prefix3=4) == "single"
    assert resolve_strategy("auto", 10, 60, "gaussian_rician",
                            prefix3=4) == "twophase"


def _synthetic3(n, sg_true=8.0, seed=9):
    """Rician-magnitude synthetic batch over the bench's truth ranges."""
    rng = np.random.default_rng(seed)
    te = np.asarray(TES, np.float32)
    k = rng.uniform(600.0, 5000.0, n).astype(np.float32)
    t2 = rng.uniform(20.0, 500.0, n).astype(np.float32)
    a = k[:, None] * np.exp(-te[None, :] / t2[:, None])
    nz = rng.normal(0, sg_true, (n, len(TES), 2))
    sig = np.sqrt((a + nz[..., 0]) ** 2 + nz[..., 1] ** 2).astype(np.float32)
    ident = k * np.exp(-te[-1] / t2) >= 3 * sg_true
    return sig, k, t2, ident


LO3 = (1.0, 10.0, 1.0)
HI3 = (1e6, 2000.0, 1000.0)
GUESS3 = (650.0, 110.0, 40.0)


@pytest.mark.parametrize("model", ["gaussian_rician", "rician"])
def test_prefix_pruned_matches_full_multistart(model):
    """The prefix-pruned multistart (all 3 starts x prefix iters, then the
    per-voxel winner alone) must match the full multistart on every
    IDENTIFIABLE voxel: objective never meaningfully above the full-
    multistart minimum, convergence not lower. Non-identifiable noise-ridge
    voxels (last-echo truth under 3 sigma) may legitimately land in a
    different equal-objective basin and are excluded, exactly as the bench
    accuracy gate does (reference prints per-voxel FAIL on these,
    run_t2mapping.py:301)."""
    from fetal_t2mapping_tpu.models.oracle import _objective

    sig, k, t2, ident = _synthetic3(1536)
    kw = dict(model=model, guess=GUESS3, phase1_iters=10, max_iters=60,
              ftol=1e-2, gtol=1e-2, varpro3=False)
    r_full = fit_fused(sig, TES, LO3, HI3, prefix3=0, **kw)
    r_pr = fit_fused(sig, TES, LO3, HI3, prefix3=4, **kw)

    f_full = np.asarray(r_full.fun)[ident]
    f_pr = np.asarray(r_pr.fun)[ident]
    gap = (f_pr - f_full) / np.maximum(np.abs(f_full), 1.0)
    assert gap.max() < 3e-2, gap.max()
    assert (np.asarray(r_pr.converged).mean()
            >= np.asarray(r_full.converged).mean() - 1e-3)
    # the reported objective must be the true objective of the reported
    # params (the continuation kernel's f stays in sync with its x).
    # Tolerance is fp32-NLL evaluation noise, NOT solver slack: the
    # unpruned kernel shows the same ~2e-3 rel drift vs an fp64
    # recomputation (same band the Mosaic parity gate allows 3-param
    # objectives).
    objf = _objective(model)
    te64 = np.asarray(TES, np.float64)
    x_pr = np.asarray(r_pr.x)
    sub = np.flatnonzero(ident)[:64]
    f_chk = np.array([objf(x_pr[i].astype(np.float64), te64,
                           sig[i].astype(np.float64)) for i in sub])
    np.testing.assert_allclose(np.asarray(r_pr.fun)[sub], f_chk,
                               rtol=1e-2, atol=5e-5)


def test_prefix_pruned_strategies_bit_identical():
    """With pruning, 'single' (prefix + one full-budget continuation) and
    'twophase' (prefix + short continuation, then compaction refit of the
    stragglers) must agree voxel for voxel: the continuation while_loop is
    deterministic given (x0, budget), so the refit's prefix+continuation
    extends phase 1's trajectory exactly — the contract the compaction
    merge relies on. Requires prefix3 < phase1_iters (else phase 1 runs
    unpruned and the two paths legitimately differ)."""
    sig, _, _, _ = _synthetic3(1024, seed=12)
    kw = dict(model="gaussian_rician", guess=GUESS3, phase1_iters=10,
              max_iters=40, ftol=1e-2, gtol=1e-2, prefix3=4, varpro3=False)
    r_s = fit_fused(sig, TES, LO3, HI3, strategy="single", **kw)
    r_t = fit_fused(sig, TES, LO3, HI3, strategy="twophase", tail_frac=1.0,
                    **kw)
    np.testing.assert_array_equal(np.asarray(r_s.x), np.asarray(r_t.x))
    np.testing.assert_array_equal(np.asarray(r_s.converged),
                                  np.asarray(r_t.converged))
    assert int(r_s.n_overflow) == 0 and int(r_t.n_overflow) == 0


def test_resolve_prefix3(monkeypatch):
    from fetal_t2mapping_tpu.models.pallas_fit import (_PREFIX3_DEFAULT,
                                                       resolve_prefix3)

    assert resolve_prefix3(None, 60) == _PREFIX3_DEFAULT
    assert resolve_prefix3(6, 60) == 6
    assert resolve_prefix3(0, 60) == 0          # explicit opt-out
    assert resolve_prefix3(-3, 60) == 0
    assert resolve_prefix3(60, 60) == 0         # >= budget: nothing to prune
    assert resolve_prefix3(None, 4) == 0        # default >= tiny budget
    monkeypatch.setenv("FT2_FIT3_PREFIX", "9")
    assert resolve_prefix3(None, 60) == 9       # env override
    assert resolve_prefix3(2, 60) == 2          # explicit beats env


def test_stall_floor_parity_with_tight_floor():
    """The default slow-progress floor (stall_tol = max(ftol, 1e-3)) must
    not move answers: it only retires noise-ridge crawlers whose accepted
    Newton steps improve f by < 0.1% relative, three in a row. Identifiable
    voxels accelerate through that band (Newton's rel_red grows every step
    near the basin), so a run under the old 1e-6 floor and a run under the
    1e-3 default must agree to fp32 noise — and both must converge
    everywhere that matters."""
    from fetal_t2mapping_tpu.models.pallas_fit import (
        _from_tiles, _gauss_fit_tiles, _to_tiles)

    sig, k, t2 = _synthetic(4096, noise=8.0, seed=3)
    te = np.asarray(TES, np.float32)
    ident = k * np.exp(-te[-1] / t2) >= 3 * 8.0
    tiles, n_pad = _to_tiles(jnp.asarray(sig), sig.shape[0])
    kw = dict(te=TES, lo=LO, hi=HI, ftol=1e-9, max_iters=60, interpret=True)
    p_def, s_def = _gauss_fit_tiles(tiles, **kw)               # floor 1e-3
    p_ref, s_ref = _gauss_fit_tiles(tiles, stall_tol=1e-6, **kw)
    x_def = np.asarray(_from_tiles(p_def, sig.shape[0]))
    x_ref = np.asarray(_from_tiles(p_ref, sig.shape[0]))
    conv_def = np.asarray(_from_tiles(s_def, sig.shape[0]))[:, 1] > 0.5
    conv_ref = np.asarray(_from_tiles(s_ref, sig.shape[0]))[:, 1] > 0.5
    # every identifiable voxel converges under both floors
    assert conv_def[ident].all() and conv_ref[ident].all()
    rel = np.abs(x_def[ident, 1] - x_ref[ident, 1]) / x_ref[ident, 1]
    assert rel.max() < 2e-3, rel.max()


def test_interp_start_clips_out_of_box_sigma_to_bound():
    """Regression (round-4 bench oracle gate): a voxel whose exact
    gaussian_rician interpolant wants sigma ABOVE the box (sg* = 1087 vs
    hi 1000) used to be discarded as 'invalid', falling back to the
    protocol guess and landing in a basin 20x worse than scipy's
    (L-BFGS-B rides sigma to the bound, objective 4.8 vs 105). The
    interpolation start must clip into the box, so the Newton run starts
    ON the constrained optimum's active bound."""
    from fetal_t2mapping_tpu.models.oracle import _objective

    sig = np.array([[3582.7908, 2918.0173, 2364.2817]], np.float32)
    lo3, hi3 = (1.0, 10.0, 1.0), (1e6, 2000.0, 1000.0)
    sigb = np.tile(sig, (256, 1)).astype(np.float32)
    r = fit_fused(sigb, TES, lo3, hi3, model="gaussian_rician",
                  phase1_iters=10, max_iters=60, guess=(650.0, 110.0, 40.0),
                  ftol=1e-2, gtol=1e-2, interpret=True)
    x = np.asarray(r.x[0], np.float64)
    f = _objective("gaussian_rician")(x, np.asarray(TES, np.float64),
                                      sig[0].astype(np.float64))
    # scipy L-BFGS-B from the protocol guess reaches 4.774 at
    # x = (4606.5, 390.1, 1000); the kernel must match it
    assert x[2] == hi3[2], x
    assert f < 4.8, (x, f)
    assert abs(x[1] - 390.07) / 390.07 < 1e-2, x
