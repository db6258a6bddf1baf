"""Solver tests: TPU batched fit vs scipy oracles (curve_fit / L-BFGS-B)."""

import numpy as np
import pytest

from fetal_t2mapping_tpu.config import fit_config
from fetal_t2mapping_tpu.core.stack import EchoStack
from fetal_t2mapping_tpu.core.volume import Volume
from fetal_t2mapping_tpu.models import (
    fit_batch,
    fit_batch_multistart,
    fit_batch_traced,
    fit_stack,
    grid_init,
    loglinear_init,
    make_objective,
)
from fetal_t2mapping_tpu.models.oracle import curve_fit_t2, fit_batch_scipy

TES = np.array([114.0, 202.0, 299.0], np.float32)
TES6 = np.array([60.0, 114.0, 160.0, 202.0, 250.0, 299.0], np.float32)


def _gauss_signals(rng, n, te, k_range=(600.0, 5000.0), t2_range=(20.0, 500.0), noise=0.0):
    k = rng.uniform(*k_range, size=n).astype(np.float32)
    t2 = rng.uniform(*t2_range, size=n).astype(np.float32)
    s = k[:, None] * np.exp(-te[None, :] / t2[:, None])
    if noise > 0:
        s = s + rng.normal(0, noise, s.shape)
    return np.maximum(s, 1e-3).astype(np.float32), k, t2


def _rician_signals(rng, n, te, sigma, k_range=(600.0, 880.0), t2_range=(30.0, 500.0)):
    k = rng.uniform(*k_range, size=n).astype(np.float32)
    t2 = rng.uniform(*t2_range, size=n).astype(np.float32)
    m = k[:, None] * np.exp(-te[None, :] / t2[:, None])
    s = np.abs(m + rng.normal(0, sigma, m.shape) + 1j * rng.normal(0, sigma, m.shape))
    return s.astype(np.float32), k, t2


class TestLogLinearInit:
    def test_exact_on_clean_data(self):
        rng = np.random.default_rng(0)
        s, k, t2 = _gauss_signals(rng, 64, TES6)
        x0 = np.asarray(loglinear_init(s, TES6, (0.0, 1.0), (1e6, 5000.0)))
        np.testing.assert_allclose(x0[:, 0], k, rtol=1e-3)
        np.testing.assert_allclose(x0[:, 1], t2, rtol=1e-3)

    def test_sigma_column_and_clipping(self):
        rng = np.random.default_rng(1)
        s, _, _ = _gauss_signals(rng, 16, TES, noise=20.0)
        lo = (550.0, 10.0, 2.0)
        hi = (10000.0, 600.0, 1000.0)
        x0 = np.asarray(loglinear_init(s, TES, lo, hi))
        assert x0.shape == (16, 3)
        assert (x0 >= np.asarray(lo) - 1e-6).all() and (x0 <= np.asarray(hi) + 1e-6).all()


class TestGaussianFit:
    def test_noiseless_recovery(self):
        rng = np.random.default_rng(2)
        s, k, t2 = _gauss_signals(rng, 512, TES)
        lo, hi = (0.0, 10.0), (1e6, 2000.0)
        x0 = loglinear_init(s, TES, lo, hi)
        res = fit_batch(s, TES, x0, lo, hi, model="gaussian")
        x = np.asarray(res.x)
        np.testing.assert_allclose(x[:, 1], t2, rtol=5e-4)
        np.testing.assert_allclose(x[:, 0], k, rtol=1e-3)
        assert np.asarray(res.converged).all()

    def test_noisy_vs_curve_fit(self):
        """BASELINE accuracy target: <1e-3 max relative T2 error vs curve_fit."""
        rng = np.random.default_rng(3)
        s, _, _ = _gauss_signals(rng, 256, TES6, noise=25.0)
        lo, hi = (0.0, 1.0), (1e6, 5000.0)
        x0 = loglinear_init(s, TES6, lo, hi)
        res = fit_batch(s, TES6, x0, lo, hi, model="gaussian", max_iters=100)
        ours = np.asarray(res.x)
        ref = curve_fit_t2(s, TES6, lo=lo, hi=hi)
        interior = (ref[:, 1] > 2.0) & (ref[:, 1] < 4999.0)
        rel = np.abs(ours[interior, 1] - ref[interior, 1]) / ref[interior, 1]
        assert rel.max() < 1e-3, f"max rel T2 err {rel.max():.2e}"

    def test_bound_pinning_matches_lbfgsb(self):
        """Voxels whose optimum is outside the box must pin like L-BFGS-B."""
        rng = np.random.default_rng(4)
        cfg = fit_config("gaussian", low_field=True)  # k in [600, 10000]
        # true k below the lower bound -> fit should pin k at 600
        s, _, _ = _gauss_signals(rng, 32, TES, k_range=(350.0, 500.0), noise=5.0)
        lo = np.asarray(cfg.lower, np.float32)
        hi = np.asarray(cfg.upper, np.float32)
        x0 = loglinear_init(s, TES, lo, hi)
        res = fit_batch(s, TES, x0, lo, hi, model="gaussian", max_iters=100)
        ref = fit_batch_scipy(s, TES, cfg, tight=True)
        ours = np.asarray(res.x)
        obj = make_objective("gaussian")
        for i in range(len(s)):
            f_ours = float(obj(ours[i], TES, s[i]))
            f_ref = float(obj(ref[i].astype(np.float32), TES, s[i]))
            assert f_ours <= f_ref * (1 + 1e-4) + 1e-6
        np.testing.assert_allclose(ours[:, 0], ref[:, 0], rtol=1e-3)
        np.testing.assert_allclose(ours[:, 1], ref[:, 1], rtol=2e-3)


class TestThreeParamFits:
    @pytest.mark.parametrize("model", ["gaussian_rician", "rician"])
    def test_vs_scipy_tight(self, model):
        rng = np.random.default_rng(5)
        sigma = 30.0
        s, _, _ = _rician_signals(rng, 24, TES6, sigma)
        cfg = fit_config(model, low_field=True)
        lo = np.asarray(cfg.lower, np.float32)
        hi = np.asarray(cfg.upper, np.float32)
        x0 = np.asarray(loglinear_init(s, TES6, lo, hi))
        x0_grid = np.asarray(grid_init(s, TES6, lo, hi))
        x0_cfg = np.clip(np.tile(np.asarray(cfg.initial_guess, np.float32), (len(s), 1)), lo, hi)
        res = fit_batch_multistart(s, TES6, np.stack([x0, x0_grid, x0_cfg]), lo, hi,
                                   model=model, max_iters=150)
        ours = np.asarray(res.x)
        ref = fit_batch_scipy(s, TES6, cfg, tight=True)
        obj = make_objective(model)
        # we must find minima at least as good as scipy's (same or better basin)
        for i in range(len(s)):
            f_ours = float(obj(ours[i], TES6, s[i]))
            f_ref = float(obj(ref[i].astype(np.float32), TES6, s[i]))
            assert f_ours <= f_ref + 1e-3 * max(abs(f_ref), 1.0), (
                f"voxel {i}: ours {f_ours} vs scipy {f_ref} at {ours[i]} vs {ref[i]}")

    def test_rician_t2_accuracy(self):
        """Rician NLL fit should de-bias T2 on noisy magnitude data."""
        rng = np.random.default_rng(6)
        sigma = 25.0
        s, k, t2 = _rician_signals(rng, 512, TES6, sigma)
        lo = (500.0, 10.0, 2.0)
        hi = (1000.0, 600.0, 1000.0)
        x0 = np.asarray(loglinear_init(s, TES6, lo, hi))
        x0_grid = np.asarray(grid_init(s, TES6, lo, hi))
        x0_cfg = np.clip(np.tile(np.asarray([650.0, 110.0, 40.0], np.float32), (len(s), 1)),
                         np.asarray(lo, np.float32), np.asarray(hi, np.float32))
        res = fit_batch_multistart(s, TES6, np.stack([x0, x0_grid, x0_cfg]), lo, hi,
                                   model="rician", max_iters=150)
        x = np.asarray(res.x)
        # median relative T2 error should be small and less biased than gaussian
        rel_ric = np.median(np.abs(x[:, 1] - t2) / t2)
        res_g = fit_batch(s, TES6, x0[:, :2], lo[:2], hi[:2], model="gaussian", max_iters=100)
        xg = np.asarray(res_g.x)
        rel_gau = np.median(np.abs(xg[:, 1] - t2) / t2)
        assert rel_ric < rel_gau
        # scipy L-BFGS-B (tight) reaches ~8.7% median on this data; beat it
        assert rel_ric < 0.085


class TestTracedFit:
    def test_traced_matches_untraced(self):
        rng = np.random.default_rng(7)
        s, _, _ = _gauss_signals(rng, 32, TES, noise=10.0)
        lo, hi = (0.0, 10.0), (1e6, 2000.0)
        x0 = loglinear_init(s, TES, lo, hi)
        r1 = fit_batch(s, TES, x0, lo, hi, model="gaussian")
        r2, traces = fit_batch_traced(s, TES, x0, lo, hi, model="gaussian")
        np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), rtol=1e-6)
        assert traces["f_val"].shape == (60, 32)
        assert traces["step_size"].shape == (60, 32)
        # objective is non-increasing along the trace
        f = np.asarray(traces["f_val"])
        assert (np.diff(f, axis=0) <= 1e-5).all()


class TestFitStack:
    def _make_stack(self, rng, shape=(8, 9, 10), tes=TES, noise=0.0):
        geom = Volume(np.zeros(shape, np.float32), spacing=(1, 1, 1), origin=(3, 2, 1))
        k_vol = rng.uniform(700, 3000, shape).astype(np.float32)
        t2_vol = rng.uniform(40, 400, shape).astype(np.float32)
        mask = np.zeros(shape, np.uint8)
        mask[2:6, 2:7, 2:8] = 1
        recons, masks = [], []
        for te in tes:
            sig = k_vol * np.exp(-te / t2_vol)
            if noise:
                sig = np.maximum(sig + rng.normal(0, noise, shape), 1e-2)
            recons.append(geom.with_data(sig.astype(np.float32)))
            masks.append(geom.with_data(mask))
        return EchoStack.from_volumes(recons, masks, list(tes)), k_vol, t2_vol, mask

    def test_end_to_end_gaussian(self):
        rng = np.random.default_rng(8)
        stack, k_vol, t2_vol, mask = self._make_stack(rng)
        cfg = fit_config("gaussian", low_field=True, prior=False)
        out = fit_stack(stack, cfg, trace_samples=10)
        m = mask.astype(bool)
        np.testing.assert_allclose(out.t2.data[m], t2_vol[m], rtol=1e-3)
        np.testing.assert_allclose(out.k.data[m], k_vol[m], rtol=1e-3)
        assert (out.t2.data[~m] == 0).all()
        assert out.t2.same_geometry(stack.geometry)
        assert out.converged.data[m].all()
        # noiseless: residuals ~ 0
        assert np.abs(out.res.data[m]).max() < 0.5
        assert out.traces["f_val"].shape[1] == 10
        assert out.n_voxels == int(mask.sum())

    def test_no_prior_bound_rule(self):
        """k lower bound = signal at shortest TE per voxel."""
        rng = np.random.default_rng(9)
        stack, _, _, mask = self._make_stack(rng)
        cfg = fit_config("gaussian", low_field=True, prior=False)
        out = fit_stack(stack, cfg)
        m = mask.astype(bool)
        s_min_te = stack.signal[..., 0]
        assert (out.k.data[m] >= s_min_te[m] * (1 - 1e-5)).all()

    def test_norm_mode(self):
        rng = np.random.default_rng(10)
        stack, _, t2_vol, mask = self._make_stack(rng)
        cfg = fit_config(
            "gaussian", low_field=True, prior=False, norm=False).__class__(
            model="gaussian", initial_guess=(1.0, 165.0), lower=(0.01, 10.0),
            upper=(100.0, 2000.0), norm=True, prior=True)
        out = fit_stack(stack, cfg)
        m = mask.astype(bool)
        # T2 is scale-invariant: normalized fit still recovers it
        np.testing.assert_allclose(out.t2.data[m], t2_vol[m], rtol=1e-3)
