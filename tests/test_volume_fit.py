"""Fully on-device masked volume fit (models.volume_fit)."""

import numpy as np
import pytest

from fetal_t2mapping_tpu.models import fit_volume

TES = (114.0, 202.0, 299.0)
LO = (0.0, 10.0)
HI = (1e6, 2000.0)


def _volume(nz=16, seed=0):
    rng = np.random.default_rng(seed)
    t2 = rng.uniform(60.0, 400.0, (nz, nz, nz)).astype(np.float32)
    k = rng.uniform(600.0, 3000.0, (nz, nz, nz)).astype(np.float32)
    te = np.asarray(TES, np.float32)
    sig = k[..., None] * np.exp(-te / t2[..., None])
    mask = np.zeros((nz, nz, nz), bool)
    mask[2:14, 2:14, 2:14] = True
    return sig.astype(np.float32), mask, t2, k


def test_fit_volume_masked_recovery():
    sig, mask, t2, k = _volume()
    # 12^3 cube mask touches 72 32-voxel blocks (2304 voxels of block
    # capacity) in the 16^3 grid -> mask_frac 0.6 covers it
    res = fit_volume(sig, mask, TES, LO, HI, max_iters=30, mask_frac=0.6)
    t2map = np.asarray(res.t2)
    assert t2map.shape == mask.shape
    np.testing.assert_allclose(t2map[mask], t2[mask], rtol=5e-3)
    np.testing.assert_allclose(np.asarray(res.k)[mask], k[mask], rtol=5e-3)
    # outside the mask: untouched zeros, not fitted
    assert np.all(t2map[~mask] == 0.0)
    assert np.all(~np.asarray(res.converged)[~mask])
    assert np.asarray(res.converged)[mask].mean() > 0.99
    assert int(res.n_masked) == int(mask.sum())
    assert int(res.n_overflow) == 0


def test_fit_volume_overflow_reported():
    sig, mask, _, _ = _volume()
    mask[:] = True  # 100% masked against a 10% capacity
    with pytest.warns(UserWarning, match="left unfitted"):
        res = fit_volume(sig, mask, TES, LO, HI, max_iters=12, mask_frac=0.1)
    assert int(res.n_overflow) > 0
    assert int(res.n_masked) == mask.size
    # capacity + overflow account for every masked voxel
    fitted = np.asarray(res.converged) | (np.asarray(res.n_iter) > 0)
    assert fitted.sum() + int(res.n_overflow) >= mask.size * 0.95
    assert fitted.sum() <= 0.11 * mask.size + 128 * 3


def test_fit_volume_block_matches_voxel_exact():
    """block=32 (block compaction) and block=1 (voxel-exact) agree on every
    masked voxel, including with a grid not divisible by the block."""
    sig, mask, t2, _ = _volume(nz=15, seed=3)   # 3375 voxels: not 32-aligned
    res_b = fit_volume(sig, mask, TES, LO, HI, max_iters=30, mask_frac=1.0,
                       block=32, compact=True)
    res_v = fit_volume(sig, mask, TES, LO, HI, max_iters=30, mask_frac=1.0,
                       block=1, compact=True)
    assert int(res_b.n_overflow) == 0 and int(res_v.n_overflow) == 0
    np.testing.assert_allclose(np.asarray(res_b.t2)[mask],
                               np.asarray(res_v.t2)[mask], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(res_b.t2)[~mask], 0.0)
    np.testing.assert_array_equal(np.asarray(res_v.t2)[~mask], 0.0)
    np.testing.assert_allclose(np.asarray(res_b.t2)[mask], t2[mask],
                               rtol=5e-3)


def test_block_filler_converges_within_phase1_for_3param():
    """The filler signal volume_fit feeds unmasked voxels of kept blocks
    (an exact decay at the initial guess) must converge inside the phase-1
    budget for the 3-param models — otherwise fillers would consume the
    twophase straggler-refit capacity that real masked voxels need."""
    from fetal_t2mapping_tpu.models.pallas_fit import (fit_fused,
                                                       validate_fused_args)

    te = TES
    lo, hi = (0.0, 10.0, 1.0), (900.0, 600.0, 100.0)
    _, lo_t, hi_t, guess = validate_fused_args("gaussian_rician", te, lo, hi,
                                               None, False)
    filler = guess[0] * np.exp(-np.asarray(te, np.float32) /
                               max(guess[1], 1e-3))
    sig = np.tile(filler, (256, 1)).astype(np.float32)
    res = fit_fused(sig, te, lo_t, hi_t, model="gaussian_rician",
                    phase1_iters=10, max_iters=60)
    assert np.asarray(res.converged).all()
    assert int(np.asarray(res.n_iter).max()) <= 10


def test_fit_volume_3param_partial_blocks():
    """gaussian_rician through the block path: partially-masked blocks mix
    real voxels with fillers, and every masked voxel must still converge
    (the twophase refit capacity is reserved for real stragglers)."""
    rng = np.random.default_rng(7)
    nz = 12
    t2 = rng.uniform(60.0, 350.0, (nz, nz, nz)).astype(np.float32)
    k = rng.uniform(200.0, 800.0, (nz, nz, nz)).astype(np.float32)
    te = np.asarray(TES, np.float32)
    sig = k[..., None] * np.exp(-te / t2[..., None])
    sig = np.maximum(sig + rng.normal(0, 2.0, sig.shape), 1e-2
                     ).astype(np.float32)
    mask = rng.random((nz, nz, nz)) < 0.5          # scattered: no full block
    res = fit_volume(sig, mask, TES, (0.0, 10.0, 0.1), (2000.0, 600.0, 50.0),
                     model="gaussian_rician", max_iters=40, mask_frac=1.0,
                     compact=True)
    assert int(res.n_overflow) == 0
    conv = np.asarray(res.converged)
    assert conv[mask].mean() > 0.98
    rel = np.abs(np.asarray(res.t2)[mask] - t2[mask]) / t2[mask]
    assert np.median(rel) < 5e-2
    assert np.all(np.asarray(res.sigma)[~mask] == 0.0)


def test_fit_volume_matches_fit_stack_path():
    """Cross-engine consistency: the serving path (block compaction + fused
    Pallas kernel, interpret mode on CPU) and the file-pipeline path
    (host gather + vmapped projected-Newton solver) agree voxelwise on the
    same data — two independent implementations of the same optimum."""
    from fetal_t2mapping_tpu.config import FitConfig
    from fetal_t2mapping_tpu.core.stack import EchoStack
    from fetal_t2mapping_tpu.core.volume import Volume
    from fetal_t2mapping_tpu.models.t2map import fit_stack

    sig, mask, t2, _ = _volume(nz=12, seed=9)
    res_v = fit_volume(sig, mask, TES, LO, HI, max_iters=40, mask_frac=1.0)

    st = EchoStack(sig, mask, np.asarray(TES, np.float32),
                   Volume(sig[..., 0]))
    cfg = FitConfig(model="gaussian", initial_guess=(1000.0, 100.0),
                    lower=LO, upper=HI, max_iters=40)
    out = fit_stack(st, cfg)
    t2_stack = np.asarray(out.t2.data)
    np.testing.assert_allclose(np.asarray(res_v.t2)[mask], t2_stack[mask],
                               rtol=1e-3)


def test_fit_volume_validates_shapes():
    sig, mask, _, _ = _volume()
    with pytest.raises(ValueError, match=r"\(Z, Y, X, T\)"):
        fit_volume(sig[..., 0], mask, TES, LO, HI)
    with pytest.raises(ValueError, match="mask"):
        fit_volume(sig, mask[2:], TES, LO, HI)


def test_fit_volume_dense_matches_compact():
    """The dense path (compact=False: fit every voxel, filler outside the
    mask, no partition/gather/scatter) must produce IDENTICAL per-voxel
    results to the compacted path — each voxel's Newton sequence depends
    only on its own signal, block early exit only reschedules."""
    sig, mask, t2, _ = _volume(nz=15, seed=9)
    res_c = fit_volume(sig, mask, TES, LO, HI, max_iters=30, mask_frac=1.0,
                       compact=True)
    res_d = fit_volume(sig, mask, TES, LO, HI, max_iters=30, compact=False)
    assert int(res_c.n_overflow) == 0 and int(res_d.n_overflow) == 0
    assert int(res_c.n_masked) == int(res_d.n_masked)
    np.testing.assert_array_equal(np.asarray(res_c.t2), np.asarray(res_d.t2))
    np.testing.assert_array_equal(np.asarray(res_c.k), np.asarray(res_d.k))
    np.testing.assert_array_equal(np.asarray(res_c.converged),
                                  np.asarray(res_d.converged))
    np.testing.assert_array_equal(np.asarray(res_c.n_iter),
                                  np.asarray(res_d.n_iter))
    # outside-mask contract holds on the dense path too
    np.testing.assert_array_equal(np.asarray(res_d.t2)[~mask], 0.0)
    assert not np.asarray(res_d.converged)[~mask].any()


def test_resolve_compact_auto():
    from fetal_t2mapping_tpu.models.volume_fit import resolve_compact

    # gaussian crossover ~0.15: small masks compact, big masks go dense
    assert resolve_compact("auto", "gaussian", 0.10) is True
    assert resolve_compact("auto", "gaussian", 0.30) is False
    # 3-param MULTISTART kernels are ~8x heavier per voxel: compaction
    # pays until much larger fractions
    assert resolve_compact("auto", "rician", 0.30) is True
    assert resolve_compact("auto", "rician", 0.60) is False
    # the VARPRO gaussian_rician kernel (the default) is ~2.4x faster per
    # voxel than the multistart one, so its crossover drops to ~0.2
    # (driver-measured at 240^3: dense 90.0 ms < compacted 98.2 ms at
    # mask_frac 0.30)
    assert resolve_compact("auto", "gaussian_rician", 0.30,
                           varpro3=True) is False
    assert resolve_compact("auto", "gaussian_rician", 0.15,
                           varpro3=True) is True
    assert resolve_compact("auto", "gaussian_rician", 0.30,
                           varpro3=False) is True
    # explicit booleans pass through; junk rejected
    assert resolve_compact(True, "gaussian", 0.9) is True
    assert resolve_compact(False, "rician", 0.01) is False
    with pytest.raises(ValueError, match="compact"):
        resolve_compact("always", "gaussian", 0.5)
