"""Batched multi-pair registration (register_rigid_multi / affine_multi).

The reference runs its per-session registrations as SEQUENTIAL external
processes (cor->ax and sag->ax per echo, utils/qmri_utils.py:91; echo ->
first-echo :378-383); here P solves against one fixed image advance in
lock-step inside one jitted multi-level Adam program. These tests pin:

- per-pair transform recovery (each pair converges to ITS OWN truth);
- agreement with the single-pair engine at the recovered-transform level
  (bitwise parity is not expected — vmapped reductions reorder float
  sums and hundreds of Adam steps amplify that — so parity is asserted
  where it is meaningful: the warp);
- the zero-padding path for differently-shaped movings;
- fixed_mask and init_params plumbing;
- validation errors.
"""

import numpy as np
import pytest

from fetal_t2mapping_tpu.core.volume import Volume
from fetal_t2mapping_tpu.recon.registration import (
    register_affine_multi,
    register_rigid,
    register_rigid_multi,
)
from fetal_t2mapping_tpu.recon.resample import resample_to_reference

from test_recon import FAST_REG, _blob_volume, _rigid_world_matrix


def _make_pair(fixed, rx, ry, rz, t):
    center = np.asarray(fixed.center_world())
    T_true = _rigid_world_matrix(rx, ry, rz, t, center)
    moving = resample_to_reference(fixed, fixed, transform=T_true)
    return T_true, moving


def _assert_recovers(fixed, T_true, reg, *, rot_atol=0.03, trans_atol=1.2):
    center = np.asarray(fixed.center_world())
    comp = T_true @ reg.matrix
    np.testing.assert_allclose(comp[:3, :3], np.eye(3), atol=rot_atol)
    assert np.abs(comp[:3, 3] - center + comp[:3, :3] @ center).max() < trans_atol


class TestRigidMulti:
    def test_each_pair_recovers_its_own_transform(self):
        fixed = _blob_volume(seed=3)
        T1, mov1 = _make_pair(fixed, 0.05, -0.04, 0.06, [3.0, -2.0, 2.5])
        T2, mov2 = _make_pair(fixed, -0.06, 0.03, -0.02, [-2.5, 3.0, -1.5])
        T3, mov3 = _make_pair(fixed, 0.0, 0.0, 0.0, [4.0, 0.0, -3.0])
        regs = register_rigid_multi(fixed, [mov1, mov2, mov3], **FAST_REG)
        assert len(regs) == 3
        for T_true, reg in zip((T1, T2, T3), regs):
            _assert_recovers(fixed, T_true, reg)

    def test_matches_single_pair_engine(self):
        """Multi and single solve the same problem to the same pose; assert
        agreement where it matters (the warped image), not bitwise params."""
        fixed = _blob_volume(seed=5)
        T_true, moving = _make_pair(fixed, 0.04, 0.02, -0.05, [2.0, 2.0, -2.0])
        single = register_rigid(fixed, moving, **FAST_REG)
        (multi,) = register_rigid_multi(fixed, [moving], **FAST_REG)
        w_s = resample_to_reference(moving, fixed, transform=single.matrix)
        w_m = resample_to_reference(moving, fixed, transform=multi.matrix)
        inner = np.s_[4:-4, 4:-4, 4:-4]
        # both engines land on the same optimum: warped images agree far
        # more tightly than either matches the fixed image
        diff = np.abs(w_s.data[inner] - w_m.data[inner]).max()
        scale = float(np.abs(fixed.data).max())
        assert diff < 0.05 * scale, f"warp disagreement {diff} vs scale {scale}"
        _assert_recovers(fixed, T_true, multi)

    def test_padding_path_differently_shaped_movings(self):
        """Movings of different shapes stack via zero-padding with true
        extents in the in-bounds test — each still recovers its truth."""
        fixed = _blob_volume(seed=7)
        T1, mov1 = _make_pair(fixed, 0.03, -0.02, 0.04, [2.0, -1.5, 1.0])
        # crop the second moving to a smaller grid (content preserved)
        T2, mov2_full = _make_pair(fixed, -0.04, 0.03, -0.03, [-2.0, 2.0, -1.0])
        mov2 = Volume(np.asarray(mov2_full.data)[:20, :22, :24],
                      spacing=mov2_full.spacing, origin=mov2_full.origin,
                      direction=mov2_full.direction)
        regs = register_rigid_multi(fixed, [mov1, mov2], **FAST_REG)
        _assert_recovers(fixed, T1, regs[0])
        _assert_recovers(fixed, T2, regs[1], rot_atol=0.05, trans_atol=1.5)

    def test_init_params_warm_start(self):
        fixed = _blob_volume(seed=9)
        T1, mov1 = _make_pair(fixed, 0.05, 0.0, 0.0, [3.0, 0.0, 0.0])
        T2, mov2 = _make_pair(fixed, 0.0, 0.04, 0.0, [0.0, -3.0, 0.0])
        full = register_rigid_multi(fixed, [mov1, mov2], **FAST_REG)
        init = np.stack([r.params for r in full])
        warm = register_rigid_multi(fixed, [mov1, mov2],
                                    init_params=init,
                                    levels=(1,), sigmas=(0.0,), iters=(10,),
                                    lr=0.05)
        for T_true, reg in zip((T1, T2), warm):
            _assert_recovers(fixed, T_true, reg)

    def test_metric_history_per_pair(self):
        fixed = _blob_volume(seed=11)
        _, mov1 = _make_pair(fixed, 0.04, 0.0, 0.0, [2.0, 0.0, 0.0])
        _, mov2 = _make_pair(fixed, 0.0, 0.0, 0.05, [0.0, 2.0, 0.0])
        regs = register_rigid_multi(fixed, [mov1, mov2], **FAST_REG)
        for reg in regs:
            h = reg.metric_history
            assert h.shape == (sum(FAST_REG["iters"]),)
            # NCC metric descends from start to (mean of last 5) per pair
            assert np.mean(h[-5:]) < h[0]

    def test_fixed_mask_plumbs_through(self):
        fixed = _blob_volume(seed=13)
        T1, mov1 = _make_pair(fixed, 0.03, 0.0, -0.03, [2.0, -2.0, 0.0])
        mask = np.asarray(fixed.data) > 0.05 * float(np.asarray(fixed.data).max())
        (reg,) = register_rigid_multi(fixed, [mov1], fixed_mask=mask,
                                      **FAST_REG)
        _assert_recovers(fixed, T1, reg)

    def test_empty_movings_returns_empty(self):
        fixed = _blob_volume(seed=1)
        assert register_rigid_multi(fixed, []) == []

    def test_bad_init_params_shape_raises(self):
        fixed = _blob_volume(seed=1)
        _, mov = _make_pair(fixed, 0.0, 0.0, 0.0, [1.0, 0.0, 0.0])
        with pytest.raises(ValueError, match="init_params"):
            register_rigid_multi(fixed, [mov], init_params=np.zeros(6),
                                 **FAST_REG)

    def test_level_config_mismatch_raises(self):
        fixed = _blob_volume(seed=1)
        _, mov = _make_pair(fixed, 0.0, 0.0, 0.0, [1.0, 0.0, 0.0])
        with pytest.raises(ValueError, match="levels/sigmas/iters"):
            register_rigid_multi(fixed, [mov], levels=(2, 1),
                                 sigmas=(1.0,), iters=(10, 10))


class TestAffineMulti:
    def test_recovers_scale_and_translation(self):
        fixed = _blob_volume(seed=21)
        center = np.asarray(fixed.center_world())
        T_true = np.eye(4)
        T_true[:3, :3] = np.diag([1.06, 0.95, 1.03])
        T_true[:3, 3] = center - T_true[:3, :3] @ center + [2.0, -1.5, 1.0]
        moving = resample_to_reference(fixed, fixed, transform=T_true)
        (reg,) = register_affine_multi(fixed, [moving],
                                       levels=(2, 1), sigmas=(1.0, 0.0),
                                       iters=(150, 80), lr=0.01)
        comp = T_true @ reg.matrix
        np.testing.assert_allclose(comp[:3, :3], np.eye(3), atol=0.04)


class TestReviewRegressions:
    def test_mi_window_from_unpadded_movings(self):
        """The MI intensity window must come from each UNPADDED moving: a
        zero-padded stack would clamp lo to 0 for a moving whose true
        minimum is positive and redistribute its Parzen bins."""
        import jax.numpy as jnp
        from fetal_t2mapping_tpu.recon.registration import (
            _device_pyramid, _stacked_moving_operands)

        rng = np.random.default_rng(0)
        a = Volume(rng.uniform(50.0, 90.0, (16, 16, 16)).astype(np.float32),
                   spacing=(1, 1, 1))
        b = Volume(rng.uniform(20.0, 40.0, (12, 13, 14)).astype(np.float32),
                   spacing=(1, 1, 1))
        movs = [a.with_data(jnp.asarray(a.data)),
                b.with_data(jnp.asarray(b.data))]
        pyrs = [_device_pyramid(m, (1,), (0.0,)) for m in movs]
        md, mi, mo, dims, los, rngs = _stacked_moving_operands(movs, pyrs, 0)
        assert md.shape[0] == 2 and md.shape[1:] == (16, 16, 16)
        # b was padded with zeros, yet its window reflects the true data
        np.testing.assert_allclose(float(los[1]),
                                   float(np.min(np.asarray(b.data))), rtol=1e-6)
        np.testing.assert_allclose(
            float(rngs[1]),
            float(np.max(np.asarray(b.data)) - np.min(np.asarray(b.data))),
            rtol=1e-6)

    def test_mi_multi_recovers_differently_shaped_positive_offset(self):
        fixed = _blob_volume(seed=31)
        base = np.asarray(fixed.data)
        fixed = Volume(base - base.min() + 25.0, spacing=fixed.spacing,
                       origin=fixed.origin, direction=fixed.direction)
        T1, mov1 = _make_pair(fixed, 0.04, 0.0, -0.03, [2.0, -1.5, 0.0])
        T2, mov2_full = _make_pair(fixed, -0.03, 0.03, 0.02, [-1.5, 1.5, -1.0])
        mov2 = Volume(np.asarray(mov2_full.data)[:20, :22, :24],
                      spacing=mov2_full.spacing, origin=mov2_full.origin,
                      direction=mov2_full.direction)
        regs = register_rigid_multi(fixed, [mov1, mov2], metric="mi",
                                    levels=(2, 1), sigmas=(1.0, 0.0),
                                    iters=(120, 60), lr=0.05)
        # loose tolerances: 32-bin Parzen MI on a 32^3 blob scene ranks
        # poses only to ~a voxel; this test pins CONVERGENCE (not sub-voxel
        # accuracy) for differently-shaped positive-offset movings
        _assert_recovers(fixed, T1, regs[0], rot_atol=0.08, trans_atol=2.5)
        _assert_recovers(fixed, T2, regs[1], rot_atol=0.08, trans_atol=2.5)

    def test_host_only_registration_result_contract(self):
        """RegistrationResult built from host fields alone (the original
        dataclass shape) keeps working: params defaults to an empty vector
        instead of crashing on the missing device solve."""
        from fetal_t2mapping_tpu.recon.registration import RegistrationResult

        T = np.eye(4)
        r = RegistrationResult(matrix=T, final_metric=-0.5,
                               metric_history=np.array([-0.1, -0.5]))
        np.testing.assert_array_equal(r.matrix, T)
        assert r.final_metric == -0.5
        assert r.params.shape == (0,)
        assert np.asarray(r.params_device).shape == (0,)
        np.testing.assert_allclose(np.asarray(r.matrix_device), T)


class TestEarlyExit:
    """Plateau early exit (stop_tol/stop_window): measured 99.9% of a
    192^3 solve's descent lands by ~1/3-2/3 of the default budgets, so the
    optimizer stops once a level's trailing window stops descending."""

    def test_stops_early_and_recovers(self):
        fixed = _blob_volume(seed=41)
        T, mov = _make_pair(fixed, 0.04, -0.03, 0.02, [2.0, -2.0, 1.5])
        reg = register_rigid(fixed, mov, **FAST_REG)
        assert reg.iters_run is not None
        budgets = np.asarray(FAST_REG["iters"])
        assert (reg.iters_run <= budgets).all()
        assert reg.iters_run.sum() < budgets.sum()   # actually exited early
        _assert_recovers(fixed, T, reg)

    def test_stop_tol_none_restores_fixed_budget(self):
        fixed = _blob_volume(seed=41)
        _, mov = _make_pair(fixed, 0.03, 0.0, 0.0, [1.5, 0.0, 0.0])
        reg = register_rigid(fixed, mov, stop_tol=None, **FAST_REG)
        assert reg.iters_run is None
        assert reg.metric_history.shape == (sum(FAST_REG["iters"]),)

    def test_warm_start_never_degrades(self):
        """Starting AT the optimum, Adam's normalized steps wander (the
        update is O(lr) even for vanishing gradients); the early-exit
        path returns the BEST iterate, so a warm restart cannot end with
        a worse metric than it started with."""
        fixed = _blob_volume(seed=43)
        T, mov = _make_pair(fixed, 0.05, 0.02, -0.03, [2.5, -1.0, 2.0])
        reg = register_rigid(fixed, mov, **FAST_REG)
        warm = register_rigid(fixed, mov, init_params=reg.params,
                              **dict(FAST_REG, iters=(6, 4)))
        assert warm.final_metric <= reg.final_metric + 1e-4
        _assert_recovers(fixed, T, warm)

    def test_multi_early_exit_per_pair_recovery(self):
        fixed = _blob_volume(seed=45)
        T1, mov1 = _make_pair(fixed, 0.05, -0.04, 0.06, [3.0, -2.0, 2.5])
        T2, mov2 = _make_pair(fixed, -0.06, 0.03, -0.02, [-2.5, 3.0, -1.5])
        regs = register_rigid_multi(fixed, [mov1, mov2], **FAST_REG)
        assert regs[0].iters_run is not None
        assert (regs[0].iters_run <= np.asarray(FAST_REG["iters"])).all()
        for T, reg in zip((T1, T2), regs):
            _assert_recovers(fixed, T, reg)
