"""Hand-fused (f, g, H) must match autodiff of the same objective."""

import jax
import numpy as np

from fetal_t2mapping_tpu.models.signal import make_objective, make_value_grad_hess


def test_gauss_fgh_matches_autodiff():
    rng = np.random.default_rng(0)
    te = np.array([60.0, 114.0, 202.0, 299.0], np.float32)
    obj = make_objective("gaussian")
    fgh = make_value_grad_hess("gaussian")
    grad = jax.grad(obj)
    hess = jax.hessian(obj)
    for _ in range(20):
        k = rng.uniform(100, 5000)
        t2 = rng.uniform(15, 800)
        s = (k * np.exp(-te / t2) + rng.normal(0, 10, te.shape)).astype(np.float32)
        p = np.array([k * rng.uniform(0.5, 1.5), t2 * rng.uniform(0.5, 1.5)], np.float32)
        f, g, H = fgh(p, te, s)
        np.testing.assert_allclose(f, obj(p, te, s), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g), np.asarray(grad(p, te, s)), rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(H), np.asarray(hess(p, te, s)), rtol=2e-3, atol=1e-4)


def test_three_param_fgh_consistent():
    te = np.array([60.0, 114.0, 202.0, 299.0], np.float32)
    s = np.array([500.0, 350.0, 180.0, 100.0], np.float32)
    for model in ("gaussian_rician", "rician"):
        obj = make_objective(model)
        fgh = make_value_grad_hess(model)
        p = np.array([600.0, 120.0, 30.0], np.float32)
        f, g, H = fgh(p, te, s)
        np.testing.assert_allclose(f, obj(p, te, s), rtol=1e-6)
        assert np.asarray(g).shape == (3,)
        assert np.asarray(H).shape == (3, 3)
        np.testing.assert_allclose(np.asarray(H), np.asarray(H).T, rtol=1e-4)
