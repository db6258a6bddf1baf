"""T2-relaxometry signal models and fit objectives (JAX).

Three noise models, numerically identical to the reference's
(run_t2mapping.py:129-177) but expressed as pure JAX functions so the solver
can take analytic gradients/Hessians by autodiff instead of the reference's
finite-difference L-BFGS-B (`jac=False`).

- gaussian:         S(TE) = k * exp(-TE/T2);            mean-SSE objective
- gaussian_rician:  S(TE) = sqrt(k^2 exp(-2TE/T2) + sigma^2); mean-SSE
                    (Gudbjartsson & Patz 1995 first-moment approximation)
- rician:           negative Rician log-likelihood with exp-scaled Bessel I0
                    (Hajj et al. 2020). The reference evaluates
                    -(s^2+m^2)/(2 sg^2) + |x| + log(i0e(x)) as separate terms
                    (run_t2mapping.py:168-172); we apply the exact identity
                    -(s^2+m^2)/(2 sg^2) + |x| = -(|s|-|m|)^2/(2 sg^2), which
                    is fp32-stable at large x where the reference's order
                    cancels ~1e10-magnitude terms (see models.fgh docstring).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import i0e

MODEL_NAMES = ("gaussian", "gaussian_rician", "rician")

_LOG_EPS = 1e-20  # guards log() against exact-zero signal in padded voxels


def gauss_model(te, k, t2):
    """Mono-exponential decay k*exp(-te/t2)."""
    return k * jnp.exp(-te / t2)


def gauss_rician_model(te, k, t2, sigma):
    """First-moment Rician-bias-corrected decay sqrt(k^2 e^{-2te/t2} + sigma^2)."""
    return jnp.sqrt(jnp.square(gauss_model(te, k, t2)) + jnp.square(sigma))


def predict_signal(model: str, params, te):
    """Predicted signal for a parameter vector; used for residual maps."""
    if model == "gaussian":
        return gauss_model(te, params[0], params[1])
    return gauss_rician_model(te, params[0], params[1], params[2])


def _gauss_obj(params, te, signal):
    r = signal - gauss_model(te, params[0], params[1])
    return jnp.mean(jnp.square(r))


def _gauss_rician_obj(params, te, signal):
    r = signal - gauss_rician_model(te, params[0], params[1], params[2])
    return jnp.mean(jnp.square(r))


def _rician_obj(params, te, signal):
    k, t2, sigma = params[0], params[1], params[2]
    m = gauss_model(te, k, t2)
    s2 = jnp.square(sigma)
    x = m * signal / s2
    d_sm = jnp.abs(signal) - jnp.abs(m)   # stable identity; see module doc
    ll = jnp.sum(
        jnp.log(jnp.maximum(signal, _LOG_EPS))
        - jnp.log(s2)
        - jnp.square(d_sm) / (2.0 * s2)
        + jnp.log(i0e(x))
    )
    return -ll


_OBJECTIVES = {
    "gaussian": _gauss_obj,
    "gaussian_rician": _gauss_rician_obj,
    "rician": _rician_obj,
}


def make_objective(model: str):
    """Return f(params (P,), te (T,), signal (T,)) -> scalar objective."""
    try:
        return _OBJECTIVES[model]
    except KeyError:
        raise ValueError(f"unknown model {model!r}; expected one of {MODEL_NAMES}")


def _gauss_fgh(params, te, signal):
    """Hand-fused (f, grad, Hessian) of the gaussian objective.

    One pass over the TE axis with a single exp evaluation — the autodiff
    jax.hessian path re-evaluates the primal in each of its forward-over-
    reverse sweeps (~4-6x the transcendental count), and this function is
    the per-iteration cost of the headline 256^3 benchmark. Full Newton
    (second-order residual terms included), algebraically identical to
    jax.hessian(_gauss_obj).
    """
    k, t2 = params[0], params[1]
    inv_t = 1.0 / jnp.size(signal)
    e = jnp.exp(-te / t2)
    a = k * e                      # model
    r = signal - a                 # residual
    u = te / (t2 * t2)             # d(-te/t2)/dt2
    ae_u = a * u                   # dm/dt2 = k e u

    f = jnp.sum(r * r) * inv_t
    g_k = -2.0 * inv_t * jnp.sum(r * e)
    g_t = -2.0 * inv_t * jnp.sum(r * ae_u)
    # Hessian: 2/T * sum(dm_x dm_y - r * d2m_xy)
    h_kk = 2.0 * inv_t * jnp.sum(e * e)
    h_kt = 2.0 * inv_t * jnp.sum(e * u * (a - r))          # d2m/dkdt2 = e u
    d2m_tt = ae_u * u - 2.0 * a * u / t2                   # k e (u^2 - 2u/t2)
    h_tt = 2.0 * inv_t * jnp.sum(ae_u * ae_u - r * d2m_tt)
    g = jnp.stack([g_k, g_t])
    H = jnp.stack([jnp.stack([h_kk, h_kt]), jnp.stack([h_kt, h_tt])])
    return f, g, H


def make_value_grad_hess(model: str):
    """Fused per-voxel (f, g, H) evaluator; hand-derived where it pays."""
    import jax

    if model == "gaussian":
        return _gauss_fgh
    obj = _OBJECTIVES[model]
    grad = jax.grad(obj)
    hess = jax.hessian(obj)

    def fgh(params, te, signal):
        return obj(params, te, signal), grad(params, te, signal), hess(params, te, signal)

    return fgh
