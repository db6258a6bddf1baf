"""Closed-form log-linear initializer for the voxel fit.

log S = log k - TE/T2 is linear in (log k, 1/T2); a weighted least-squares
line fit (weights S^2, the Gauss-Markov approximation of the nonlinear LS
problem) gives an excellent starting iterate in one fused pass — this is why
the TPU solver needs only a handful of Newton steps where the reference's
L-BFGS-B starts from one fixed guess per protocol (run_t2mapping.py:38-106).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def loglinear_init(signal, te, lo, hi, sigma0=None):
    """Initial parameter batch from a weighted log-linear fit.

    Args:
        signal: (N, T) float32 voxel signals.
        te: (T,) echo times (ms).
        lo, hi: (N, P) or (P,) parameter bounds; P = 2 or 3.
        sigma0: optional scalar/array initial sigma for 3-param models;
            defaults to the RMS residual of the log-linear prediction.

    Returns:
        x0: (N, P) initial parameters, clipped inside [lo, hi].
    """
    signal = jnp.asarray(signal)
    te = jnp.asarray(te, dtype=signal.dtype)
    s = jnp.maximum(signal, 1e-6)
    w = jnp.square(s)
    y = jnp.log(s)

    sw = jnp.sum(w, axis=1)
    st = jnp.sum(w * te, axis=1)
    stt = jnp.sum(w * te * te, axis=1)
    sy = jnp.sum(w * y, axis=1)
    sty = jnp.sum(w * te * y, axis=1)

    det = sw * stt - st * st
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    b = (sw * sty - st * sy) / det          # slope = -1/T2
    a = (sy - b * st) / sw                  # intercept = log k

    t2 = jnp.where(b < -1e-12, -1.0 / b, 2000.0)
    k = jnp.exp(jnp.clip(a, -30.0, 30.0))

    lo = jnp.asarray(lo, signal.dtype)
    lo = jnp.broadcast_to(lo, (signal.shape[0], lo.shape[-1]))
    hi = jnp.broadcast_to(jnp.asarray(hi, signal.dtype), lo.shape)
    n_params = lo.shape[-1]

    cols = [k, t2]
    if n_params == 3:
        if sigma0 is None:
            pred = k[:, None] * jnp.exp(-te[None, :] / t2[:, None])
            sigma0 = jnp.sqrt(jnp.mean(jnp.square(signal - pred), axis=1) + 1e-12)
        cols.append(jnp.broadcast_to(jnp.asarray(sigma0, signal.dtype), k.shape))
    x0 = jnp.stack(cols, axis=-1)
    return jnp.clip(x0, lo, hi)


def grid_init(signal, te, lo, hi, n_grid: int = 16):
    """Coarse T2 grid-scan initializer (basin selection for non-convex fits).

    For each of ``n_grid`` log-spaced T2 candidates inside the bounds, the
    optimal k has the closed form k* = <s, e>/<e, e> with e = exp(-te/T2);
    the candidate with the lowest SSE wins. Fully vectorized (N, G, T) —
    a few extra fused elementwise passes, no iteration. For 3-param models
    sigma starts at the winning candidate's RMS residual.

    Returns x0 (N, P) clipped into [lo, hi].
    """
    signal = jnp.asarray(signal)
    te = jnp.asarray(te, signal.dtype)
    lo = jnp.asarray(lo, signal.dtype)
    lo = jnp.broadcast_to(lo, (signal.shape[0], lo.shape[-1]))
    hi = jnp.broadcast_to(jnp.asarray(hi, signal.dtype), lo.shape)
    n_params = lo.shape[-1]

    t2_lo = jnp.maximum(lo[:, 1], 1.0)
    t2_hi = jnp.maximum(hi[:, 1], t2_lo + 1.0)
    frac = jnp.linspace(0.02, 0.98, n_grid, dtype=signal.dtype)
    t2_grid = jnp.exp(jnp.log(t2_lo)[:, None] + frac[None, :]
                      * (jnp.log(t2_hi) - jnp.log(t2_lo))[:, None])  # (N, G)

    e = jnp.exp(-te[None, None, :] / t2_grid[:, :, None])            # (N, G, T)
    se = jnp.sum(signal[:, None, :] * e, axis=-1)
    ee = jnp.sum(e * e, axis=-1)
    k_grid = jnp.clip(se / jnp.maximum(ee, 1e-30), lo[:, 0:1], hi[:, 0:1])
    resid = signal[:, None, :] - k_grid[:, :, None] * e
    sse = jnp.mean(jnp.square(resid), axis=-1)                        # (N, G)
    best = jnp.argmin(sse, axis=1)
    rows = jnp.arange(signal.shape[0])
    k = k_grid[rows, best]
    t2 = t2_grid[rows, best]
    cols = [k, t2]
    if n_params == 3:
        cols.append(jnp.sqrt(sse[rows, best] + 1e-12))
    return jnp.clip(jnp.stack(cols, axis=-1), lo, hi)
