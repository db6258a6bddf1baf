"""Batched box-constrained damped-Newton voxel-fit solver (the hot loop).

TPU-native replacement for the reference's per-voxel
``scipy.optimize.minimize(method='L-BFGS-B', jac=False)`` fanned out over a
``multiprocessing.Pool(20)`` (reference run_t2mapping.py:120-312, 442-443).

Design (why this is the TPU shape of the problem):
- Every masked voxel is an independent 2- or 3-parameter smooth minimization.
  Instead of 10^5-10^7 Python/Fortran round-trips with finite-difference
  gradients, all voxels iterate in lock-step: analytic gradient + Hessian by
  autodiff, a projected (active-set) Newton step with Levenberg-Marquardt
  damping, bounds by clipping — ``vmap``-ed over the voxel axis and compiled
  by XLA into fused elementwise kernels plus a closed-form 2x2/3x3 solve
  (no LAPACK, no gathers, pure VPU work).
- Fixed-shape ``lax.while_loop`` with an all-converged early exit: no
  data-dependent Python control flow, no recompiles across masks (callers
  pad to bucket sizes, see core.stack).
- Marquardt scaling (lambda * diag(H)) keeps steps scale-invariant across
  parameters whose magnitudes span 3 orders (k ~ 1e3, T2 ~ 1e2, sigma ~ 1e1).
- Per-voxel convergence mirrors L-BFGS-B's ftol semantics
  ((f_k - f_{k+1}) / max(|f_k|, |f_{k+1}|, 1) <= ftol) plus a
  projected-gradient test; non-converged voxels keep their last iterate —
  exactly the reference's behaviour (run_t2mapping.py:298-312) — but the
  convergence flag is a first-class output map.

Multi-chip: the computation is elementwise over voxels, so sharding the
voxel axis with a ``NamedSharding`` over a mesh lets XLA partition the whole
solve with zero collectives until the final gather (see parallel.mesh).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .signal import make_objective, make_value_grad_hess

_LAM0 = 1e-3
_LAM_UP = 5.0
_LAM_DOWN = 0.2
_LAM_MIN = 1e-12
_LAM_MAX = 1e10
_LAM_STALL = 1e6  # damping this high means no fp32-visible descent remains: stop
_XTOL_REL = 1e-6  # accepted-step size (relative to |x|) that counts as converged


class FitResult(NamedTuple):
    x: jax.Array          # (N, P) final parameters (last iterate if unconverged)
    fun: jax.Array        # (N,) final objective value
    converged: jax.Array  # (N,) bool
    n_iter: jax.Array     # (N,) int32 accepted-step count
    # () int32 — unconverged voxels that never received a phase-2 refit slot
    # (straggler-buffer capacity exhausted after all escalation rounds);
    # None for single-phase paths where every voxel gets the full budget
    n_overflow: "jax.Array | None" = None


def _solve_posdef_small(A, b):
    """Closed-form solve of a (P,P) SPD-ish system, P in {2, 3} (static)."""
    p = A.shape[-1]
    if p == 2:
        a, c = A[0, 0], A[0, 1]
        d = A[1, 1]
        det = a * d - c * A[1, 0]
        det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        x0 = (d * b[0] - c * b[1]) / det
        x1 = (a * b[1] - A[1, 0] * b[0]) / det
        return jnp.stack([x0, x1])
    if p == 3:
        # Cramer via adjugate; damping keeps A well-conditioned.
        a00, a01, a02 = A[0, 0], A[0, 1], A[0, 2]
        a10, a11, a12 = A[1, 0], A[1, 1], A[1, 2]
        a20, a21, a22 = A[2, 0], A[2, 1], A[2, 2]
        c00 = a11 * a22 - a12 * a21
        c01 = a12 * a20 - a10 * a22
        c02 = a10 * a21 - a11 * a20
        det = a00 * c00 + a01 * c01 + a02 * c02
        det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        c10 = a02 * a21 - a01 * a22
        c11 = a00 * a22 - a02 * a20
        c12 = a01 * a20 - a00 * a21
        c20 = a01 * a12 - a02 * a11
        c21 = a02 * a10 - a00 * a12
        c22 = a00 * a11 - a01 * a10
        x0 = (c00 * b[0] + c10 * b[1] + c20 * b[2]) / det
        x1 = (c01 * b[0] + c11 * b[1] + c21 * b[2]) / det
        x2 = (c02 * b[0] + c12 * b[1] + c22 * b[2]) / det
        return jnp.stack([x0, x1, x2])
    raise ValueError(f"unsupported parameter count {p}")


def _make_voxel_step(model: str, ftol: float, gtol: float):
    """Build the per-voxel damped projected-Newton update (to be vmapped)."""
    obj = make_objective(model)
    fgh = make_value_grad_hess(model)

    def step(x, f, lam, converged, n_iter, te, signal, lo, hi):
        _, g, H = fgh(x, te, signal)

        tol_b = 1e-8 * jnp.maximum(hi - lo, 1.0)
        at_lo = x <= lo + tol_b
        at_hi = x >= hi - tol_b
        # KKT-active coordinates: pinned at a bound, gradient pointing outward
        free = ~((at_lo & (g > 0)) | (at_hi & (g < 0)))
        fm = free.astype(x.dtype)

        p_dim = x.shape[0]
        eye = jnp.eye(p_dim, dtype=x.dtype)
        # reduced system: identity rows/cols for pinned coords
        outer = fm[:, None] * fm[None, :]
        Hr = H * outer + eye * (1.0 - fm)
        gr = g * fm

        diag = jnp.abs(jnp.diagonal(Hr))
        Hd = Hr + eye * (lam * jnp.maximum(diag, 1e-12))
        p = -_solve_posdef_small(Hd, gr) * fm
        x_new = jnp.clip(x + p, lo, hi)
        f_new = obj(x_new, te, signal)

        accept = f_new <= f  # non-strict; NaN-safe (NaN <= f is False)
        # L-BFGS-B-style relative reduction test
        rel_red = (f - f_new) / jnp.maximum(jnp.maximum(jnp.abs(f), jnp.abs(f_new)), 1.0)
        conv_f = accept & (rel_red <= ftol) & (lam <= 1.0)
        # Newton's attempted step vanishes only at stationarity or the fp32
        # floor (where accept/reject oscillates and ftol never fires), so a
        # tiny attempted step — accepted or not — counts as converged.
        step_sq = jnp.sum(jnp.square(x_new - x))
        conv_x = step_sq <= jnp.square(_XTOL_REL) * (1.0 + jnp.sum(jnp.square(x)))
        # projected-gradient test (disabled when gtol == 0)
        pg = jnp.where(at_lo, jnp.minimum(g, 0.0), jnp.where(at_hi, jnp.maximum(g, 0.0), g))
        conv_g = (jnp.max(jnp.abs(pg)) <= gtol) if gtol > 0 else jnp.asarray(False)
        conv_stall = lam >= _LAM_STALL
        newly = (conv_f | conv_x | conv_g | conv_stall) & ~converged

        upd = accept & ~converged
        x_out = jnp.where(upd, x_new, x)
        f_out = jnp.where(upd, f_new, f)
        lam_new = jnp.where(accept, lam * _LAM_DOWN, lam * _LAM_UP)
        lam_out = jnp.where(converged, lam, jnp.clip(lam_new, _LAM_MIN, _LAM_MAX))
        n_out = n_iter + upd.astype(jnp.int32)
        step_norm = jnp.where(upd, jnp.linalg.norm(x_new - x), 0.0)
        return x_out, f_out, lam_out, converged | newly, n_out, step_norm

    return step


def _prep(signal, te, x0, lo, hi, dtype):
    signal = jnp.asarray(signal, dtype)
    te = jnp.asarray(te, dtype)
    x0 = jnp.asarray(x0, dtype)
    n, p = x0.shape
    lo = jnp.broadcast_to(jnp.asarray(lo, dtype), (n, p))
    hi = jnp.broadcast_to(jnp.asarray(hi, dtype), (n, p))
    return signal, te, x0, lo, hi


@functools.partial(jax.jit, static_argnames=("model", "max_iters", "ftol", "gtol"))
def fit_batch(signal, te, x0, lo, hi, *, model: str, max_iters: int = 60,
              ftol: float = 1e-9, gtol: float = 0.0) -> FitResult:
    """Fit every voxel in the batch.

    Args:
        signal: (N, T) measured intensities.
        te: (T,) echo times (ms).
        x0: (N, P) initial parameters (see init.loglinear_init).
        lo, hi: (P,) or (N, P) box constraints.
        model: 'gaussian' | 'gaussian_rician' | 'rician'.
        max_iters: iteration cap (while_loop exits early when all converge).
        ftol/gtol: per-voxel stopping tolerances.

    Returns:
        FitResult with last iterates, objective values, convergence flags and
        accepted-iteration counts.
    """
    dtype = jnp.asarray(signal).dtype
    signal, te, x0, lo, hi = _prep(signal, te, x0, lo, hi, dtype)
    obj = make_objective(model)
    f0 = jax.vmap(obj, in_axes=(0, None, 0))(x0, te, signal)
    step = jax.vmap(
        _make_voxel_step(model, ftol, gtol),
        in_axes=(0, 0, 0, 0, 0, None, 0, 0, 0),
    )

    n = x0.shape[0]
    carry0 = (
        x0,
        f0,
        jnp.full((n,), _LAM0, dtype),
        jnp.zeros((n,), bool),
        jnp.zeros((n,), jnp.int32),
        jnp.asarray(0, jnp.int32),
    )

    def cond(c):
        return (c[5] < max_iters) & ~jnp.all(c[3])

    def body(c):
        x, f, lam, conv, nit, it = c
        x, f, lam, conv, nit, _ = step(x, f, lam, conv, nit, te, signal, lo, hi)
        return (x, f, lam, conv, nit, it + 1)

    x, f, _, conv, nit, _ = lax.while_loop(cond, body, carry0)
    return FitResult(x=x, fun=f, converged=conv, n_iter=nit)


def _tail_partition(conv, capacity: int):
    """On-device stable partition: indices of up to ``capacity`` unconverged
    voxels, NO host sync (a host round trip costs more than the whole fit
    on a tunneled chip).

    A stable argsort on the converged flags (False first) replaces the
    earlier cumsum + drop-scatter: TPU scatters serialize over updates
    (measured 84 ms for 16.7M updates vs 36 ms for the full sort).

    Returns (tail_idx (capacity,), n_tail). Slots past n_tail point at
    CONVERGED voxels (harmlessly refit and dropped on merge); callers mask
    with n_tail.
    """
    order = jnp.argsort(conv, stable=True)            # unconverged first
    if capacity > order.shape[0]:                     # tiny batches: cap > N
        order = jnp.pad(order, (0, capacity - order.shape[0]))
    tail_idx = lax.slice(order, (0,), (capacity,)).astype(jnp.int32)
    return tail_idx, jnp.sum((~conv).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=(
    "model", "phase1_iters", "max_iters", "ftol", "gtol", "tail_frac"))
def fit_batch_twophase(signal, te, x0, lo, hi, *, model: str,
                       phase1_iters: int = 12, max_iters: int = 60,
                       ftol: float = 1e-9, gtol: float = 0.0,
                       tail_frac: float = 0.0625) -> FitResult:
    """Two-phase fit: short lock-step pass, then compact the stragglers.

    In one lock-step batch, the slowest ~1% of voxels make ALL voxels pay
    for the full iteration budget (the while_loop exits only when everyone
    converges). Phase 1 runs a short budget over the whole batch — the
    log-linear start converges the vast majority in a handful of Newton
    steps — then the unconverged tail is compacted into a fixed-capacity
    buffer (``tail_frac`` of N) and iterated to the full budget, entirely
    on device inside one jit. Voxels beyond capacity keep phase-1 results.
    """
    dtype = jnp.asarray(signal).dtype
    signal, te, x0, lo, hi = _prep(signal, te, x0, lo, hi, dtype)
    n = x0.shape[0]
    r1 = fit_batch(signal, te, x0, lo, hi, model=model,
                   max_iters=phase1_iters, ftol=ftol, gtol=gtol)

    capacity = min(n, max(128, int(n * tail_frac) // 128 * 128))
    tail_idx, n_tail = _tail_partition(r1.converged, capacity)
    r2 = fit_batch(signal[tail_idx], te, r1.x[tail_idx],
                   lo[tail_idx], hi[tail_idx], model=model,
                   max_iters=max(max_iters - phase1_iters, 0),
                   ftol=ftol, gtol=gtol)

    valid = jnp.arange(capacity) < n_tail
    safe_idx = jnp.where(valid, tail_idx, n)          # n -> dropped by scatter
    x = r1.x.at[safe_idx].set(r2.x, mode="drop")
    fun = r1.fun.at[safe_idx].set(r2.fun, mode="drop")
    conv = r1.converged.at[safe_idx].set(r2.converged, mode="drop")
    nit = r1.n_iter.at[safe_idx].add(r2.n_iter, mode="drop")
    n_overflow = jnp.maximum(n_tail - capacity, 0).astype(jnp.int32)
    return FitResult(x=x, fun=fun, converged=conv, n_iter=nit,
                     n_overflow=n_overflow)


@functools.partial(jax.jit, static_argnames=("model", "max_iters", "ftol", "gtol"))
def fit_batch_multistart(signal, te, x0s, lo, hi, *, model: str, max_iters: int = 60,
                         ftol: float = 1e-9, gtol: float = 0.0) -> FitResult:
    """fit_batch from S starting points per voxel; keep the best minimum.

    The 3-parameter objectives are non-convex: a single start can converge
    to a poorer local minimum (typically a bound corner). Starts are folded
    into the batch axis — one solver run of S*N rows, then a per-voxel argmin
    over the final objective values.

    Args:
        x0s: (S, N, P) starting points.
    """
    x0s = jnp.asarray(x0s)
    s_starts, n, p = x0s.shape
    signal = jnp.asarray(signal)
    lo = jnp.broadcast_to(jnp.asarray(lo, signal.dtype), (n, p))
    hi = jnp.broadcast_to(jnp.asarray(hi, signal.dtype), (n, p))
    rep = lambda a: jnp.tile(a, (s_starts,) + (1,) * (a.ndim - 1))
    res = fit_batch(
        rep(signal), te, x0s.reshape(s_starts * n, p), rep(lo), rep(hi),
        model=model, max_iters=max_iters, ftol=ftol, gtol=gtol,
    )
    f = res.fun.reshape(s_starts, n)
    best = jnp.argmin(f, axis=0)
    pick = lambda a: a.reshape((s_starts, n) + a.shape[1:])[best, jnp.arange(n)]
    return FitResult(x=pick(res.x), fun=pick(res.fun),
                     converged=pick(res.converged), n_iter=pick(res.n_iter))


@functools.partial(jax.jit, static_argnames=("model", "max_iters", "ftol", "gtol"))
def fit_batch_traced(signal, te, x0, lo, hi, *, model: str, max_iters: int = 60,
                     ftol: float = 1e-9, gtol: float = 0.0):
    """Like fit_batch but records per-iteration convergence traces.

    Intended for a small sampled voxel subset (the reference records
    f_val/step_size per iteration via an L-BFGS-B callback,
    run_t2mapping.py:180-234). Runs a fixed-length ``lax.scan``.

    Returns:
        (FitResult, traces) where traces is a dict with
        'f_val' (iters, N), 'step_size' (iters, N), 'active' (iters, N) bool
        (False once the voxel has converged).
    """
    dtype = jnp.asarray(signal).dtype
    signal, te, x0, lo, hi = _prep(signal, te, x0, lo, hi, dtype)
    obj = make_objective(model)
    f0 = jax.vmap(obj, in_axes=(0, None, 0))(x0, te, signal)
    step = jax.vmap(
        _make_voxel_step(model, ftol, gtol),
        in_axes=(0, 0, 0, 0, 0, None, 0, 0, 0),
    )

    n = x0.shape[0]
    carry0 = (
        x0,
        f0,
        jnp.full((n,), _LAM0, dtype),
        jnp.zeros((n,), bool),
        jnp.zeros((n,), jnp.int32),
    )

    def body(c, _):
        x, f, lam, conv, nit = c
        active = ~conv
        x, f, lam, conv, nit, step_norm = step(x, f, lam, conv, nit, te, signal, lo, hi)
        return (x, f, lam, conv, nit), {"f_val": f, "step_size": step_norm, "active": active}

    (x, f, _, conv, nit), traces = lax.scan(body, carry0, None, length=max_iters)
    return FitResult(x=x, fun=f, converged=conv, n_iter=nit), traces
