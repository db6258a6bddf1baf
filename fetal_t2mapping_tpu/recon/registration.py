"""Differentiable multi-resolution image registration (rigid & affine).

TPU-native replacement for the reference's external registration engines:
- SimpleElastix rigid registration (reference utils/qmri_utils.py:159-165)
  for orientation-to-orientation and echo-to-echo alignment;
- FSL FLIRT affine registration of MNI152 to subject space (:1011-1037).

Design: the unused ``registration_itk`` in the reference (:167-221) documents
the intended algorithm — correlation metric, Euler3D transform, gradient
descent, multi-resolution — which maps perfectly onto JAX:

- the warp is a trilinear gather (ops.interp), differentiable w.r.t. the
  sample coordinates, so the metric gradient w.r.t. the 6/12 transform
  parameters comes from autodiff: no finite differences. The fixed grid is
  stride-subsampled per level (_LEVEL_SAMPLES — gathers are the expensive
  op on TPU and a 6/12-dof metric saturates long before dense sampling;
  still ~5-20x denser than Elastix's few-thousand random samples);
- four metrics, all masked to in-bounds voxels: 'ncc' (same-contrast
  pairs), 'mse', and two cross-contrast histogram metrics — 'mi'
  (Parzen-window mutual information, Mattes/Viola style; the joint
  histogram is one (B,N)x(N,B) matmul on the MXU) and 'cr' (correlation
  ratio, FLIRT's default cost for the MNI-T1 -> subject-T2 atlas
  registration, reference utils/qmri_utils.py:1027-1037);
- a 3-level image pyramid (Gaussian smooth + subsample), Adam on
  physically-scaled parameters, fixed iteration counts per level
  (lax.scan — one compile per level shape);
- rotations are parameterized about the fixed-image center (the
  CenteredTransformInitializer GEOMETRY convention).

The returned transform is a 4x4 world->world matrix T mapping fixed-space
points into moving-space: registered(w) = moving(T @ w).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.volume import Volume
from ..ops.filtering import smooth_subsample
from ..ops.interp import sample_trilinear, sample_trilinear_flat
from .resample import resample_to_reference


# --------------------------------------------------------------------- math
def _euler_zxy(rx, ry, rz):
    """Rotation matrix (ITK Euler3DTransform order: R = Rz @ Rx @ Ry)."""
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    Rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Rx @ Ry


def _rigid_matrix(params, center, scale):
    """params (6,) scaled -> (R, t) with rotation about ``center``.

    params are in 'physical' units: rotations were multiplied by the image
    radius so Adam sees comparable magnitudes; ``scale`` undoes that.
    """
    rot = params[:3] / scale
    t = params[3:]
    R = _euler_zxy(rot[0], rot[1], rot[2])
    offset = center - R @ center + t
    return R, offset


@functools.partial(jax.jit, static_argnames=("mode",))
def _matrix_4x4_jit(p, center, scale, *, mode: str):
    """Solved params -> 4x4 world transform as ONE device program."""
    if mode == "rigid":
        R, offset = _rigid_matrix(p, center, scale)
    else:
        q = jnp.concatenate([p[:9], p[9:] * _AFFINE_T_SCALE])
        R, offset = _affine_matrix(q, center)
    T = jnp.eye(4, dtype=jnp.float32)
    return T.at[:3, :3].set(R).at[:3, 3].set(offset)


def _affine_matrix(params, center):
    """params (12,): 9 matrix perturbations + 3 translations."""
    M = jnp.eye(3) + params[:9].reshape(3, 3)
    t = params[9:]
    offset = center - M @ center + t
    return M, offset


# ----------------------------------------------------------------- pyramid
def _device_pyramid(vol: Volume, levels: Sequence[int], sigmas: Sequence[float]):
    """All pyramid levels as DEVICE arrays from a single host->device upload.

    Host<->device ping-pong per level is ruinous on a tunneled chip (observed:
    ~5 MB/s link; re-uploading a 192^3 volume per level dominated the whole
    registration); the base volume crosses the link once and every level is
    derived on device."""
    base = jnp.asarray(vol.data, jnp.float32)  # no-op if already on device
    out = []
    for factor, sigma in zip(levels, sigmas):
        data = base if (factor == 1 and sigma <= 0) else smooth_subsample(
            base, sigma, factor)
        # voxel (0,0,0) center moves < spacing/2 under subsampling; negligible
        out.append((data, tuple(s * factor for s in vol.spacing)))
    return out


# ------------------------------------------------------------------ metric
def _mask_pyramid(mask: np.ndarray, levels: Sequence[int]):
    """Per-level fixed-image metric masks (host numpy, bool).

    Each level's mask is the block-OR of the full-resolution mask over the
    level's ``factor``-strided grid — the same grid ``smooth_subsample``
    produces — so a thin structure stays representable at coarse levels
    instead of falling between strides (the "after smoothing" analogue for
    a binary mask: OR is the 0/1 max-pool)."""
    base = np.asarray(mask) > 0
    out = []
    for factor in levels:
        factor = int(factor)
        if factor == 1:
            out.append(base)
            continue
        lvl_shape = tuple(len(range(0, s, factor)) for s in base.shape)
        lvl = np.zeros(lvl_shape, bool)
        for dz in range(factor):
            for dy in range(factor):
                for dx in range(factor):
                    sub = base[dz::factor, dy::factor, dx::factor]
                    lvl[:sub.shape[0], :sub.shape[1], :sub.shape[2]] |= sub
        out.append(lvl)
    return out


def _level_inputs(fixed_vol: Volume, fixed_data, fixed_spacing,
                  moving_vol: Volume, moving_data, moving_spacing,
                  max_points: int = 1 << 16, mask_level=None):
    """Device operands for one pyramid level's metric.

    The fixed grid is stride-subsampled to at most ~max_points samples:
    gathers are the expensive op on TPU, and a rigid/affine metric saturates
    long before dense sampling (Elastix defaults to a few THOUSAND random
    samples; 2^16 strided samples is still ~20x denser).

    With ``mask_level`` (bool array on this level's grid) the samples are
    drawn ONLY from mask voxels — the fixed-image metric mask of the
    reference's intended design (``SetMetricFixedMask``, reference
    utils/qmri_utils.py:194-197): content outside the mask (e.g. maternal
    anatomy moving independently of the fetal brain) never enters the
    metric. Exactly ``max_points`` samples are taken by even resampling of
    the raster-ordered mask-voxel list, so masked registrations share one
    jit cache entry regardless of mask size (repeats when the mask is
    smaller than the budget only reweight, never bias, the metric).

    Everything data-dependent is returned as ARRAYS to be passed into the
    jitted level driver — baking them into a metric closure would make
    every registration a fresh jit cache entry and recompile (~15-40 s per
    call on the tunneled chip; observed dominating 'warm' registrations).
    """
    fixed_pts, fixed_vals = _fixed_level_operands(
        fixed_vol, fixed_data, fixed_spacing, max_points, mask_level)
    m_data, m_inv, m_origin = _moving_operands(moving_vol, moving_data,
                                               moving_spacing)
    return fixed_pts, fixed_vals, m_data, m_inv, m_origin


@functools.partial(jax.jit, static_argnames=("stride",))
def _strided_vals(data, *, stride: int):
    """Strided flatten as ONE program (an eager slice + reshape would be
    two singleton programs, each costing seconds of remote load on the
    tunneled chip's per-process cold path)."""
    return data[::stride, ::stride, ::stride].reshape(-1)


@jax.jit
def _gather_vals(data, idx):
    """Mask-voxel value gather as one program (same cold-path rationale)."""
    return data[idx[:, 0], idx[:, 1], idx[:, 2]]


def _fixed_level_operands(fixed_vol: Volume, fixed_data, fixed_spacing,
                          max_points: int, mask_level=None):
    """Fixed-side metric operands (sample points + values) for one level."""
    shape = tuple(int(s) for s in fixed_data.shape)
    A = fixed_vol.direction_matrix @ np.diag(fixed_spacing)   # world from (x,y,z)
    if mask_level is not None:
        mask_level = np.asarray(mask_level)
        if mask_level.shape != shape:
            raise ValueError(
                f"fixed_mask level shape {mask_level.shape} != level image "
                f"shape {shape}")
        mvox = np.argwhere(mask_level)                 # (M, 3) in (z,y,x)
        if mvox.shape[0] == 0:
            raise ValueError("fixed_mask selects no voxels at this pyramid level")
        take = np.linspace(0, mvox.shape[0] - 1, num=int(max_points))
        mvox = mvox[take.round().astype(np.int64)]
        world = (mvox[:, ::-1].astype(np.float32) @ A.T
                 + np.asarray(fixed_vol.origin)).astype(np.float32)
        fixed_pts = jnp.asarray(world)   # f32 on host: no convert program
        fixed_vals = _gather_vals(fixed_data, mvox.astype(np.int32))
    else:
        npts = int(np.prod(shape))
        stride = 1
        if npts > max_points:
            stride = int(np.ceil((npts / max_points) ** (1.0 / 3.0)))
        # strided voxel-index grid -> world coordinates (small, built on host)
        idx = np.stack(np.meshgrid(
            *[np.arange(0, s, stride, dtype=np.float32) for s in shape],
            indexing="ij"), axis=-1)                 # (gz, gy, gx, 3) in (z,y,x)
        world = (idx[..., ::-1] @ A.T
                 + np.asarray(fixed_vol.origin)).astype(np.float32)
        fixed_pts = jnp.asarray(world.reshape(-1, 3))
        fixed_vals = _strided_vals(fixed_data, stride=stride)
    return fixed_pts, fixed_vals


def _make_metric_fn(kind: str, transform_fn, fixed_pts, fixed_vals,
                    m_data, m_inv, m_origin, m_dims=None, m_sample=None,
                    m_stats=None):
    """metric(params) -> scalar from traced level operands (trace-time
    closure INSIDE the jitted driver — no host constants baked in).

    The multi-pair engine overrides three things so P metrics can be
    vmapped without batching the gather operand:

    - ``m_dims`` (traced (3,) array): the TRUE moving extents when the
      moving is zero-padded to a shared batch shape — the in-bounds test
      must use the true extents, and since sampling reads 0 outside the
      true volume, a padded volume with ``m_dims`` evaluates the metric
      identically to the unpadded single-pair program;
    - ``m_sample`` (callable coords -> values): replaces
      ``sample_trilinear(m_data, coords)`` — the multi path samples from
      ONE flat buffer of all movings via a per-pair base offset
      (ops.interp.sample_trilinear_flat), which keeps the gather operand
      unbatched under vmap (a batched-operand gather is ~1.6x slower on
      TPU);
    - ``m_stats`` ((lo, rng) scalars): the moving intensity window for the
      MI histogram, precomputed per pair outside the vmap (with
      ``m_sample`` there is no per-pair array here to reduce over).
    """
    n_bins = 32
    if m_dims is None:
        nz, ny, nx = m_data.shape
    else:
        nz, ny, nx = m_dims[0], m_dims[1], m_dims[2]
    if m_sample is None:
        m_sample = lambda coords: sample_trilinear(m_data, coords)

    # histogram-metric precomputation: the FIXED image's soft bin weights
    # are constant across iterations — computed once per trace and hoisted
    # out of the optimization loop by XLA. 32 bins, Parzen window = a
    # Gaussian one bin wide (smooth everywhere, so the metric is
    # differentiable w.r.t. the transform through the moving values;
    # Mattes' cubic B-spline would serve the same purpose).
    if kind in ("mi", "cr"):
        f_lo = jnp.min(fixed_vals)
        f_rng = jnp.maximum(jnp.max(fixed_vals) - f_lo, 1e-6)
        centers = jnp.arange(n_bins, dtype=jnp.float32)
        zf = (fixed_vals - f_lo) / f_rng * (n_bins - 1)
        wf = jnp.exp(-0.5 * jnp.square(zf[:, None] - centers[None, :]))
        wf = wf / (jnp.sum(wf, axis=1, keepdims=True) + 1e-12)    # (N, B)
        if m_stats is None:
            m_lo = jnp.min(m_data)
            m_rng = jnp.maximum(jnp.max(m_data) - m_lo, 1e-6)
        else:
            m_lo, m_rng = m_stats

    def metric(params):
        R, offset = transform_fn(params)
        w = fixed_pts @ R.T + offset
        idx_xyz = (w - m_origin) @ m_inv
        coords = idx_xyz[..., ::-1]
        vals = m_sample(coords)
        inb = (
            (coords[..., 0] >= 0) & (coords[..., 0] <= nz - 1)
            & (coords[..., 1] >= 0) & (coords[..., 1] <= ny - 1)
            & (coords[..., 2] >= 0) & (coords[..., 2] <= nx - 1)
        ).astype(jnp.float32)
        n = jnp.maximum(jnp.sum(inb), 1.0)
        if kind in ("mi", "cr"):
            # EVERY fixed sample contributes; out-of-bounds moving samples
            # read as background (0) rather than being discarded. Masking
            # them out lets the optimizer GAME the metric by rotating
            # poorly-matching content out of the overlap (observed: CR 0.91
            # at a 1.5 mm-off pose vs 0.52 at truth, purely from overlap
            # shrinkage) — with background substitution that move costs.
            vals_bg = vals * inb
            n_all = np.float32(fixed_pts.shape[0])
            if kind == "cr":
                # FLIRT's default cost (correlation ratio, Roche 1998):
                # 1 - E_b[Var(moving | fixed-bin b)] / Var(moving) — soft
                # fixed-intensity bins, conditional moments by one matmul
                nb = jnp.sum(wf, axis=0)                           # (B,)
                s1 = wf.T @ vals_bg                                # (B,)
                s2 = wf.T @ (vals_bg * vals_bg)
                mm_all = jnp.sum(s1) / n_all
                var_all = jnp.maximum(jnp.sum(s2) / n_all - mm_all ** 2, 1e-12)
                mean_b = s1 / jnp.maximum(nb, 1e-6)
                var_b = jnp.maximum(s2 / jnp.maximum(nb, 1e-6) - mean_b ** 2, 0.0)
                eta2 = jnp.sum(nb * var_b) / (n_all * var_all)
                return eta2 - 1.0                                  # in [-1, 0]
            # Parzen joint histogram -> mutual information (Mattes/Viola):
            # the moving-side weights change every iteration, the joint is
            # a (B, N) x (N, B) matmul (MXU), MI is O(B^2)
            zm = (vals_bg - m_lo) / m_rng * (n_bins - 1)
            wm = jnp.exp(-0.5 * jnp.square(zm[:, None] - centers[None, :]))
            wm = wm / (jnp.sum(wm, axis=1, keepdims=True) + 1e-12)
            joint = wf.T @ wm                                      # (B, B)
            joint = joint / jnp.maximum(jnp.sum(joint), 1e-12)
            pf = jnp.sum(joint, axis=1)
            pm = jnp.sum(joint, axis=0)
            mi = jnp.sum(joint * (jnp.log(joint + 1e-12)
                                  - jnp.log(pf[:, None] * pm[None, :] + 1e-12)))
            return -mi
        mf = jnp.sum(fixed_vals * inb) / n
        mm = jnp.sum(vals * inb) / n
        df = (fixed_vals - mf) * inb
        dm = (vals - mm) * inb
        if kind == "ncc":
            cov = jnp.sum(df * dm)
            denom = jnp.sqrt(jnp.sum(df * df) * jnp.sum(dm * dm)) + 1e-8
            return -cov / denom
        if kind == "mse":
            return jnp.sum(jnp.square(df - dm)) / n
        raise ValueError(kind)

    return metric


# --------------------------------------------------------------- optimizer
def _level_scan(ops, center, scale, params0, lr, *, kind: str, mode: str,
                iters: int):
    """One pyramid level: build the metric from traced operands, run Adam.

    All image data, grids and geometry are ARGUMENTS, so repeated
    registrations hit the compile cache (a closure-captured metric
    recompiled every call — 15-40 s per registration on the tunneled
    chip)."""
    fixed_pts, fixed_vals, m_data, m_inv, m_origin = ops
    if mode == "rigid":
        tf = lambda p: _rigid_matrix(p, center, scale)
    else:
        # translations need mm-scale steps: scale them up inside the transform
        tf = lambda p: _affine_matrix(
            jnp.concatenate([p[:9], p[9:] * _AFFINE_T_SCALE]), center)
    metric = _make_metric_fn(kind, tf, fixed_pts, fixed_vals, m_data,
                             m_inv, m_origin)
    grad_fn = jax.value_and_grad(metric)

    def body(carry, _):
        params, m, v, t = carry
        t = t + 1
        f, params, m, v = _adam_step(grad_fn, params, m, v, t, lr)
        return (params, m, v, t), f

    z = jnp.zeros_like(params0)
    (params, _, _, _), fs = lax.scan(
        body, (params0, z, z, jnp.asarray(0, jnp.int32)), None, length=iters)
    return params, fs


def _adam_step(grad_fn, params, m, v, t, lr):
    """One Adam(0.9, 0.999) step; ``t`` is the POST-increment step index
    (bias correction matches the scan body's t-after-increment)."""
    f, g = grad_fn(params)
    m = 0.9 * m + 0.1 * g
    v = 0.999 * v + 0.001 * g * g
    mhat = m / (1 - 0.9 ** t)
    vhat = v / (1 - 0.999 ** t)
    params = params - lr * mhat / (jnp.sqrt(vhat) + 1e-8)
    return f, params, m, v


def _best_improved(f, best_f, f0, stop_tol):
    """Did this iterate meaningfully improve on the best so far? An
    improvement counts once it exceeds ``stop_tol`` of the level's total
    descent (f0 - best) — sub-0.1%%-of-descent wiggle is plateau noise.
    The descent is floored at 1%% of the metric's own magnitude: a level
    entered already-converged (fine level after a good coarse solve) has
    near-zero descent, and without the floor every fp wiggle would count
    as progress and the level would run its full budget. The early-exit
    optimizers stop a level once ``stop_window`` iterations pass without
    an improvement (measured: 99.9%% of a 192^3 rigid solve's descent
    lands by iter ~52/65/29 of the 150/100/50 budgets — about half the
    full-budget wall time is plateau). Progress is measured against the
    BEST iterate, not the trailing window of raw values: Adam's O(lr)
    steps make the raw metric wander, and a slow genuine descent under
    that wander would read as "no recent descent" and stop at the minimum
    window."""
    scale = jnp.maximum(f0 - best_f, 0.01 * jnp.abs(best_f))
    return f < best_f - stop_tol * jnp.maximum(scale, 1e-12)


def _level_while(ops, center, scale, params0, lr, *, kind: str, mode: str,
                 iters: int, stop_tol, stop_window):
    """_level_scan with a plateau early exit (lax.while_loop): identical
    Adam sequence while running, stops once ``stop_window`` iterations
    pass without a meaningful new best metric (see _best_improved). The
    metric history keeps its static (iters,) shape — the tail past the
    stop reads as the returned iterate's metric — and the number of
    iterations actually executed is returned for diagnostics."""
    fixed_pts, fixed_vals, m_data, m_inv, m_origin = ops
    if mode == "rigid":
        tf = lambda p: _rigid_matrix(p, center, scale)
    else:
        tf = lambda p: _affine_matrix(
            jnp.concatenate([p[:9], p[9:] * _AFFINE_T_SCALE]), center)
    metric = _make_metric_fn(kind, tf, fixed_pts, fixed_vals, m_data,
                             m_inv, m_origin)
    grad_fn = jax.value_and_grad(metric)

    def cond(carry):
        return carry[-1] & (carry[3] < iters)

    def body(carry):
        params, m, v, t, hist, best_f, best_p, t_best, _ = carry
        t1 = t + 1
        f, new_params, m, v = _adam_step(grad_fn, params, m, v, t1, lr)
        hist = hist.at[t].set(f)
        # track the best iterate: a warm start AT the optimum makes Adam
        # wander (mhat/sqrt(vhat) is O(1) even for vanishing gradients) —
        # return where the metric was best, not wherever the walk ended
        t_best = jnp.where(_best_improved(f, best_f, hist[0], stop_tol),
                           t1, t_best)
        better = f < best_f
        best_f = jnp.where(better, f, best_f)
        best_p = jnp.where(better, params, best_p)
        running = (t1 - t_best) < stop_window
        return new_params, m, v, t1, hist, best_f, best_p, t_best, running

    z = jnp.zeros_like(params0)
    hist0 = jnp.zeros((iters,), jnp.float32)
    _, _, _, t_end, hist, best_f, best_p, _, _ = lax.while_loop(
        cond, body, (params0, z, z, jnp.asarray(0, jnp.int32), hist0,
                     jnp.asarray(jnp.inf, jnp.float32), params0,
                     jnp.asarray(0, jnp.int32), jnp.asarray(True)))
    # the tail past the stop reads as the metric of the RETURNED iterate;
    # best_f itself also rides back so final_metric can describe best_p
    # even when the budget ran out with the walk away from it
    hist = jnp.where(jnp.arange(iters) >= t_end, best_f, hist)
    return best_p, hist, t_end, best_f


@functools.partial(jax.jit, static_argnames=("kind", "mode", "iters"))
def _run_level(fixed_pts, fixed_vals, m_data, m_inv, m_origin, center,
               scale, params0, lr, *, kind: str, mode: str, iters: int):
    """Single jitted pyramid level (kept for callers driving levels
    individually; the registration APIs use _run_levels)."""
    return _level_scan((fixed_pts, fixed_vals, m_data, m_inv, m_origin),
                       center, scale, params0, lr, kind=kind, mode=mode,
                       iters=iters)


@functools.partial(jax.jit, static_argnames=("kind", "mode", "iters_seq"))
def _run_levels(level_ops, center, scale, params0, lr, *, kind: str,
                mode: str, iters_seq: Tuple[int, ...]):
    """ALL pyramid levels in one program: the coarse-to-fine handoff stays
    on device, so a registration costs one dispatch+sync instead of one per
    level (the tunneled chip pays ~0.2 s of fixed RPC latency per sync;
    level shapes are static, so the trace just contains one scan each)."""
    params = params0
    hist = []
    for ops, iters in zip(level_ops, iters_seq):
        params, fs = _level_scan(ops, center, scale, params, lr,
                                 kind=kind, mode=mode, iters=int(iters))
        hist.append(fs)
    return params, tuple(hist)


@functools.partial(jax.jit, static_argnames=("kind", "mode", "iters_seq"))
def _run_levels_early(level_ops, center, scale, params0, lr, stop_tol,
                      stop_window, *, kind: str, mode: str,
                      iters_seq: Tuple[int, ...]):
    """_run_levels with the plateau early exit per level (still one
    program); also returns the per-level executed-iteration counts."""
    params = params0
    hist, n_exec, best_f = [], [], None
    for ops, iters in zip(level_ops, iters_seq):
        params, fs, t_end, best_f = _level_while(
            ops, center, scale, params, lr, kind=kind, mode=mode,
            iters=int(iters), stop_tol=stop_tol, stop_window=stop_window)
        hist.append(fs)
        n_exec.append(t_end)
    return params, tuple(hist), tuple(n_exec), best_f


# ---------------------------------------------------- multi-pair optimizer
def _multi_grad_fn(ops, center, scale, *, kind: str, mode: str):
    """Batched metric value+grad for P pairs sharing ONE fixed image: the
    per-pair metric is vmapped over the stacked moving operands. The
    fixed-side Parzen precompute does not depend on the batched axis and
    is computed once (CSE'd by XLA); the MI joint histogram becomes a
    batched (P,B,N)x(P,N,B) matmul on the MXU.

    The movings live in ONE flat buffer with per-pair base offsets: under
    vmap the trilinear gather then stays a plain 1-D gather into an
    unbatched operand (vmap widens the index vector P-fold) — batching the
    operand instead (vmapped sample_trilinear) lowers to a batched gather
    that measured ~1.6x slower per pair than the single-pair program."""
    fixed_pts, fixed_vals, m_data, m_inv, m_origin, m_dims, m_lo, m_rng = ops
    if mode == "rigid":
        tf = lambda p: _rigid_matrix(p, center, scale)
    else:
        tf = lambda p: _affine_matrix(
            jnp.concatenate([p[:9], p[9:] * _AFFINE_T_SCALE]), center)

    P = int(m_data.shape[0])
    block_shape = tuple(int(s) for s in m_data.shape[1:])
    block = block_shape[0] * block_shape[1] * block_shape[2]
    m_flat = m_data.reshape(-1)
    m_base = jnp.arange(P, dtype=jnp.int32) * block

    def value_and_grad_one(params, base, mi, mo, dims, lo, rng):
        sample = lambda coords: sample_trilinear_flat(
            m_flat, block_shape, coords, base=base)
        metric = _make_metric_fn(kind, tf, fixed_pts, fixed_vals, None, mi,
                                 mo, m_dims=dims, m_sample=sample,
                                 m_stats=(lo, rng))
        return jax.value_and_grad(metric)(params)

    grad_all = jax.vmap(value_and_grad_one, in_axes=(0, 0, 0, 0, 0, 0, 0))
    return lambda params: grad_all(params, m_base, m_inv, m_origin, m_dims,
                                   m_lo, m_rng)        # (P,), (P, dof)


def _level_scan_multi(ops, center, scale, params0, lr, *, kind: str,
                      mode: str, iters: int):
    """One pyramid level for P pairs in a single lock-step Adam scan."""
    grad_fn = _multi_grad_fn(ops, center, scale, kind=kind, mode=mode)

    def body(carry, _):
        params, m, v, t = carry
        t = t + 1
        f, params, m, v = _adam_step(grad_fn, params, m, v, t, lr)
        return (params, m, v, t), f

    z = jnp.zeros_like(params0)
    (params, _, _, _), fs = lax.scan(
        body, (params0, z, z, jnp.asarray(0, jnp.int32)), None, length=iters)
    return params, fs                                   # (P,dof), (iters,P)


def _level_while_multi(ops, center, scale, params0, lr, *, kind: str,
                       mode: str, iters: int, stop_tol, stop_window):
    """_level_scan_multi with the plateau early exit: the level stops when
    EVERY pair has gone ``stop_window`` iterations without a meaningful
    new best (pairs that plateau first keep lock-stepping — extra polish,
    never harm)."""
    grad_fn = _multi_grad_fn(ops, center, scale, kind=kind, mode=mode)
    P = int(params0.shape[0])

    def cond(carry):
        return carry[-1] & (carry[3] < iters)

    def body(carry):
        params, m, v, t, hist, best_f, best_p, t_best, _ = carry
        t1 = t + 1
        f, new_params, m, v = _adam_step(grad_fn, params, m, v, t1, lr)  # f: (P,)
        hist = hist.at[t].set(f)
        t_best = jnp.where(_best_improved(f, best_f, hist[0], stop_tol),
                           t1, t_best)            # per-pair
        better = f < best_f                       # per-pair best iterate
        best_f = jnp.where(better, f, best_f)
        best_p = jnp.where(better[:, None], params, best_p)
        # the level runs until EVERY pair has gone stop_window iterations
        # without a meaningful new best (plateaued pairs keep lock-stepping
        # — extra polish, never harm)
        running = jnp.any((t1 - t_best) < stop_window)
        return new_params, m, v, t1, hist, best_f, best_p, t_best, running

    z = jnp.zeros_like(params0)
    hist0 = jnp.zeros((iters, P), jnp.float32)
    _, _, _, t_end, hist, best_f, best_p, _, _ = lax.while_loop(
        cond, body, (params0, z, z, jnp.asarray(0, jnp.int32), hist0,
                     jnp.full((P,), jnp.inf, jnp.float32), params0,
                     jnp.zeros((P,), jnp.int32), jnp.asarray(True)))
    hist = jnp.where(jnp.arange(iters)[:, None] >= t_end, best_f[None, :],
                     hist)
    return best_p, hist, t_end, best_f


@functools.partial(jax.jit, static_argnames=("kind", "mode", "iters_seq"))
def _run_levels_multi(level_ops, center, scale, params0, lr, *, kind: str,
                      mode: str, iters_seq: Tuple[int, ...]):
    """All pyramid levels for P pairs in ONE program (the multi-pair
    analogue of _run_levels): P registrations cost one dispatch+sync
    total, and the vmapped gathers/matmuls batch P-fold."""
    params = params0
    hist = []
    for ops, iters in zip(level_ops, iters_seq):
        params, fs = _level_scan_multi(ops, center, scale, params, lr,
                                       kind=kind, mode=mode, iters=int(iters))
        hist.append(fs)
    return params, tuple(hist)


@functools.partial(jax.jit, static_argnames=("kind", "mode", "iters_seq"))
def _run_levels_multi_early(level_ops, center, scale, params0, lr, stop_tol,
                            stop_window, *, kind: str, mode: str,
                            iters_seq: Tuple[int, ...]):
    """_run_levels_multi with the plateau early exit per level."""
    params = params0
    hist, n_exec, best_f = [], [], None
    for ops, iters in zip(level_ops, iters_seq):
        params, fs, t_end, best_f = _level_while_multi(
            ops, center, scale, params, lr, kind=kind, mode=mode,
            iters=int(iters), stop_tol=stop_tol, stop_window=stop_window)
        hist.append(fs)
        n_exec.append(t_end)
    return params, tuple(hist), tuple(n_exec), best_f


def _moving_operands(moving_vol: Volume, moving_data, moving_spacing):
    """Moving-side metric operands for one pyramid level (the moving half
    of _level_inputs). The tiny affine/origin stay HOST arrays — the jitted
    drivers transfer them; eager jnp conversions would be extra device
    work on the cold path."""
    Mi = np.linalg.inv(moving_vol.direction_matrix @ np.diag(moving_spacing))
    return (moving_data, np.ascontiguousarray(Mi.T, np.float32),
            np.asarray(moving_vol.origin, np.float32))


@functools.partial(jax.jit, static_argnames=("max_shape",))
def _stack_moving_level(datas, invs, origins, *, max_shape):
    """Pad+stack+window one level's moving operands as ONE program (the
    eager per-pair min/max/pad/stack ops were ~10 singleton programs per
    level, each paying seconds of remote load on the tunneled chip's
    per-process cold path)."""
    los, rngs, padded = [], [], []
    for d in datas:
        lo = jnp.min(d)
        los.append(lo)
        rngs.append(jnp.maximum(jnp.max(d) - lo, 1e-6))
        padded.append(d if tuple(d.shape) == max_shape else jnp.pad(
            d, [(0, max_shape[i] - d.shape[i]) for i in range(3)]))
    return (jnp.stack(padded), jnp.stack(invs), jnp.stack(origins),
            jnp.stack(los), jnp.stack(rngs))


def _stacked_moving_operands(movings, pyramids, level: int):
    """Stack one pyramid level of every moving volume into batched operands,
    zero-padding each to the shared max shape. Padding preserves the metric
    exactly: sampling reads 0 outside the TRUE volume already, the per-pair
    true extents ride along as ``m_dims`` for the in-bounds test, and the
    MI intensity window (lo, rng) is reduced over each UNPADDED volume here
    — a min over the padded stack would clamp to 0 for any moving whose
    true minimum is positive, redistributing its Parzen bins away from the
    single-pair metric's."""
    datas, invs, origins, dims = [], [], [], []
    for mov, pyr in zip(movings, pyramids):
        m_dat, m_sp = pyr[level]
        md, mi, mo = _moving_operands(mov, m_dat, m_sp)
        datas.append(md)
        invs.append(mi)
        origins.append(mo)
        dims.append(np.asarray(md.shape, np.float32))
    max_shape = tuple(max(int(d.shape[i]) for d in datas) for i in range(3))
    data_b, inv_b, org_b, lo_b, rng_b = _stack_moving_level(
        tuple(datas), tuple(invs), tuple(origins), max_shape=max_shape)
    return (data_b, inv_b, org_b, jnp.asarray(np.stack(dims)), lo_b, rng_b)


@jax.jit
def _split_pairs(params, hist, final_f):
    """Per-pair views of the multi-engine's stacked outputs as ONE program
    (eager params[p] / h[:, p] slicing was 2 singleton programs per pair
    on the cold path)."""
    P = params.shape[0]
    return tuple((params[p], tuple(h[:, p] for h in hist),
                  None if final_f is None else final_f[p])
                 for p in range(P))


_AFFINE_T_SCALE = 50.0

# Per-level metric sample budgets. The per-iteration cost is GATHER-bound
# (8 trilinear corner reads per sample; measured 3.8 ms/iter at 2^16
# samples vs 0.77 at 2^14 on one chip), so coarse, heavily-smoothed levels
# run on a lean budget and only the full-resolution polish level pays for
# dense sampling. 2^14 is still ~5x denser than Elastix's few-thousand
# random samples per iteration.
_LEVEL_SAMPLES = (1 << 14, 1 << 14, 1 << 16)


def _level_samples(samples, n_levels: int):
    """Resolve the per-level sample budget: None -> lean coarse levels +
    a dense finest level (derived from _LEVEL_SAMPLES), whatever the
    pyramid depth; explicit sequences must cover every level (a short one
    would silently skip fine levels in the zip)."""
    if samples is None:
        return (_LEVEL_SAMPLES[0],) * (n_levels - 1) + (_LEVEL_SAMPLES[-1],)
    samples = tuple(int(s) for s in samples)
    if len(samples) != n_levels:
        raise ValueError(
            f"samples has {len(samples)} entries for {n_levels} pyramid "
            "levels")
    return samples


def _shard_level_ops(level_ops, mesh):
    """Lay one registration's level operands out over a device mesh.

    The fixed-image SAMPLE axis is the only axis worth sharding (2^14-2^16
    points vs 6/12 transform params): points and values are partitioned
    over the mesh's first axis, every moving-side operand — including the
    multi-pair engine's batched stack, whose pair axis is small and rides
    inside each shard — is replicated. The jitted level drivers are
    unchanged: GSPMD turns the metric's sample-axis reductions (NCC/MSE
    sums, the Parzen joint-histogram (B,N)x(N,B) matmul, and the autodiff
    gradient's matching reductions) into psum collectives over ICI. Sample
    budgets are powers of two (_LEVEL_SAMPLES / exact masked resampling) so
    they divide any power-of-two mesh evenly; a level whose full strided
    grid undercuts the budget (small coarse levels) can land on a
    non-multiple count — those are evenly resampled down to the largest
    multiple (dropping <ndev samples out of thousands: metric change is
    far below the sampling noise already accepted by strided sampling).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    sh_pts = NamedSharding(mesh, P(axis, None))
    sh_val = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    ndev = mesh.devices.size
    out = []
    for ops in level_ops:
        pts, vals = ops[0], ops[1]
        n = int(pts.shape[0])
        if n < ndev:
            raise ValueError(
                f"level has {n} metric samples for a {ndev}-device mesh")
        if n % ndev:
            keep = np.round(np.linspace(0, n - 1, num=n - n % ndev)
                            ).astype(np.int32)
            pts, vals = pts[keep], vals[keep]
        out.append((jax.device_put(pts, sh_pts), jax.device_put(vals, sh_val))
                   + tuple(jax.device_put(o, rep) for o in ops[2:]))
    return tuple(out)


def _fixed_mask_pyramid(fixed: Volume, fixed_mask, levels: Sequence[int]):
    """Normalize a fixed-image metric mask (Volume | array | "auto" | None)
    to one bool array per pyramid level (or all-None when unmasked).

    "auto" builds the mask from the fixed image itself with the
    threshold+fill+dilate+erode slice pipeline (ops.build_slice_mask) —
    exactly what the reference's ``registration_itk`` does internally
    before ``SetMetricFixedMask`` (utils/qmri_utils.py:186-197,223-252)."""
    if fixed_mask is None:
        return (None,) * len(levels)
    if isinstance(fixed_mask, str):
        if fixed_mask != "auto":
            raise ValueError(f"fixed_mask must be an array, a Volume, "
                             f"'auto' or None; got {fixed_mask!r}")
        from ..ops.morphology import build_slice_mask

        fixed_mask = build_slice_mask(jnp.asarray(fixed.data, jnp.float32))
    arr = fixed_mask.data if isinstance(fixed_mask, Volume) else fixed_mask
    arr = np.asarray(arr)
    if arr.shape != tuple(fixed.shape):
        raise ValueError(
            f"fixed_mask shape {arr.shape} != fixed image shape {fixed.shape}")
    if not (arr > 0).any():
        raise ValueError("fixed_mask is empty")
    return _mask_pyramid(arr, levels)


# -------------------------------------------------------------------- API
class RegistrationResult:
    """World->world transform (fixed space -> moving space) + diagnostics.

    Device-lazy: the solve's outputs stay on device until a host field is
    touched. ``.matrix`` / ``.params`` / ``.final_metric`` /
    ``.metric_history`` materialize (one tunnel sync) on first access and
    are then cached; chained consumers that keep computing on device —
    fusion warps via ``.matrix_device``, successive-echo warm starts via
    ``.params_device`` fed back as ``init_params`` — never force a sync,
    so a whole multi-registration fusion is one uninterrupted dispatch
    chain.
    """

    def __init__(self, matrix=None, final_metric=None, metric_history=None,
                 params=None, *, _solve=None):
        # _solve: (dev_params, center, scale, [dev_history...], mode)
        self._matrix = matrix
        self._final_metric = final_metric
        self._metric_history = metric_history
        self._params = None if params is None else np.asarray(params, np.float32)
        self._solve = _solve

    def _matrix_from_params(self, p):
        center, scale, mode = (self._solve[1], self._solve[2],
                               self._solve[4])
        # one jitted program: built eagerly, the trig/concat/scatter chain
        # was ~10 singleton programs, each paying seconds of remote load
        # per process on the tunneled chip
        return _matrix_4x4_jit(p, np.asarray(center, np.float32),
                               np.float32(scale), mode=mode)

    # ---- device views (no host sync)
    @property
    def params_device(self):
        if self._solve is not None:
            return self._solve[0]
        return jnp.asarray(self.params, jnp.float32)

    @property
    def matrix_device(self):
        """4x4 world->world transform as a device array (float32)."""
        if self._solve is None:
            return jnp.asarray(self.matrix, jnp.float32)
        return self._matrix_from_params(self._solve[0])

    # ---- host fields (sync + cache on first access)
    @property
    def matrix(self) -> np.ndarray:
        if self._matrix is None:
            self._matrix = np.asarray(
                self._matrix_from_params(self._solve[0]), np.float64)
        return self._matrix

    @property
    def final_metric(self) -> float:
        if self._final_metric is None:
            if (self._solve is not None and len(self._solve) > 6
                    and self._solve[6] is not None):
                # early-exit solve: the metric of the RETURNED (best)
                # iterate, which the raw history's last entry need not be
                self._final_metric = float(np.asarray(self._solve[6]))
            else:
                self._final_metric = float(self.metric_history[-1])
        return self._final_metric

    @property
    def metric_history(self) -> np.ndarray:
        if self._metric_history is None:
            self._metric_history = np.concatenate(
                [np.asarray(h) for h in self._solve[3]])
        return self._metric_history

    @property
    def params(self) -> np.ndarray:
        """Raw optimizer parameters (6 rigid / 12 affine) — feed back as
        ``init_params`` to warm-start a related registration (e.g. the
        next echo of the same subject, which shares most of the motion);
        prefer ``params_device`` in device-chained callers."""
        if self._params is None:
            if self._solve is None:
                # host-field-only construction (matrix/metrics given, no
                # solve attached): the pre-device-lazy dataclass defaulted
                # params to an empty vector — keep that contract
                self._params = np.zeros(0, np.float32)
            else:
                self._params = np.asarray(self._solve[0], np.float32)
        return self._params

    @property
    def iters_run(self):
        """Per-level iteration counts the early-exit optimizer executed
        (np.ndarray), or None when the fixed-budget path ran (stop_tol=None
        or a host-field-only result). Syncs on first access."""
        if self._solve is None or len(self._solve) < 6 or self._solve[5] is None:
            return None
        return np.asarray([int(t) for t in self._solve[5]])


def _resolve_stop_window(stop_window, metric: str) -> int:
    """None -> per-metric patience: the histogram metrics (mi/cr) descend
    noisily and need a longer no-new-best window before stopping (measured
    on the cross-contrast suite: window 20 leaves CR at 0.023 rad where 40
    reaches the full-budget 0.012); ncc/mse plateau cleanly at 20."""
    if stop_window is None:
        return 40 if metric in ("mi", "cr") else 20
    return int(stop_window)


def _solve_levels(runner_plain, runner_early, level_ops, center, scale,
                  params, lr, *, kind, mode, iters_seq, stop_tol,
                  stop_window):
    """Dispatch to the fixed-budget or the plateau-early-exit optimizer.

    ``stop_tol=None`` runs the exact fixed-budget scan; otherwise each
    level stops once ``stop_window`` iterations pass without the best
    metric improving by more than ``stop_tol`` of the total descent
    (default 1e-3: the measured 99.9%%-descent points sit at ~1/3-2/3 of
    the default budgets, so the plateau tail is pure wall time), and the
    BEST iterate is returned. Both are single compiled programs;
    tol/window ride as traced scalars so tuning them never recompiles."""
    if stop_tol is None:
        p, hist = runner_plain(level_ops, center, scale, params, lr,
                               kind=kind, mode=mode, iters_seq=iters_seq)
        return p, hist, None, None
    p, hist, n_exec, final_f = runner_early(
        level_ops, center, scale, params, lr, np.float32(stop_tol),
        np.int32(_resolve_stop_window(stop_window, kind)),
        kind=kind, mode=mode, iters_seq=iters_seq)
    return p, hist, n_exec, final_f


def register_rigid(
    fixed: Volume,
    moving: Volume,
    *,
    levels: Sequence[int] = (4, 2, 1),
    sigmas: Sequence[float] = (2.0, 1.0, 0.0),
    iters: Sequence[int] = (150, 100, 50),
    samples: "Sequence[int] | None" = None,
    lr: float = 0.5,
    metric: str = "ncc",
    init_params: Optional[np.ndarray] = None,
    fixed_mask=None,
    stop_tol: "float | None" = 1e-3,
    stop_window: "int | None" = None,
    mesh=None,
) -> RegistrationResult:
    """6-DOF rigid registration of ``moving`` onto ``fixed``.

    ``mesh`` (a ``jax.sharding.Mesh``) shards the metric's fixed-image
    sample axis over the mesh devices — the solve runs the SAME jitted
    program with GSPMD-inserted psum collectives for the sample-axis
    reductions (see :func:`_shard_level_ops`). Results are identical to
    the single-device solve up to reduction-order rounding.

    ``fixed_mask`` (a Volume or bool array on the fixed grid) restricts the
    metric to mask voxels — the fixed-image metric mask of the reference's
    intended design (``SetMetricFixedMask``, reference
    utils/qmri_utils.py:194-197; build one from an image with
    :func:`fetal_t2mapping_tpu.ops.build_slice_mask`, the device port of
    the reference's ``build_mask`` :223-252). Essential when structures
    outside the target (e.g. maternal tissue around a fetal brain) move
    independently of it.

    ``stop_tol`` enables the per-level plateau early exit (see
    :func:`_solve_levels`; ``None`` restores the exact fixed-budget
    optimizer). ``iters`` stays the hard per-level budget either way.
    """
    center = np.asarray(fixed.center_world(), np.float32)
    radius = float(np.linalg.norm(np.asarray(fixed.physical_extent)) / 2.0) or 1.0
    scale = np.float32(radius)  # rotations optimized in radius*mm units

    # np (not jnp) constants: each eager jnp constructor becomes its own
    # singleton device program, and on the tunneled chip every first
    # program execution costs seconds of remote load (cold-start path)
    params = (np.zeros(6, np.float32) if init_params is None
              else np.asarray(init_params, np.float32))
    samples = _level_samples(samples, len(levels))
    if len(sigmas) != len(levels) or len(iters) != len(levels):
        raise ValueError(
            f"levels/sigmas/iters lengths differ: {len(levels)}/"
            f"{len(sigmas)}/{len(iters)}")
    mask_pyr = _fixed_mask_pyramid(fixed, fixed_mask, levels)
    f_pyr = _device_pyramid(fixed, levels, sigmas)
    m_pyr = _device_pyramid(moving, levels, sigmas)
    level_ops = tuple(
        _level_inputs(fixed, f_dat, f_sp, moving, m_dat, m_sp,
                      max_points=int(n_smp), mask_level=mlvl)
        for (f_dat, f_sp), (m_dat, m_sp), n_smp, mlvl
        in zip(f_pyr, m_pyr, samples, mask_pyr))
    if mesh is not None:
        level_ops = _shard_level_ops(level_ops, mesh)
    params, hist, n_exec, final_f = _solve_levels(
        _run_levels, _run_levels_early, level_ops,
        np.asarray(center, np.float32), np.float32(scale), params,
        np.float32(lr), kind=metric,
        mode="rigid", iters_seq=tuple(int(i) for i in iters),
        stop_tol=stop_tol, stop_window=stop_window)
    # device-lazy result: nothing syncs until a host field is touched
    return RegistrationResult(
        _solve=(params, center, scale, list(hist), "rigid", n_exec,
                final_f))


def register_affine(
    fixed: Volume,
    moving: Volume,
    *,
    levels: Sequence[int] = (4, 2, 1),
    sigmas: Sequence[float] = (2.0, 1.0, 0.0),
    iters: Sequence[int] = (200, 120, 60),
    samples: "Sequence[int] | None" = None,
    lr: float = 0.02,
    metric: str = "ncc",
    init_params: Optional[np.ndarray] = None,
    fixed_mask=None,
    stop_tol: "float | None" = 1e-3,
    stop_window: "int | None" = None,
    mesh=None,
) -> RegistrationResult:
    """12-DOF affine registration (the FLIRT replacement).

    The 9 matrix entries are optimized as perturbations of identity with a
    small lr (dimensionless), translations ride the same Adam scaling.
    ``fixed_mask`` restricts the metric to fixed-image mask voxels,
    ``stop_tol``/``stop_window`` control the plateau early exit, and
    ``mesh`` shards the metric's sample axis over a device mesh (see
    :func:`register_rigid`).
    """
    center = np.asarray(fixed.center_world(), np.float32)
    params = (np.zeros(12, np.float32) if init_params is None
              else np.asarray(init_params, np.float32))
    samples = _level_samples(samples, len(levels))
    if len(sigmas) != len(levels) or len(iters) != len(levels):
        raise ValueError(
            f"levels/sigmas/iters lengths differ: {len(levels)}/"
            f"{len(sigmas)}/{len(iters)}")
    mask_pyr = _fixed_mask_pyramid(fixed, fixed_mask, levels)
    f_pyr = _device_pyramid(fixed, levels, sigmas)
    m_pyr = _device_pyramid(moving, levels, sigmas)
    level_ops = tuple(
        _level_inputs(fixed, f_dat, f_sp, moving, m_dat, m_sp,
                      max_points=int(n_smp), mask_level=mlvl)
        for (f_dat, f_sp), (m_dat, m_sp), n_smp, mlvl
        in zip(f_pyr, m_pyr, samples, mask_pyr))
    if mesh is not None:
        level_ops = _shard_level_ops(level_ops, mesh)
    params, hist, n_exec, final_f = _solve_levels(
        _run_levels, _run_levels_early, level_ops,
        np.asarray(center, np.float32),
        np.float32(1.0),  # scale unused in affine
        params, np.float32(lr), kind=metric, mode="affine",
        iters_seq=tuple(int(i) for i in iters),
        stop_tol=stop_tol, stop_window=stop_window)
    return RegistrationResult(
        _solve=(params, center, np.float32(1.0), list(hist), "affine",
                n_exec, final_f))


def _register_multi(fixed: Volume, movings: Sequence[Volume], *, mode: str,
                    levels, sigmas, iters, samples, lr, metric,
                    init_params, fixed_mask, stop_tol, stop_window,
                    mesh=None):
    if len(movings) == 0:
        return []
    center = np.asarray(fixed.center_world(), np.float32)
    if mode == "rigid":
        radius = float(np.linalg.norm(
            np.asarray(fixed.physical_extent)) / 2.0) or 1.0
        scale, dof = np.float32(radius), 6
    else:
        scale, dof = np.float32(1.0), 12
    P = len(movings)
    if init_params is None:
        params = np.zeros((P, dof), np.float32)   # host: no device program
    else:
        params = np.asarray(init_params, np.float32)
        if params.shape != (P, dof):
            raise ValueError(
                f"init_params shape {params.shape} != ({P}, {dof}) for "
                f"{P} moving volumes ({mode})")
    samples = _level_samples(samples, len(levels))
    if len(sigmas) != len(levels) or len(iters) != len(levels):
        raise ValueError(
            f"levels/sigmas/iters lengths differ: {len(levels)}/"
            f"{len(sigmas)}/{len(iters)}")
    mask_pyr = _fixed_mask_pyramid(fixed, fixed_mask, levels)
    f_pyr = _device_pyramid(fixed, levels, sigmas)
    movings = [m.with_data(jnp.asarray(m.data, jnp.float32)) for m in movings]
    m_pyrs = [_device_pyramid(m, levels, sigmas) for m in movings]
    level_ops = []
    for li, ((f_dat, f_sp), n_smp, mlvl) in enumerate(
            zip(f_pyr, samples, mask_pyr)):
        fixed_pts, fixed_vals = _fixed_level_operands(
            fixed, f_dat, f_sp, int(n_smp), mask_level=mlvl)
        level_ops.append((fixed_pts, fixed_vals)
                         + _stacked_moving_operands(movings, m_pyrs, li))
    if mesh is not None:
        level_ops = _shard_level_ops(level_ops, mesh)
    params, hist, n_exec, final_f = _solve_levels(
        _run_levels_multi, _run_levels_multi_early, tuple(level_ops),
        np.asarray(center, np.float32), np.float32(scale), params,
        np.float32(lr), kind=metric, mode=mode,
        iters_seq=tuple(int(i) for i in iters),
        stop_tol=stop_tol, stop_window=stop_window)
    split = _split_pairs(params, tuple(hist), final_f)
    return [RegistrationResult(_solve=(split[p][0], center, scale,
                                       list(split[p][1]), mode, n_exec,
                                       split[p][2]))
            for p in range(P)]


def register_rigid_multi(
    fixed: Volume,
    movings: Sequence[Volume],
    *,
    levels: Sequence[int] = (4, 2, 1),
    sigmas: Sequence[float] = (2.0, 1.0, 0.0),
    iters: Sequence[int] = (150, 100, 50),
    samples: "Sequence[int] | None" = None,
    lr: float = 0.5,
    metric: str = "ncc",
    init_params: Optional[np.ndarray] = None,
    fixed_mask=None,
    stop_tol: "float | None" = 1e-3,
    stop_window: "int | None" = None,
    mesh=None,
) -> "list[RegistrationResult]":
    """Register P moving volumes onto ONE fixed volume in a single program.

    The batched form of :func:`register_rigid` for the pipeline's
    multi-pair stages — the reference runs these as separate sequential
    Elastix processes (cor->ax and sag->ax per echo,
    utils/qmri_utils.py:91; echo->first-echo, run 359-391's loop) — here
    the P solves advance in lock-step inside one jitted multi-level Adam
    scan: one dispatch+sync for all pairs, gathers and MI joint-histogram
    matmuls batched P-fold. Moving volumes may have different shapes
    (zero-padded to a shared batch shape; the metric is exactly the
    single-pair metric, see _make_metric_fn's m_dims).

    ``init_params`` is optionally (P, 6). Returns one
    :class:`RegistrationResult` per moving volume, device-lazy as usual.
    """
    return _register_multi(fixed, movings, mode="rigid", levels=levels,
                           sigmas=sigmas, iters=iters, samples=samples,
                           lr=lr, metric=metric, init_params=init_params,
                           fixed_mask=fixed_mask, stop_tol=stop_tol,
                           stop_window=stop_window, mesh=mesh)


def register_affine_multi(
    fixed: Volume,
    movings: Sequence[Volume],
    *,
    levels: Sequence[int] = (4, 2, 1),
    sigmas: Sequence[float] = (2.0, 1.0, 0.0),
    iters: Sequence[int] = (200, 120, 60),
    samples: "Sequence[int] | None" = None,
    lr: float = 0.02,
    metric: str = "ncc",
    init_params: Optional[np.ndarray] = None,
    fixed_mask=None,
    stop_tol: "float | None" = 1e-3,
    stop_window: "int | None" = None,
    mesh=None,
) -> "list[RegistrationResult]":
    """Batched 12-DOF affine registration (see :func:`register_rigid_multi`)."""
    return _register_multi(fixed, movings, mode="affine", levels=levels,
                           sigmas=sigmas, iters=iters, samples=samples,
                           lr=lr, metric=metric, init_params=init_params,
                           fixed_mask=fixed_mask, stop_tol=stop_tol,
                           stop_window=stop_window, mesh=mesh)


def register_and_resample(fixed: Volume, moving: Volume, *, mode: str = "rigid",
                          method: str = "linear", **kwargs) -> Volume:
    """Register then resample onto the fixed grid — the ``registration_elastix``
    call shape (register + implicit warp, reference utils/qmri_utils.py:159-165)."""
    reg = register_rigid(fixed, moving, **kwargs) if mode == "rigid" else \
        register_affine(fixed, moving, **kwargs)
    return resample_to_reference(moving, fixed, transform=reg.matrix, method=method)
