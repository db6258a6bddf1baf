"""High-level volume fit: EchoStack -> T2/k/sigma/residual maps.

Replaces the reference's ``process_t2maps`` inner loop (run_t2mapping.py:
409-461): masked gather -> padded device batch -> lock-step batched fit ->
scatter back to volume maps, plus the same observability artifacts
(per-voxel convergence flags/iteration counts, sampled per-iteration traces,
signed-mean residual maps).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Dict, Optional

import jax
import numpy as np
import jax.numpy as jnp

from ..config import FitConfig, NO_PRIOR_K_UPPER, NO_PRIOR_T2_BOUNDS
from ..core.stack import EchoStack
from ..core.volume import Volume
from ..utils.profiling import profiler
from .init import grid_init, loglinear_init
from .pallas_fit import fit_fused
from .signal import predict_signal
from .solver import fit_batch_multistart, fit_batch_traced, fit_batch_twophase


@dataclasses.dataclass
class T2FitOutput:
    t2: Volume
    k: Volume
    sigma: Volume
    res: Volume
    converged: Volume          # 1.0 where the voxel fit converged
    n_iter: Volume             # accepted Newton steps per voxel
    fun: Volume                # final objective value per voxel
    traces: Dict[str, np.ndarray]  # sampled per-iteration traces
    trace_t2: np.ndarray       # fitted T2 of the sampled voxels
    n_voxels: int
    fit_seconds: float


def _bounds_for(cfg: FitConfig, batch: np.ndarray):
    """Per-voxel bound arrays, honouring the no-prior rule.

    no-prior (reference run_t2mapping.py:243-245): k lower bound = the
    voxel's signal at the shortest TE, k upper 10000; T2 bounds (10, 2000).
    """
    n = batch.shape[0]
    lo = np.tile(np.asarray(cfg.lower, np.float32), (n, 1))
    hi = np.tile(np.asarray(cfg.upper, np.float32), (n, 1))
    if not cfg.prior:
        lo[:, 0] = batch[:, 0]
        hi[:, 0] = NO_PRIOR_K_UPPER
        lo[:, 1], hi[:, 1] = NO_PRIOR_T2_BOUNDS
    return lo, hi


def _init_for(cfg: FitConfig, batch, te, lo, hi):
    if cfg.loglinear_init:
        return loglinear_init(batch, te, lo, hi)
    x0 = np.tile(np.asarray(cfg.initial_guess, np.float32), (batch.shape[0], 1))
    return np.clip(x0, lo, hi)


@jax.jit
def _pack_outputs(x, res, converged, n_iter, fun):
    """All per-voxel outputs as one (C, N) stack (one download, one
    program: see fit_stack)."""
    cols = [x[:, i] for i in range(x.shape[1])]
    cols += [res, converged.astype(jnp.float32),
             n_iter.astype(jnp.float32), fun]
    return jnp.stack(cols, axis=0)


@jax.jit
def _pack_traces(f_val, step_size, active):
    return jnp.stack([jnp.asarray(f_val, jnp.float32),
                      jnp.asarray(step_size, jnp.float32),
                      jnp.asarray(active, jnp.float32)], axis=0)


@functools.partial(jax.jit, static_argnames=("model",))
def _residual_mean(model: str, x, te, batch):
    """Signed mean-over-TEs residual, on device: (N, P), (T,), (N, T) -> (N,).

    Keeping this on device transfers N floats instead of the (N, T)
    prediction (reference utils/t2map_utils.py:62-89 computes it per voxel
    on host) and avoids a separate host->device upload of the batch."""
    cols = tuple(x[:, i:i + 1] for i in range(x.shape[1]))
    pred = predict_signal(model, cols, te[None, :])
    return jnp.mean(batch - pred, axis=1)


def _fused_bounds(cfg: FitConfig):
    """(lo, hi, no_prior flag) for the fused kernel path, which derives the
    per-voxel no-prior k bound in-kernel from the resident signal tile."""
    if cfg.prior:
        return cfg.lower, cfg.upper, False
    lo_f = (0.0, NO_PRIOR_T2_BOUNDS[0])
    hi_f = (NO_PRIOR_K_UPPER, NO_PRIOR_T2_BOUNDS[1])
    return lo_f, hi_f, True


def _fit_batch_mesh(cfg: FitConfig, batch: np.ndarray, te: np.ndarray, mesh):
    """Mesh-sharded fit of the gathered batch — the product-layer analogue
    of the reference's Pool(20) voxel fan-out (run_t2mapping.py:442-443).

    The fused-kernel-eligible configs (every production row except
    no-prior 3-param) go through parallel.mesh.fit_fused_sharded: the whole
    fit shard_maps over the voxel axis with zero inter-chip traffic except
    the scalar n_overflow psum. The remaining combos shard the batch's
    voxel axis with a NamedSharding and let GSPMD partition the vmapped
    multistart solve."""
    from ..parallel.mesh import VOXEL_AXIS, fit_fused_sharded, shard_voxels
    from jax.sharding import NamedSharding, PartitionSpec as P

    # top up the bucket padding to a mesh-divisible row count (buckets are
    # powers of two / 8192-multiples, so this is usually a no-op on
    # power-of-two meshes)
    q = mesh.devices.size * 128
    n_rows = batch.shape[0]
    n_pad = -(-n_rows // q) * q
    if n_pad != n_rows:
        batch = np.concatenate(
            [batch, np.broadcast_to(batch[-1], (n_pad - n_rows,) + batch.shape[1:])])

    if cfg.loglinear_init and (cfg.prior or cfg.model == "gaussian"):
        lo_f, hi_f, np_flag = _fused_bounds(cfg)
        result = fit_fused_sharded(
            batch, tuple(float(t) for t in te), lo_f, hi_f, mesh,
            model=cfg.model, guess=cfg.initial_guess, max_iters=cfg.max_iters,
            ftol=cfg.ftol, gtol=cfg.gtol, no_prior=np_flag)
        return result, shard_voxels(batch, mesh)

    # no-prior 3-param (and any custom non-loglinear config): sharded
    # placement + the existing multistart program; XLA partitions the
    # voxel-elementwise while_loop solve across the mesh
    lo, hi = _bounds_for(cfg, batch)
    x0 = np.asarray(_init_for(cfg, batch, te, lo, hi))
    x0_cfg = np.clip(np.tile(np.asarray(cfg.initial_guess, np.float32),
                             (batch.shape[0], 1)), lo, hi)
    if cfg.n_params == 3:
        x0s = np.stack([x0, np.asarray(grid_init(batch, te, lo, hi)), x0_cfg])
    else:
        x0s = np.stack([x0])
    batch_dev = shard_voxels(batch, mesh)
    x0s_dev = jax.device_put(
        x0s, NamedSharding(mesh, P(None, VOXEL_AXIS, None)))
    lo_dev = shard_voxels(lo, mesh)
    hi_dev = shard_voxels(hi, mesh)
    result = fit_batch_multistart(
        batch_dev, te, x0s_dev, lo_dev, hi_dev, model=cfg.model,
        max_iters=cfg.max_iters, ftol=cfg.ftol, gtol=cfg.gtol)
    return result, batch_dev


def fit_stack(
    stack: EchoStack,
    cfg: FitConfig,
    *,
    trace_samples: int = 50,
    seed: int = 0,
    granule: int = 8192,
    mesh=None,
) -> T2FitOutput:
    """Fit every masked voxel of the stack and assemble output maps.

    ``mesh`` (a ``jax.sharding.Mesh``) shards the voxel axis of the fit
    over the mesh devices — the product-layer equivalent of the
    reference's ``Pool(processes=20)`` fan-out (run_t2mapping.py:442-443).
    Maps, traces and semantics are identical to the single-device path."""
    batch, flat_idx, n = stack.gather(granule=granule)
    te = np.asarray(stack.tes, np.float32)

    if cfg.norm:
        # per-voxel max-normalization (reference run_t2mapping.py:236-240)
        batch = batch / np.maximum(batch.max(axis=1, keepdims=True), 1e-12)

    t0 = time.time()
    if mesh is not None:
        result, batch_dev = _fit_batch_mesh(cfg, batch, te, mesh)
        use_fused = False
    else:
        use_fused = (cfg.loglinear_init and jax.default_backend() != "cpu"
                     and (cfg.prior or cfg.model == "gaussian"))
        # ONE host->device upload of the batch, shared by the fit and the
        # residual program below (repeated np-array args would re-upload)
        batch_dev = jnp.asarray(batch, jnp.float32)
    if mesh is None and not use_fused:
        # the fused path derives bounds/starts in-kernel; the (N, P) host
        # arrays (~270 MB at 256^3) are only needed by the vmapped solver
        lo, hi = _bounds_for(cfg, batch)
        x0 = _init_for(cfg, batch, te, lo, hi)
    if mesh is not None:
        pass  # fitted above
    elif use_fused:
        # the fused Pallas kernel path (in-kernel 3-start multistart for the
        # non-convex 3-param models; in-kernel per-voxel no-prior k bound)
        lo_f, hi_f, np_flag = _fused_bounds(cfg)
        result = fit_fused(
            batch_dev, te, lo_f, hi_f, model=cfg.model,
            guess=cfg.initial_guess, max_iters=cfg.max_iters,
            ftol=cfg.ftol, gtol=cfg.gtol, no_prior=np_flag,
        )
    elif cfg.n_params == 3 and cfg.loglinear_init:
        # non-convex 3-param objectives: multistart from the log-linear
        # estimate, the T2 grid-scan basin, and the protocol initial guess;
        # keep the best minimum per voxel
        x0_cfg = np.clip(np.tile(np.asarray(cfg.initial_guess, np.float32),
                                 (batch.shape[0], 1)), lo, hi)
        x0_grid = np.asarray(grid_init(batch, te, lo, hi))
        x0s = np.stack([np.asarray(x0), x0_grid, x0_cfg])
        result = fit_batch_multistart(
            batch_dev, te, x0s, lo, hi,
            model=cfg.model, max_iters=cfg.max_iters, ftol=cfg.ftol, gtol=cfg.gtol,
        )
    else:
        result = fit_batch_twophase(
            batch_dev, te, x0, lo, hi,
            model=cfg.model, max_iters=cfg.max_iters, ftol=cfg.ftol, gtol=cfg.gtol,
        )
    # signed-mean residual over TEs (reference utils/t2map_utils.py:62-89 —
    # note the README says max, the code computes the mean; we follow the
    # code). Computed on device from the still-resident params + batch;
    # the gaussian residual uses the (k, T2) columns only, the 3-param
    # models include sigma — i.e. all P fitted columns either way.
    res_dev = _residual_mean(cfg.model, result.x,
                             np.asarray(te, np.float32), batch_dev)

    # pack every per-voxel output column into ONE device array and download
    # once: N separate np.asarray calls each pay the link's fixed RPC
    # latency (~50 ms on a tunneled chip), the packed stack pays it once.
    # The packing itself is one jitted program — eagerly it was ~8
    # singleton programs (slices/converts/stack), each paying seconds of
    # remote load per process on the cold path.
    with profiler.stage("t2map.fit.download"):
        packed = np.asarray(_pack_outputs(
            result.x, res_dev, result.converged, result.n_iter, result.fun))
    fit_seconds = time.time() - t0

    k_v, t2_v = packed[0, :n], packed[1, :n]
    off = 2
    if cfg.n_params == 3:
        sigma_v, off = packed[2, :n], 3
    else:
        sigma_v = np.zeros(n, np.float32)
    res_v, conv_v, niter_v, fun_v = (packed[off, :n], packed[off + 1, :n],
                                     packed[off + 2, :n], packed[off + 3, :n])

    # sampled per-iteration traces for convergence observability
    with profiler.stage("t2map.fit.traces"):
        rng = np.random.default_rng(seed)
        n_tr = min(trace_samples, n)
        tr_sel = rng.choice(n, size=n_tr, replace=False)
        tr_batch = batch[tr_sel]
        tr_lo, tr_hi = _bounds_for(cfg, tr_batch)
        tr_x0 = np.asarray(_init_for(cfg, tr_batch, te, tr_lo, tr_hi))
        _, traces = fit_batch_traced(
            tr_batch, te, tr_x0, tr_lo, tr_hi,
            model=cfg.model, max_iters=cfg.max_iters, ftol=cfg.ftol,
            gtol=cfg.gtol,
        )
        # same packing trick: one download for the three trace planes
        tr_packed = np.asarray(_pack_traces(
            traces["f_val"], traces["step_size"], traces["active"]))
        traces = {"f_val": tr_packed[0], "step_size": tr_packed[1],
                  "active": tr_packed[2] > 0.5}

    return T2FitOutput(
        t2=stack.scatter(t2_v, flat_idx),
        k=stack.scatter(k_v, flat_idx),
        sigma=stack.scatter(sigma_v, flat_idx),
        res=stack.scatter(res_v, flat_idx),
        converged=stack.scatter(conv_v, flat_idx),
        n_iter=stack.scatter(niter_v, flat_idx),
        fun=stack.scatter(fun_v, flat_idx),
        traces=traces,
        trace_t2=t2_v[tr_sel],
        n_voxels=n,
        fit_seconds=fit_seconds,
    )
