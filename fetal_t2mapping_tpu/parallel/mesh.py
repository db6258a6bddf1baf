"""Multi-chip voxel-parallel execution via jax.sharding.

The reference's only parallelism is a 20-process fork over voxels
(run_t2mapping.py:442-443) with no communication backend at all. The TPU
equivalent: shard the voxel axis of the (N, T) echo batch over a 1-D device
mesh with a NamedSharding and let XLA partition the batched Newton solve —
the computation is voxel-elementwise, so the only collectives are the final
all-gather when results are fetched and ``psum``-style ROI reductions.

The TE axis (3-8) and per-voxel parameter axis (2-3) are tiny and stay
replicated; tensor/pipeline/expert parallelism have no counterpart in this
workload (see SURVEY.md §2).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

VOXEL_AXIS = "vox"


def voxel_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D device mesh over the voxel axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (VOXEL_AXIS,))


def mesh_from_flag(n_devices: Optional[int]) -> Optional[Mesh]:
    """CLI ``--mesh N`` -> a voxel mesh over the first N visible devices.

    None / 0 / 1 mean single-device (no mesh); asking for more devices than
    JAX exposes is a user error surfaced with the visible count (on a CPU
    host, XLA_FLAGS=--xla_force_host_platform_device_count=N exposes N
    virtual devices)."""
    if not n_devices or n_devices <= 1:
        return None
    avail = len(jax.devices())
    if n_devices > avail:
        raise ValueError(
            f"--mesh {n_devices}: only {avail} device(s) visible to JAX")
    return voxel_mesh(n_devices)


def pad_to_devices(n: int, mesh: Mesh, lane: int = 128) -> int:
    """Smallest N' >= n divisible by (#devices * lane) for clean sharding."""
    q = mesh.devices.size * lane
    return ((n + q - 1) // q) * q


def shard_voxels(array, mesh: Mesh):
    """Place an (N, ...) array with its leading axis sharded over the mesh."""
    spec = P(VOXEL_AXIS, *([None] * (np.ndim(array) - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))


def fit_batch_sharded(signal, te, x0, lo, hi, mesh: Mesh, **fit_kwargs):
    """Run models.solver.fit_batch with the voxel axis sharded over a mesh.

    Inputs may be host arrays; the leading axis must be divisible by the mesh
    size (use pad_to_devices + core.stack bucketing). XLA partitions the
    whole while_loop solve; each chip iterates on its voxel shard with zero
    inter-chip traffic until results are read back.
    """
    from ..models.solver import fit_batch

    n = np.shape(signal)[0]
    if n % mesh.devices.size:
        raise ValueError(f"voxel count {n} not divisible by mesh size {mesh.devices.size}")
    signal = shard_voxels(np.asarray(signal, np.float32), mesh)
    x0 = shard_voxels(np.asarray(x0, np.float32), mesh)
    lo = shard_voxels(np.broadcast_to(np.asarray(lo, np.float32), x0.shape), mesh)
    hi = shard_voxels(np.broadcast_to(np.asarray(hi, np.float32), x0.shape), mesh)
    te = jax.device_put(np.asarray(te, np.float32),
                        NamedSharding(mesh, P()))  # replicated
    return fit_batch(signal, te, x0, lo, hi, **fit_kwargs)


def fit_fused_sharded(signal, te, lo, hi, mesh: Mesh, *, model: str = "gaussian",
                      guess=None, phase1_iters: int = 10, max_iters: int = 60,
                      ftol: float = 1e-9, gtol: float = 0.0,
                      tail_frac: float | None = None, tail_rounds: int = 2,
                      no_prior: bool = False, interpret=None,
                      tail_block: int | None = None, strategy: str = "auto",
                      prefix3: int | None = None,
                      varpro3: bool | None = None):
    """Multi-chip fused-kernel fit: shard_map of the whole fused pipeline.

    The fit is voxel-elementwise and everything data-dependent (per-block
    early exit in 'single' strategy; straggler compaction/escalation in
    'twophase') happens PER SHARD, so the entire solve runs with zero
    inter-chip communication except a single scalar ``psum`` folding the
    per-shard capacity-overflow counts into one global ``n_overflow``
    (always 0 under 'single'). The leading axis must be divisible by the
    mesh size (pad_to_devices).
    """
    import functools

    from ..models.pallas_fit import (
        _fit_fused_impl, resolve_prefix3, resolve_strategy,
        resolve_tail_block, resolve_tail_frac, resolve_varpro3,
        validate_fused_args)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = np.shape(signal)[0]
    if n % mesh.devices.size:
        raise ValueError(f"voxel count {n} not divisible by mesh size {mesh.devices.size}")
    te_t, lo_t, hi_t, guess_t = validate_fused_args(model, te, lo, hi, guess,
                                                    no_prior)
    tail_block = resolve_tail_block(tail_block, model)
    if tail_block < 1 or 128 % tail_block:
        # same contract as fit_fused — validated here so a bad value fails
        # with this message, not an opaque XLA shape error inside shard_map
        raise ValueError(f"tail_block must divide 128; got {tail_block}")
    prefix3 = resolve_prefix3(prefix3, max_iters)
    varpro3 = resolve_varpro3(varpro3, model)
    impl = functools.partial(
        _fit_fused_impl, model=model, te=te_t,
        lo=lo_t, hi=hi_t, guess=guess_t,
        phase1_iters=phase1_iters, max_iters=max_iters, ftol=ftol, gtol=gtol,
        tail_frac=resolve_tail_frac(tail_frac, tail_block),
        no_prior=no_prior, tail_rounds=int(tail_rounds),
        interpret=bool(interpret), tail_block=tail_block,
        strategy=resolve_strategy(strategy, phase1_iters, max_iters, model,
                                  prefix3, varpro3),
        prefix3=prefix3, varpro3=varpro3)

    from ..models.solver import FitResult

    def fn(sig_shard):
        r = impl(sig_shard)
        return r._replace(n_overflow=jax.lax.psum(r.n_overflow, VOXEL_AXIS))

    out_specs = FitResult(x=P(VOXEL_AXIS, None), fun=P(VOXEL_AXIS),
                          converged=P(VOXEL_AXIS), n_iter=P(VOXEL_AXIS),
                          n_overflow=P())
    sharded = jax.shard_map(fn, mesh=mesh, in_specs=(P(VOXEL_AXIS, None),),
                            out_specs=out_specs, check_vma=False)
    signal = shard_voxels(np.asarray(signal, np.float32), mesh)
    return sharded(signal)
