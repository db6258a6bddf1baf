"""Fully on-device masked volume fit: 4-D echo volume in, parameter maps out.

The host-orchestrated path (models.t2map.fit_stack) gathers masked voxels
with numpy, fits the batch, and scatters results back on host — fine for a
file pipeline, but a production/serving deployment wants the whole thing as
ONE jitted program: upload the echo volume once, compact the brain mask on
device, run the fused Pallas fit on the compacted batch, and scatter the
parameters into dense maps without anything crossing the host link.

Compaction is BLOCK-granular (``block`` consecutive flat voxels, default
32), not voxel-granular: XLA gathers/scatters on TPU serialize over update
rows, so moving 3M single-voxel rows costs hundreds of ms while moving the
~100K block rows that cover the same mask costs a few (measured on a 240^3
stack: 307 ms for the voxel-exact packed scatter vs ~10 ms block-wise; the
whole pipeline went 433 ms -> 92 ms). The price is fitting the unmasked
voxels of partially-masked blocks — ~15-30%% extra fit work for a smooth
brain mask — which the VPU-bound kernel wins back many times over. Their
results are zeroed on scatter, so the output contract is unchanged: maps
are 0 and converged is False outside the mask.

The block-buffer capacity is static (``mask_frac`` of the volume) so the
program has fixed shapes: a brain mask is ~10-20%% of a head FOV (the
reference fits only masked voxels for the same reason,
run_t2mapping.py:421). Masked blocks beyond capacity are left unfitted
(map = 0, converged = False) and their masked voxels counted in
``n_overflow``.

For LARGE mask fractions compaction stops paying: the gather/scatter rows
and the partition sort cost more than simply fitting every voxel of the
volume with trivially-convergent filler in the unmasked ones (the VARPRO
kernel fits ~400M voxels/s; gather+scatter move ~0.5 us per 32-voxel block
row). ``compact='auto'`` picks per model and mask_frac — measured at 240^3
on one v5e chip, the dense path wins above ~15%% mask for the gaussian
model (80 -> ~45 ms at a 22%% ellipsoid) while the ~8x-heavier 3-param
multistart kernels keep compaction until ~55%%. The dense path has no
capacity to overflow (n_overflow only reports inner straggler-budget
overflow, structurally 0 for the gaussian 'single' strategy).
"""

from __future__ import annotations

import functools
from math import gcd
from math import prod as np_prod
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from .pallas_fit import _fit_fused_impl, validate_fused_args
from .solver import _tail_partition


class VolumeFitResult(NamedTuple):
    t2: jax.Array          # (Z, Y, X) float32, 0 outside the mask
    k: jax.Array           # (Z, Y, X)
    sigma: jax.Array       # (Z, Y, X); zeros for the 2-param model
    fun: jax.Array         # (Z, Y, X) final objective
    converged: jax.Array   # (Z, Y, X) bool
    n_iter: jax.Array      # (Z, Y, X) int32
    n_masked: jax.Array    # () int32 — voxels selected by the mask
    n_overflow: jax.Array  # () int32 — masked voxels beyond capacity (unfitted)


@functools.partial(jax.jit, static_argnames=(
    "model", "te", "lo", "hi", "guess", "phase1_iters", "max_iters", "ftol",
    "gtol", "tail_frac", "no_prior", "mask_frac", "interpret", "strategy",
    "block", "tail_block", "compact", "prefix3", "varpro3"))
def _fit_volume_impl(signal, mask, *, model, te, lo, hi, guess, phase1_iters,
                     max_iters, ftol, gtol, tail_frac, no_prior, mask_frac,
                     interpret, strategy="single", block=32, tail_block=8,
                     compact=True, prefix3=0, varpro3=False):
    if not compact:
        return _fit_volume_dense(
            signal, mask, model=model, te=te, lo=lo, hi=hi, guess=guess,
            phase1_iters=phase1_iters, max_iters=max_iters, ftol=ftol,
            gtol=gtol, tail_frac=tail_frac, no_prior=no_prior,
            interpret=interpret, strategy=strategy, tail_block=tail_block,
            prefix3=prefix3, varpro3=varpro3)
    zyx = signal.shape[:3]
    n = zyx[0] * zyx[1] * zyx[2]
    t_axis = signal.shape[3]
    n_pad = -(-n // block) * block
    nb = n_pad // block
    flat_sig = signal.reshape(n, t_axis)
    sel = mask.reshape(n) > 0
    if n_pad != n:
        flat_sig = jnp.pad(flat_sig, ((0, n_pad - n), (0, 0)),
                           constant_values=1.0)
        sel = jnp.pad(sel, (0, n_pad - n))

    blk_cap = _block_capacity(n, mask_frac, block)
    blk_sel = sel.reshape(nb, block).any(axis=1)
    # _tail_partition compacts the UNCONVERGED; masked blocks play that role
    bidx, nb_sel = _tail_partition(~blk_sel, blk_cap)

    # block gather: rows of block*T contiguous floats, not single voxels
    batch = flat_sig.reshape(nb, block * t_axis)[bidx]
    mb = sel.reshape(nb, block)[bidx]                      # (blk_cap, block)
    batch = batch.reshape(blk_cap, block, t_axis)
    # Filler signal for unmasked voxels of kept blocks: their fit runs (and
    # is discarded), so it must be TRIVIALLY CONVERGENT — an exact in-bounds
    # decay at the (bound-clamped) initial guess converges in 1-2 Newton
    # steps. A constant (or zero: log(0) in the init) filler would never
    # converge under the 3-param models and starve the twophase
    # straggler-refit capacity that real masked voxels need.
    te_arr = jnp.asarray(te, jnp.float32)
    fk = min(max(guess[0], lo[0], 1.0), hi[0])
    ft2 = min(max(guess[1], lo[1], 1e-3), hi[1])
    filler = fk * jnp.exp(-te_arr / ft2)
    batch = jnp.where(mb[..., None], batch, filler).reshape(
        blk_cap * block, t_axis)

    res = _fit_fused_impl(
        batch, model=model, te=te, lo=lo, hi=hi, guess=guess,
        phase1_iters=phase1_iters, max_iters=max_iters, ftol=ftol, gtol=gtol,
        tail_frac=tail_frac, no_prior=no_prior, interpret=interpret,
        strategy=strategy, tail_block=tail_block, prefix3=prefix3,
        varpro3=varpro3)

    valid_blk = jnp.arange(blk_cap) < nb_sel
    safe_bidx = jnp.where(valid_blk, bidx, nb)             # nb -> dropped

    # ONE packed block scatter builds all six maps; each update row carries
    # a whole block (block*6 floats), so row count is ~1/block of the
    # voxel-exact scatter that TPUs serialize over
    p = res.x.shape[1]
    sigma = (res.x[:, 2] if p == 3 else jnp.zeros_like(res.x[:, 0]))
    upd = jnp.stack([res.x[:, 1], res.x[:, 0], sigma, res.fun,
                     res.converged.astype(jnp.float32),
                     res.n_iter.astype(jnp.float32)], axis=1)
    keep = (mb & valid_blk[:, None]).reshape(blk_cap * block, 1)
    upd = jnp.where(keep, upd, 0.0).reshape(blk_cap, block * 6)
    dense = jnp.zeros((nb, block * 6), jnp.float32).at[safe_bidx].set(
        upd, mode="drop").reshape(nb, block, 6)

    def chan(c):
        # slice a map out of the block layout (no (n, 6) relayout pass)
        return dense[:, :, c].reshape(n_pad)[:n].reshape(zyx)

    n_masked = jnp.sum(sel.astype(jnp.int32))
    n_fitted = jnp.sum((mb & valid_blk[:, None]).astype(jnp.int32))
    # two overflow sources, both REPORTED: masked voxels in blocks beyond
    # the compaction capacity, plus batch voxels the inner twophase
    # straggler-refit rounds could not cover (res.n_overflow; fillers are
    # trivially convergent so in practice these are real voxels)
    return VolumeFitResult(
        t2=chan(0),
        k=chan(1),
        sigma=chan(2),
        fun=chan(3),
        converged=chan(4) > 0.5,
        n_iter=chan(5).astype(jnp.int32),
        n_masked=n_masked,
        n_overflow=n_masked - n_fitted + res.n_overflow,
    )


def _fit_volume_dense(signal, mask, *, model, te, lo, hi, guess, phase1_iters,
                      max_iters, ftol, gtol, tail_frac, no_prior, interpret,
                      strategy, tail_block, prefix3=0, varpro3=False):
    """No-compaction volume fit: every voxel goes through the fused kernel,
    unmasked voxels carry trivially-convergent filler (an exact in-bounds
    decay at the clamped initial guess — converges in 1-2 Newton steps, so
    blocks of filler exit their VMEM while_loop immediately). No partition
    sort, no gather, no scatter: results come back in voxel order and the
    maps are plain reshapes with the mask zeroing applied elementwise. The
    per-voxel fit results are IDENTICAL to the compacted path's (each
    voxel's Newton sequence depends only on its own signal; block early
    exit changes scheduling, never iterates)."""
    zyx = signal.shape[:3]
    n = zyx[0] * zyx[1] * zyx[2]
    t_axis = signal.shape[3]
    flat_sig = signal.reshape(n, t_axis)
    sel = mask.reshape(n) > 0
    te_arr = jnp.asarray(te, jnp.float32)
    fk = min(max(guess[0], lo[0], 1.0), hi[0])
    ft2 = min(max(guess[1], lo[1], 1e-3), hi[1])
    filler = fk * jnp.exp(-te_arr / ft2)
    batch = jnp.where(sel[:, None], flat_sig, filler)

    res = _fit_fused_impl(
        batch, model=model, te=te, lo=lo, hi=hi, guess=guess,
        phase1_iters=phase1_iters, max_iters=max_iters, ftol=ftol, gtol=gtol,
        tail_frac=tail_frac, no_prior=no_prior, interpret=interpret,
        strategy=strategy, tail_block=tail_block, prefix3=prefix3,
        varpro3=varpro3)

    p = res.x.shape[1]
    sigma = (res.x[:, 2] if p == 3 else jnp.zeros_like(res.x[:, 0]))
    selz = sel.reshape(zyx)
    chan = lambda v: jnp.where(selz, v.reshape(zyx), 0.0)
    return VolumeFitResult(
        t2=chan(res.x[:, 1]),
        k=chan(res.x[:, 0]),
        sigma=chan(sigma),
        fun=chan(res.fun),
        converged=(res.converged.reshape(zyx) & selz),
        n_iter=jnp.where(selz, res.n_iter.reshape(zyx), 0).astype(jnp.int32),
        n_masked=jnp.sum(sel.astype(jnp.int32)),
        # no capacity to overflow; filler voxels are trivially convergent,
        # so inner straggler-budget overflow (twophase only) is real voxels
        n_overflow=res.n_overflow,
    )


# Measured dense-vs-compact crossovers (240^3, one v5e chip): the compacted
# path costs ~3.7 ms partition sort + ~0.5 us of gather+scatter rows per
# 32-voxel block, the dense path costs the kernel's per-voxel fit on the
# whole FOV (~2.5 ns gaussian, ~19 ns for the 3-start multistart models).
# Equating the two puts the gaussian crossover near mask_frac 0.12-0.15 and
# the 3-param MULTISTART models near 0.5. The round-5 VARPRO
# gaussian_rician kernel is ~2.4x faster per voxel (~8 ns), which drops its
# crossover: the driver bench row times BOTH layouts at mask_frac 0.30 and
# measured dense 90.0 ms vs compacted 98.2 ms — fitting the linear cost
# model through that point puts the crossover near 0.2.
_DENSE_CROSSOVER_FRAC = {"gaussian": 0.15}
_DENSE_CROSSOVER_DEFAULT = 0.55
_DENSE_CROSSOVER_VARPRO_GR = 0.20


def resolve_compact(compact, model: str, mask_frac: float,
                    varpro3=None) -> bool:
    """Resolve the fit_volume ``compact`` knob ('auto' | bool) -> bool.

    ``varpro3`` mirrors fit_volume's knob (None = env/default): the VARPRO
    gaussian_rician kernel has its own, lower dense crossover."""
    if compact == "auto":
        from .pallas_fit import resolve_varpro3

        if model == "gaussian_rician" and resolve_varpro3(varpro3, model):
            cross = _DENSE_CROSSOVER_VARPRO_GR
        else:
            cross = _DENSE_CROSSOVER_FRAC.get(model, _DENSE_CROSSOVER_DEFAULT)
        return float(mask_frac) < cross
    if isinstance(compact, bool):
        return compact
    raise ValueError(f"compact must be 'auto' or a bool; got {compact!r}")


def _capacity(n: int, mask_frac: float) -> int:
    """Masked-voxel budget: int(n*mask_frac) rounded UP to a multiple of 128
    (lane width). Rounding down would make some masks uncoverable at any
    mask_frac <= 1 (e.g. n_masked > n//128*128)."""
    return max(128, -(-int(n * float(mask_frac)) // 128) * 128)


def _block_capacity(n: int, mask_frac: float, block: int) -> int:
    """Block-buffer size: enough ``block``-voxel blocks to hold the voxel
    budget, rounded so blk_cap*block stays a multiple of 128 (the fused
    kernel's batch granularity)."""
    cap_vox = _capacity(n, mask_frac)
    blk_cap = -(-cap_vox // block)
    quantum = 128 // gcd(block, 128)
    return -(-blk_cap // quantum) * quantum


@functools.partial(jax.jit, static_argnames=("n", "block"))
def _count_touched_blocks(mask, n: int, block: int):
    flat = mask.reshape(n) > 0
    n_pad = -(-n // block) * block
    if n_pad != n:
        flat = jnp.pad(flat, (0, n_pad - n))
    return jnp.sum(flat.reshape(n_pad // block, block).any(axis=1)
                   .astype(jnp.int32))


def _min_mask_frac(n: int, n_blocks: int, block: int) -> float:
    """Smallest mask_frac whose _block_capacity covers ``n_blocks`` blocks —
    the naive n_masked/n undercounts because capacity is consumed by whole
    blocks, not voxels (ADVICE r1)."""
    needed = -(-n_blocks * block // 128) * 128
    frac = min(needed / n, 1.0)
    assert _block_capacity(n, frac, block) * block >= min(needed,
                                                          n_blocks * block)
    return frac


def fit_volume(signal, mask, te, lo, hi, *, model: str = "gaussian",
               guess: Sequence[float] | None = None, phase1_iters: int = 10,
               max_iters: int = 60, ftol: float = 1e-9, gtol: float = 0.0,
               tail_frac: float | None = None, no_prior: bool = False,
               mask_frac: float = 0.25, block: int = 32,
               interpret: bool | None = None,
               strategy: str = "auto",
               compact: "str | bool" = "auto",
               check_capacity: bool = True,
               prefix3: "int | None" = None,
               varpro3: "bool | None" = None) -> VolumeFitResult:
    """Fit every masked voxel of a (Z, Y, X, T) echo volume on device.

    One jitted program: device block-granular mask compaction -> fused
    Pallas fit -> dense-map block scatter. Nothing crosses the host link
    except the inputs and whatever maps the caller chooses to download.

    Args:
        signal: (Z, Y, X, T) float32 echo volume (device or host array).
        mask: (Z, Y, X) boolean / {0,1} mask.
        te / lo / hi / model / guess / no_prior: as in pallas_fit.fit_fused.
        mask_frac: static capacity for the masked-block buffer as a fraction
            of the volume (brain masks are typically 0.1-0.2 of a head FOV).
            Partially-masked blocks consume whole-block capacity, so budget
            ~1.1-1.5x the exact masked fraction depending on mask smoothness
            (the under-capacity warning computes the exact requirement).
        block: compaction granularity in flat voxels (default 32). 1 gives
            voxel-exact compaction (slow scatters — see module docstring);
            larger blocks trade fit work on partially-masked blocks for
            fewer, wider gather/scatter rows.
        compact: 'auto' (default) | bool. False fits EVERY voxel with
            trivially-convergent filler outside the mask — no partition
            sort, gather or scatter, no capacity to overflow. 'auto' picks
            the dense path when ``mask_frac`` is above the measured
            crossover for the model (see resolve_compact; ~0.15 for
            gaussian, ~0.2 for the VARPRO gaussian_rician kernel, ~0.55
            for the 3-param multistart kernels). Per-voxel results are
            identical either way.
        check_capacity: eagerly count the touched blocks and warn before
            launching if the mask exceeds capacity (one extra dispatch + a
            4-byte host sync). Pipelined serving loops can pass False to
            keep dispatch fully async and watch ``result.n_overflow``.
            Compacted path only (the dense path has no capacity).

    Returns:
        VolumeFitResult of dense device maps + (n_masked, n_overflow).
    """
    te_t, lo_t, hi_t, guess_t = validate_fused_args(model, te, lo, hi, guess,
                                                    no_prior)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if block < 1:
        raise ValueError(f"block must be >= 1; got {block}")
    signal = jnp.asarray(signal, jnp.float32)
    if signal.ndim != 4:
        raise ValueError(f"signal must be (Z, Y, X, T); got {signal.shape}")
    mask = jnp.asarray(mask)
    if mask.shape != signal.shape[:3]:
        raise ValueError(f"mask {mask.shape} != volume grid {signal.shape[:3]}")
    n = int(np_prod(signal.shape[:3]))
    n_pad = -(-n // block) * block
    blk_cap = _block_capacity(n, mask_frac, block)
    compact = resolve_compact(compact, model, mask_frac, varpro3)
    if check_capacity and compact:
        # one fused dispatch + a 4-byte sync; cheap vs a silent underfit.
        # The sync serializes the caller on the previous program, so
        # latency-critical pipelined serving loops can pass
        # check_capacity=False and watch result.n_overflow instead.
        n_blocks = int(_count_touched_blocks(mask, n, block))
        if n_blocks > blk_cap:
            import warnings

            warnings.warn(
                f"mask touches {n_blocks} blocks of {block} voxels but "
                f"mask_frac={mask_frac} caps the fit buffer at {blk_cap} "
                f"blocks: masked voxels in {n_blocks - blk_cap} blocks will "
                f"be left unfitted (n_overflow); raise mask_frac to "
                f">= {_min_mask_frac(n, n_blocks, block):.6f}", stacklevel=2)
    from .pallas_fit import (resolve_prefix3, resolve_strategy,
                             resolve_tail_block, resolve_tail_frac,
                             resolve_varpro3)

    tail_block = resolve_tail_block(None, model)
    prefix3 = resolve_prefix3(prefix3, max_iters)
    varpro3 = resolve_varpro3(varpro3, model)
    return _fit_volume_impl(
        signal, mask, model=model, te=te_t, lo=lo_t, hi=hi_t, guess=guess_t,
        phase1_iters=phase1_iters, max_iters=max_iters, ftol=ftol, gtol=gtol,
        tail_frac=resolve_tail_frac(tail_frac, tail_block),
        no_prior=no_prior, mask_frac=float(mask_frac),
        interpret=bool(interpret), block=int(block), tail_block=tail_block,
        strategy=resolve_strategy(strategy, phase1_iters, max_iters, model,
                                  prefix3, varpro3),
        compact=compact, prefix3=prefix3, varpro3=varpro3)
