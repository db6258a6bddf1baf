"""Pallas MXU conv kernel for the space-to-depth U-Net path (TPU).

Why this exists (measured, examples/profile_unet.py): SynthSeg's level-0
convs run 24 channels at full resolution — 24 of the MXU's 128 output
lanes — and XLA's conv emitters deliver only 15-27 TF/s on them; at 160^3
they are ~30 ms of the forward's ~55 ms device time. The space-to-depth
transform (labels.unet3d) re-expresses level 0 exactly on a half-res grid
with 8x the channels (192), where a single matmul can reach MXU-class
rates — but XLA's conv emitter tops out ~35 TF/s even there. This module
is the hand-written kernel for that shape: the 2^3 VALID "S2D conv"
(unet3d._conv_s2d) as one im2col matmul per block, with bias, the
decoder's upsample-branch residual add, and the ELU fused into the
epilogue.

Matmul structure per output block: the 8 taps of the 2^3 VALID conv are
concatenated along the contraction axis — patches (M, 8C) @ weights
(8C, C') with M = block voxels, C = 8*c_in, C' = 8*c_out. At level 0 that
is (M, 1536) @ (1536, 192): full 128-lane contraction tiles, one MXU pass
per output tile, vs 27 scattered 24-lane passes for the dense 3^3 conv.
The S2D weight's structural zeros (27/64 of tap-slot pairs) waste 2.37x
FLOPs — accepted: 197/2.37 = 83 TF/s of USEFUL ceiling still towers over
the 15-27 TF/s the dense emitter achieves (see docs/VALIDATION.md).

Halo handling: grid blocks tile (z, y) of the coarse grid; each step needs
a (BZ+1, BY+1) in-form window for its (BZ, BY) output block. BlockSpec
blocks cannot overlap, so the input is passed FOUR times with different
block shapes/index maps (body block, z-halo row, y-halo column, corner)
and the window is assembled by concatenation in VMEM — Pallas's automatic
pipelining then double-buffers all four streams (the overlap re-fetch is
(BZ+1)(BY+1)/(BZ*BY) of the input bytes, ~1.3-2x; HBM time is minor next
to the matmul here).

Reference context: this serves the SynthSeg segmentation stage the
reference runs as a CPU subprocess (reference utils/qmri_utils.py:424-466).
Numerics are pinned against the XLA composition `_conv_s2d(_s2d_regrid(x))`
in tests/test_unet3d.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_taps(w2: np.ndarray) -> np.ndarray:
    """(2,2,2,C,C') S2D kernel (unet3d._s2d_kernel layout) -> (8C, C')
    matmul weight, rows tap-major (uz,uy,ux) with channel minor — the same
    order the kernel's im2col concatenates tap operands."""
    w2 = np.asarray(w2)
    kz, ky, kx, c_in, c_out = w2.shape
    if (kz, ky, kx) != (2, 2, 2):
        raise ValueError(f"expected a 2^3 S2D kernel, got {w2.shape}")
    return w2.reshape(8 * c_in, c_out)


def _pick_block(q: int, target: int) -> int:
    """Largest divisor of ``q`` that is <= target (>=1)."""
    for b in range(min(target, q), 0, -1):
        if q % b == 0:
            return b
    return 1


def _conv_kernel(xa, xb, xc, xd, w, b, out, *, bz, by, qx, act, res=None):
    """One (BZ, BY, Qx) output block: assemble the in-form window, im2col
    the 8 taps along the contraction axis, single MXU matmul, fused
    bias (+residual) + activation epilogue."""
    # window (BZ+1, BY+1, Qx+1, C) from the four non-overlapping streams
    top = jnp.concatenate([xa[...], xc[...]], axis=1)     # (BZ, BY+1, ..)
    bot = jnp.concatenate([xb[...], xd[...]], axis=1)     # (1,  BY+1, ..)
    win = jnp.concatenate([top, bot], axis=0)             # (BZ+1, BY+1, ..)
    m = bz * by * qx
    cols = [win[uz:uz + bz, uy:uy + by, ux:ux + qx, :].reshape(m, -1)
            for uz in (0, 1) for uy in (0, 1) for ux in (0, 1)]
    patches = jnp.concatenate(cols, axis=-1)              # (M, 8C)
    acc = jnp.dot(patches, w[...], preferred_element_type=jnp.float32)
    acc = acc + b[...].astype(jnp.float32)                # (M, C') + (1, C')
    if res is not None:
        acc = acc + res[...].reshape(m, -1).astype(jnp.float32)
    if act == "elu":
        # jax.nn.elu lowers to expm1, which Mosaic lacks; exp(x)-1 in fp32
        # loses nothing here (pre-activations are conv outputs, not
        # denormals, and the result is cast to compute_dtype anyway)
        acc = jnp.where(acc > 0, acc, jnp.exp(jnp.minimum(acc, 0.0)) - 1.0)
    out[...] = acc.reshape(out.shape).astype(out.dtype)


def conv_s2d(x_inform: jnp.ndarray, w_packed: jnp.ndarray, bias: jnp.ndarray,
             residual: Optional[jnp.ndarray] = None, *,
             activation: str = "elu", compute_dtype=jnp.bfloat16,
             block: "tuple[int, int] | None" = None,
             interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused S2D conv: in-form (Qz+1, Qy+1, Qx+1, C) -> out-form
    (Qz, Qy, Qx, C') with bias (+ optional pre-activation residual, e.g.
    the decoder's upsample branch) and ELU applied in the kernel.

    Exactly `unet3d._conv_s2d(x, w2, b)` (+residual, +activation) with
    w_packed = pack_taps(w2); accumulation is fp32 either way, only the
    tap summation order differs (one K-1536 dot vs two K-taps summed).
    ``interpret=None`` interprets on non-TPU backends (CPU tests).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    qz1, qy1, qx1, c = x_inform.shape
    qz, qy, qx = qz1 - 1, qy1 - 1, qx1 - 1
    c_out = w_packed.shape[-1]
    if w_packed.shape != (8 * c, c_out):
        raise ValueError(f"w_packed {w_packed.shape} != (8*{c}, c_out)")
    if block is None:
        # target: the (M, 8C) bf16 im2col buffer <= ~4 MB so window + out +
        # patches + accumulator sit well inside VMEM; BZ=2 halves the
        # z-halo re-fetch vs BZ=1
        bz = _pick_block(qz, 2)
        by = _pick_block(qy, max(1, 4 * 2 ** 20 // max(bz * qx * 8 * c * 2, 1)))
    else:
        bz, by = block
        if qz % bz or qy % by:
            raise ValueError(f"block {block} must divide coarse grid "
                             f"({qz}, {qy})")
    x_inform = x_inform.astype(compute_dtype)
    w_packed = w_packed.astype(compute_dtype)
    bias2 = bias.reshape(1, c_out).astype(jnp.float32)
    grid = (qz // bz, qy // by)

    in_specs = [
        # body / z-halo row / y-halo column / corner of the in-form window
        pl.BlockSpec((bz, by, qx1, c), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, by, qx1, c), lambda i, j, _bz=bz: ((i + 1) * _bz, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bz, 1, qx1, c), lambda i, j, _by=by: (i, (j + 1) * _by, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, qx1, c),
                     lambda i, j, _bz=bz, _by=by: ((i + 1) * _bz, (j + 1) * _by, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8 * c, c_out), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c_out), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x_inform, x_inform, x_inform, x_inform, w_packed, bias2]
    if residual is not None:
        if residual.shape != (qz, qy, qx, c_out):
            raise ValueError(f"residual {residual.shape} != "
                             f"{(qz, qy, qx, c_out)}")
        in_specs.append(pl.BlockSpec((bz, by, qx, c_out),
                                     lambda i, j: (i, j, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(residual.astype(compute_dtype))
        kernel = functools.partial(_res_kernel, bz=bz, by=by, qx=qx,
                                   act=activation)
    else:
        kernel = functools.partial(_conv_kernel, bz=bz, by=by, qx=qx,
                                   act=activation)

    flops = 2 * qz * qy * qx * 8 * c * c_out
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bz, by, qx, c_out), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qz, qy, qx, c_out), compute_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_inform.nbytes + qz * qy * qx * c_out * 2,
            transcendentals=qz * qy * qx * c_out if activation == "elu" else 0),
        interpret=interpret,
    )(*args)


def _res_kernel(xa, xb, xc, xd, w, b, res, out, *, bz, by, qx, act):
    _conv_kernel(xa, xb, xc, xd, w, b, out, bz=bz, by=by, qx=qx, act=act,
                 res=res)
