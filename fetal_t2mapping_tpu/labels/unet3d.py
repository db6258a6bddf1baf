"""TPU-native 3-D U-Net inference for brain segmentation (SynthSeg topology).

The reference's segmentation step is FreeSurfer's ``mri_synthseg`` binary —
a pretrained 3-D U-Net run on CPU under GNU parallel (reference
utils/qmri_utils.py:424-466, '2 cores already use 80% of the memory').
This module provides the same network as pure JAX so the forward pass runs
on the TPU's MXU instead: SynthSeg's published topology (Billot et al. 2023:
5 resolution levels, 2 conv(3^3)+ELU per level, 24 features doubling per
level, linear upsampling decoder with skip concatenation, softmax over the
segmentation labels) with weights loadable from an .npz manifest converted
from the released model.

No weights ship in-repo (the CNN is ~100 MB and externally licensed);
convert the released Keras file with ``labels.convert_synthseg``::

    python -m fetal_t2mapping_tpu.labels.convert_synthseg \
        $FREESURFER_HOME/models/synthseg_1.0.h5 synthseg_1.0.npz

and point FT2_SYNTHSEG_WEIGHTS (or SynthSegRunner(weights=...)) at the
manifest. The conversion + forward pass are numerically pinned against an
independent PyTorch implementation on a Keras-layout fixture
(tests/test_synthseg_weights.py); the architecture is inferred from the
weight shapes (config_from_params), so distilled/truncated weight sets run
unchanged. Convention note: the decoder concatenates [skip, upsampled]
(channel order matters to the dec-conv input slices); if a converted model
segments as noise, the source model likely used the reverse order — flip
the blocks of the dec*_0 kernels' input axis.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# SynthSeg's output label numbering (FreeSurfer aseg ids) — the FeTA remap
# in labels.feta consumes these.
SYNTHSEG_LABELS: Tuple[int, ...] = (
    0, 2, 3, 4, 5, 7, 8, 10, 11, 12, 13, 14, 15, 16, 17, 18, 24, 26, 28,
    41, 42, 43, 44, 46, 47, 49, 50, 51, 52, 53, 54, 58, 60,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    n_levels: int = 5
    n_conv_per_level: int = 2
    base_features: int = 24
    kernel: int = 3
    n_labels: int = len(SYNTHSEG_LABELS)
    # SynthSeg trains its U-Net with batch_norm=-1 (one BatchNormalization
    # per level, after the level's convs: neuron's conv_enc/conv_dec name
    # them unet_bn_down_{lvl} / unet_bn_up_{lvl}), so the RELEASED weight
    # files carry BN statistics. At inference BN is a per-channel affine;
    # the converter folds (gamma, beta, mean, var) into scale/shift vectors
    # bn_down{lvl}_s/_b and bn_up{lvl}_s/_b applied after each level's
    # conv+ELU stack (encoder: before the skip capture and maxpool;
    # decoder: before the next upsample / the likelihood head).
    batch_norm: bool = False

    @property
    def divisor(self) -> int:
        return 2 ** (self.n_levels - 1)


def _conv_shapes(cfg: UNetConfig) -> List[Tuple[str, int, int]]:
    """(name, c_in, c_out) for every conv layer, encoder then decoder."""
    shapes = []
    feats = [cfg.base_features * 2 ** lv for lv in range(cfg.n_levels)]
    c_in = 1
    for lv in range(cfg.n_levels):
        for i in range(cfg.n_conv_per_level):
            c_out = feats[lv]
            shapes.append((f"enc{lv}_{i}", c_in, c_out))
            c_in = c_out
    for lv in range(cfg.n_levels - 2, -1, -1):
        c_in = c_in + feats[lv]          # skip concatenation
        for i in range(cfg.n_conv_per_level):
            c_out = feats[lv]
            shapes.append((f"dec{lv}_{i}", c_in, c_out))
            c_in = c_out
    shapes.append(("head", c_in, cfg.n_labels))
    return shapes


def _bn_shapes(cfg: UNetConfig) -> List[Tuple[str, int]]:
    """(name, channels) for every per-level folded BN affine (if any)."""
    if not cfg.batch_norm:
        return []
    feats = [cfg.base_features * 2 ** lv for lv in range(cfg.n_levels)]
    shapes = [(f"bn_down{lv}", feats[lv]) for lv in range(cfg.n_levels)]
    shapes += [(f"bn_up{lv}", feats[lv]) for lv in range(cfg.n_levels - 2, -1, -1)]
    return shapes


def random_params(cfg: UNetConfig = UNetConfig(), seed: int = 0) -> Dict[str, np.ndarray]:
    """He-initialized parameter tree with the exact shapes real weights need."""
    rng = np.random.default_rng(seed)
    params: Dict[str, np.ndarray] = {}
    for name, c_in, c_out in _conv_shapes(cfg):
        k = 1 if name == "head" else cfg.kernel
        fan_in = c_in * k ** 3
        params[name + "_w"] = rng.normal(
            0, np.sqrt(2.0 / fan_in), (k, k, k, c_in, c_out)).astype(np.float32)
        params[name + "_b"] = np.zeros(c_out, np.float32)
    for name, c in _bn_shapes(cfg):
        params[name + "_s"] = (1.0 + rng.normal(0, 0.05, c)).astype(np.float32)
        params[name + "_b"] = rng.normal(0, 0.05, c).astype(np.float32)
    return params


def load_params(path: str) -> Dict[str, np.ndarray]:
    """Load a converted-weights .npz manifest (keys as in random_params)."""
    with np.load(path) as z:
        return {k: np.asarray(z[k], np.float32) for k in z.files}


def config_from_params(params: Dict[str, np.ndarray]) -> UNetConfig:
    """Infer the architecture a parameter tree implies (shapes are the
    source of truth: converted real weights and test fixtures may differ
    from the published 5-level/24-feature model)."""
    enc_levels = set()
    convs = set()
    for k in params:
        if k.startswith("enc") and k.endswith("_w"):
            lv, i = k[3:-2].split("_")
            enc_levels.add(int(lv))
            convs.add(int(i))
    if not enc_levels or "head_w" not in params:
        raise ValueError("parameter tree lacks enc*/head conv weights")
    return UNetConfig(
        n_levels=max(enc_levels) + 1,
        n_conv_per_level=max(convs) + 1,
        base_features=int(params["enc0_0_w"].shape[-1]),
        kernel=int(params["enc0_0_w"].shape[0]),
        n_labels=int(params["head_w"].shape[-1]),
        batch_norm=any(k.startswith("bn_") for k in params),
    )


def validate_params(params: Dict[str, np.ndarray], cfg: UNetConfig) -> None:
    """Raise unless every conv weight/bias matches the cfg's exact shapes."""
    expect = {}
    for name, c_in, c_out in _conv_shapes(cfg):
        k = 1 if name == "head" else cfg.kernel
        expect[name + "_w"] = (k, k, k, c_in, c_out)
        expect[name + "_b"] = (c_out,)
    for name, c in _bn_shapes(cfg):
        expect[name + "_s"] = (c,)
        expect[name + "_b"] = (c,)
    missing = sorted(set(expect) - set(params))
    extra = sorted(set(params) - set(expect))
    if missing or extra:
        raise ValueError(f"parameter tree mismatch: missing={missing} extra={extra}")
    for k, shape in expect.items():
        if tuple(params[k].shape) != shape:
            raise ValueError(f"{k}: shape {tuple(params[k].shape)} != expected {shape}")


def _conv(x, w, b, compute_dtype=jnp.float32):
    """3-D conv, NDHWC, SAME, decomposed over the z taps into z-batched
    2-D convs (XLA's TPU 2D conv emitter consistently outruns its 3D one
    at these shapes — measured 1.1-1.5x across every layer of this
    network; the sum is exact, only fp32 accumulation order changes).

    ``compute_dtype=bfloat16`` keeps ACTIVATIONS in the MXU's native bf16
    input precision while ACCUMULATING in fp32 (preferred_element_type);
    callers then cast the post-activation tensor back to compute_dtype, so
    inter-layer HBM traffic halves (the actual bottleneck at these small
    channel counts — measured: bf16 inputs with fp32 activations were
    SLOWER than pure fp32 from the extra cast traffic). The class decision
    is an argmax over well-separated logits, so bf16 mantissa loss only
    matters at decision boundaries (validated against fp32 in tests)."""
    x = x.astype(compute_dtype)
    w = w.astype(compute_dtype)
    n, d, h, wd, ci = x.shape
    kz = w.shape[0]
    if kz % 2 == 0:
        # even kernels pad SAME asymmetrically; keep XLA's 3D semantics
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        return out + b
    xp = jnp.pad(x, ((0, 0), (kz // 2, kz // 2), (0, 0), (0, 0), (0, 0)))
    out = None
    for t in range(kz):
        y = jax.lax.conv_general_dilated(
            xp[:, t:t + d].reshape(n * d, h, wd, ci), w[t],
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        out = y if out is None else out + y
    return out.reshape(n, d, h, wd, -1) + b


def _bn(x, params, name, cfg, compute_dtype=jnp.float32):
    """Folded inference-time batch norm: per-channel x*s + b (no-op unless
    cfg.batch_norm). s/b stay fp32; the result is cast back to the
    activation dtype so inter-layer HBM traffic is unchanged."""
    if not cfg.batch_norm:
        return x
    return (x * params[name + "_s"] + params[name + "_b"]).astype(compute_dtype)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID")


def _upsample2(x):
    n, d, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :, None, :],
                         (n, d, 2, h, 2, w, 2, c))
    return x.reshape(n, 2 * d, 2 * h, 2 * w, c)


def unet_apply(params: Dict, x: jnp.ndarray, cfg: UNetConfig = UNetConfig(),
               compute_dtype=jnp.float32):
    """Forward pass: (N, D, H, W, 1) float32 -> (N, D, H, W, n_labels) logits.

    D/H/W must be multiples of cfg.divisor (use pad_to_divisor).
    ``compute_dtype=jnp.bfloat16`` runs the convs at the MXU's native
    bf16 input precision with fp32 accumulation (see _conv)."""
    skips = []
    for lv in range(cfg.n_levels):
        for i in range(cfg.n_conv_per_level):
            x = jax.nn.elu(_conv(x, params[f"enc{lv}_{i}_w"],
                                 params[f"enc{lv}_{i}_b"], compute_dtype)
                           ).astype(compute_dtype)
        x = _bn(x, params, f"bn_down{lv}", cfg, compute_dtype)
        if lv < cfg.n_levels - 1:
            skips.append(x)
            x = _maxpool2(x)
    for lv in range(cfg.n_levels - 2, -1, -1):
        x = _upsample2(x)
        x = jnp.concatenate([skips[lv], x], axis=-1)
        for i in range(cfg.n_conv_per_level):
            x = jax.nn.elu(_conv(x, params[f"dec{lv}_{i}_w"],
                                 params[f"dec{lv}_{i}_b"], compute_dtype)
                           ).astype(compute_dtype)
        x = _bn(x, params, f"bn_up{lv}", cfg, compute_dtype)
    return _conv(x, params["head_w"], params["head_b"], compute_dtype)


# ---------------------------------------------------------------------------
# Space-to-depth level 0 — exact transform, MXU-friendly channel counts.
#
# SynthSeg's first level runs 3^3 convs with 24 channels at full resolution:
# at 160^3 that is ~60% of the whole forward pass, and 24 channels uses a
# sliver of the MXU's 128-wide lanes (measured 5.4 TF/s vs 24.6 TF/s for the
# same math expressed at 192 channels). The transform below rewrites level 0
# EXACTLY (same outputs, reordered) on a half-resolution grid with 8x the
# channels:
#
# * "in-form" tensor on a (D/2+1)^3 grid, slot (r in {0,1}^3) of cell q
#   holding the dense voxel x[2q + r - 1] (one voxel of zero padding in
#   front, matching the original conv's SAME zeros). A single 2^3 VALID
#   conv over this grid reaches dense taps 2u + r_in - 1 for u in {0,1},
#   i.e. every offset t = 2u + r_in - 1 - r_out in {-1,0,1} that the
#   original 3^3 SAME conv uses, for BOTH output sub-positions r_out.
# * "out-form" tensor on a (D/2)^3 grid, slot r of cell q = y[2q + r]:
#   what the 2^3 VALID conv produces. Its 8 slots per cell are exactly the
#   2x2x2 maxpool block, so pooling to level 1 is a free slot-axis max;
#   converting back to in-form for the next conv (_s2d_regrid) is a pure
#   pad/slice transpose, and the level-1 decoder output enters S2D space
#   through an upsample-folded coarse kernel (_fold_upsample_kernel) —
#   the 2x upsample never materializes.
#
# The weight transform (_s2d_kernel) scatters the 27 original taps into a
# 2^3 x (8 c_in) x (8 c_out) kernel (27/64 nonzero). That is 2.37x the
# FLOPs at a much higher MXU rate: each transformed conv runs ~1.5x
# faster than its dense zdec equivalent standalone (10.0 vs 15.6 ms for
# the 24-channel conv at 160^3). In the FULL network, however, XLA fuses
# the dense conv+ELU+cast chains well enough that the dense program wins
# (61 vs 66 ms at 160^3 on TPU v5e) — so this path is selectable
# (segment_volume(use_s2d=True) / FT2_UNET_S2D=1) rather than default,
# for hardware where the conv-emitter tradeoff tips the other way.
# Numerics pinned against unet_apply in tests/test_unet3d.py.
# ---------------------------------------------------------------------------


def _s2d_kernel(w: np.ndarray) -> np.ndarray:
    """Exact S2D transform of a 3^3 stride-1 SAME conv kernel.

    (3,3,3,ci,co) -> (2,2,2,8ci,8co) operating on in-form input and
    producing out-form output (channel slots ordered (rz,ry,rx) with the
    original channel minor)."""
    w = np.asarray(w)
    if w.shape[:3] != (3, 3, 3):
        raise ValueError(f"S2D transform needs a 3^3 kernel, got {w.shape}")
    ci, co = w.shape[3:]
    out = np.zeros((2, 2, 2, 8 * ci, 8 * co), w.dtype)
    subs = [(a, b, c) for a in range(2) for b in range(2) for c in range(2)]
    for uz, uy, ux in subs:                      # in-form cell offset
        for si, (riz, riy, rix) in enumerate(subs):      # input sub-slot
            for so, (roz, roy, rox) in enumerate(subs):  # output sub-slot
                tz = 2 * uz + riz - 1 - roz
                ty = 2 * uy + riy - 1 - roy
                tx = 2 * ux + rix - 1 - rox
                if max(abs(tz), abs(ty), abs(tx)) <= 1:
                    out[uz, uy, ux,
                        si * ci:(si + 1) * ci,
                        so * co:(so + 1) * co] = w[tz + 1, ty + 1, tx + 1]
    return out


# Folding the 2x nearest upsample into dec0_0's up-branch: the upsampled
# tensor is piecewise constant (up[j] = z[j//2]), so the dense 3-tap conv
# over it collapses, per output sub-position r, onto 2 coarse taps:
#   y[2q+0] = z[q-1] W[-1] + z[q] (W[0]+W[1])
#   y[2q+1] = z[q]  (W[-1]+W[0]) + z[q+1] W[1]
# _UP_FOLD[r, v, t] selects which dense taps t feed coarse tap v-1 for
# sub-position r; the union window is 3 coarse taps, so the folded kernel
# is one 3^3 SAME conv on the coarse grid with c_up inputs and 8*c0
# outputs — 2.4x fewer FLOPs than running that branch in S2D form.
_UP_FOLD = np.array([[[1, 0, 0], [0, 1, 1], [0, 0, 0]],
                     [[0, 0, 0], [1, 1, 0], [0, 0, 1]]], np.float32)


def _fold_upsample_kernel(w_up: np.ndarray) -> np.ndarray:
    """(3,3,3,c_up,c0) dense kernel acting on upsample(z) -> (3,3,3,c_up,8c0)
    coarse-grid kernel producing the out-form directly (slot-major output
    channels, matching _s2d_kernel's layout)."""
    w_up = np.asarray(w_up)
    c_up, c0 = w_up.shape[3:]
    out = np.zeros((3, 3, 3, c_up, 8 * c0), w_up.dtype)
    subs = [(a, b, c) for a in range(2) for b in range(2) for c in range(2)]
    for so, (rz, ry, rx) in enumerate(subs):
        folded = np.einsum("vt,wu,xs,tusio->vwxio",
                           _UP_FOLD[rz], _UP_FOLD[ry], _UP_FOLD[rx],
                           w_up.astype(np.float32)).astype(w_up.dtype)
        out[..., so * c0:(so + 1) * c0] = folded
    return out


def s2d_level0_params(params: Dict, cfg: UNetConfig) -> Dict[str, np.ndarray]:
    """Transform every level-0 conv weight/bias into S2D form (host-side,
    once per model). enc0_* and dec0_{i>=1} become 2^3 in-form kernels
    ((2,2,2,8ci,8co), bias (8co,)); dec0_0 splits into a skip-branch S2D
    kernel and an upsample-folded coarse kernel (see _fold_upsample_kernel)."""
    out: Dict[str, np.ndarray] = {}
    c0 = cfg.base_features
    for i in range(cfg.n_conv_per_level):
        out[f"enc0_{i}_w"] = _s2d_kernel(np.asarray(params[f"enc0_{i}_w"]))
        out[f"enc0_{i}_b"] = np.tile(np.asarray(params[f"enc0_{i}_b"]), 8)
        w = np.asarray(params[f"dec0_{i}_w"])
        out[f"dec0_{i}_b"] = np.tile(np.asarray(params[f"dec0_{i}_b"]), 8)
        if i == 0:
            # dense input is concat([skip (c0), upsampled (c_up)])
            out["dec0_0_skip_w"] = _s2d_kernel(w[:, :, :, :c0, :])
            out["dec0_0_up_w"] = _fold_upsample_kernel(w[:, :, :, c0:, :])
        else:
            out[f"dec0_{i}_w"] = _s2d_kernel(w)
    if cfg.batch_norm:
        # per-level folded BN affines on out-form tensors: slot-major
        # channel layout (slot*c0 + c), so the per-channel vectors tile x8
        for name in ("bn_down0", "bn_up0"):
            out[name + "_s"] = np.tile(np.asarray(params[name + "_s"]), 8)
            out[name + "_b"] = np.tile(np.asarray(params[name + "_b"]), 8)
    return out


def _s2d_in(x):
    """Dense (N, D, H, W, C) -> in-form (N, D/2+1, H/2+1, W/2+1, 8C).

    Slot (rz,ry,rx) of cell q holds x[2q + r - 1] (zeros beyond the
    volume, matching SAME conv padding)."""
    n, d, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    xp = xp.reshape(n, (d + 2) // 2, 2, (h + 2) // 2, 2, (w + 2) // 2, 2, c)
    xp = xp.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return xp.reshape(n, (d + 2) // 2, (h + 2) // 2, (w + 2) // 2, 8 * c)


def _s2d_regrid(y):
    """Out-form (N, Q, Q, Q, 8C) -> in-form (N, Q+1, Q+1, Q+1, 8C).

    Out-form slot r of cell q is y[2q+r]; in-form slot r of cell q is
    y[2q+r-1] — per dimension, slot 0 is the previous cell's slot 1 and
    slot 1 is this cell's slot 0 (zeros at the borders)."""
    n, qz, qy, qx, c8 = y.shape
    c = c8 // 8
    y = y.reshape(n, qz, qy, qx, 2, 2, 2, c)
    y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (1, 1),
                    (0, 0), (0, 0), (0, 0), (0, 0)))
    y = jnp.stack([y[:, r:r + qz + 1, :, :, 1 - r] for r in range(2)], axis=4)
    y = jnp.stack([y[:, :, r:r + qy + 1, :, :, 1 - r] for r in range(2)], axis=5)
    y = jnp.stack([y[:, :, :, r:r + qx + 1, :, :, 1 - r] for r in range(2)], axis=6)
    return y.reshape(n, qz + 1, qy + 1, qx + 1, c8)


def _conv_s2d(x, w, b, compute_dtype=jnp.float32):
    """2^3 VALID conv: in-form (N,Q+1,..,8ci) -> out-form (N,Q,..,8co).

    Decomposed over the z taps into two z-batched 2D convs summed —
    XLA's TPU 2D conv emitter runs these ~35 TF/s vs ~27 TF/s for the
    equivalent 3D conv at S2D channel counts (measured at 192ch/80^3)."""
    n, qz1, qy1, qx1, ci = x.shape
    qz = qz1 - 1
    x = x.astype(compute_dtype)
    w = w.astype(compute_dtype)

    def tap(v, wk):
        y = jax.lax.conv_general_dilated(
            v.reshape(n * qz, qy1, qx1, ci), wk,
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return y.reshape(n, qz, qy1 - 1, qx1 - 1, y.shape[-1])

    return tap(x[:, :qz], w[0]) + tap(x[:, 1:], w[1]) + b


def unet_apply_s2d(params: Dict, s2d_params: Dict, x: jnp.ndarray,
                   cfg: UNetConfig = UNetConfig(),
                   compute_dtype=jnp.float32, return_logits: bool = False,
                   conv_impl: str = "xla"):
    """Forward pass with level 0 in space-to-depth form — exactly the same
    network as unet_apply (same weights, reordered); see the block comment
    above for when this wins. Returns per-voxel class indices
    (N, D, H, W) int32 (argmax happens in out-form, before the
    depth-to-space).

    ``s2d_params`` is s2d_level0_params(params, cfg); ``params`` still
    provides the mid-level (1..n-1) weights and the 1^3 head.

    ``conv_impl='pallas'`` runs every 192-channel S2D conv through the
    fused Pallas MXU kernel (labels.pallas_conv: im2col matmul with the
    regrid-consuming window, bias + decoder residual + ELU in the
    epilogue); 'xla' uses the z-decomposed conv emitter. Same math either
    way (fp32 accumulation; tap-summation order differs)."""
    if cfg.n_levels < 2 or cfg.kernel != 3:
        raise ValueError("S2D path needs n_levels >= 2 and 3^3 kernels")
    if conv_impl not in ("xla", "pallas"):
        raise ValueError(f"conv_impl must be 'xla'|'pallas', got {conv_impl!r}")
    n, d, h, w, _ = x.shape
    if conv_impl == "pallas" and n != 1:
        raise ValueError("conv_impl='pallas' supports a single volume (N=1)")

    def s2d_conv_elu(t_inform, wkey, bkey, residual=None):
        """ELU(S2D-conv(t) [+ residual]) via the selected implementation;
        t_inform is batched in-form, residual batched out-form fp32."""
        if conv_impl == "pallas":
            from .pallas_conv import conv_s2d

            w2 = s2d_params[wkey]
            packed = w2.reshape(w2.shape[0] * w2.shape[1] * w2.shape[2]
                                * w2.shape[3], w2.shape[4])
            res0 = None if residual is None else residual[0]
            out = conv_s2d(t_inform[0], packed, s2d_params[bkey],
                           residual=res0, activation="elu",
                           compute_dtype=compute_dtype)
            return out[None]
        pre = _conv_s2d(t_inform, s2d_params[wkey], s2d_params[bkey],
                        compute_dtype)
        if residual is not None:
            pre = pre + residual
        return jax.nn.elu(pre).astype(compute_dtype)

    # --- level-0 encoder in S2D space
    t = _s2d_in(x)
    for i in range(cfg.n_conv_per_level):
        if i:
            t = _s2d_regrid(t)
            t = s2d_conv_elu(t, f"enc0_{i}_w", f"enc0_{i}_b")
        else:
            # enc0_0's in-form input has only 8*c_in_image (=8) channels —
            # a K=64 matmul wastes the MXU; the XLA path handles it
            t = jax.nn.elu(_conv_s2d(t, s2d_params["enc0_0_w"],
                                     s2d_params["enc0_0_b"], compute_dtype)
                           ).astype(compute_dtype)
    t = _bn(t, s2d_params, "bn_down0", cfg, compute_dtype)
    skip0 = t                                     # out-form, 8*base channels
    c0 = cfg.base_features
    # maxpool 2x == max over the 8 sub-position slots of the out-form
    x1 = t.reshape(n, d // 2, h // 2, w // 2, 8, c0).max(axis=4)
    # --- levels 1..n-1 (dense, unchanged)
    skips = []
    t = x1
    for lv in range(1, cfg.n_levels):
        for i in range(cfg.n_conv_per_level):
            t = jax.nn.elu(_conv(t, params[f"enc{lv}_{i}_w"],
                                 params[f"enc{lv}_{i}_b"], compute_dtype)
                           ).astype(compute_dtype)
        t = _bn(t, params, f"bn_down{lv}", cfg, compute_dtype)
        if lv < cfg.n_levels - 1:
            skips.append(t)
            t = _maxpool2(t)
    for lv in range(cfg.n_levels - 2, 0, -1):
        t = _upsample2(t)
        t = jnp.concatenate([skips[lv - 1], t], axis=-1)
        for i in range(cfg.n_conv_per_level):
            t = jax.nn.elu(_conv(t, params[f"dec{lv}_{i}_w"],
                                 params[f"dec{lv}_{i}_b"], compute_dtype)
                           ).astype(compute_dtype)
        t = _bn(t, params, f"bn_up{lv}", cfg, compute_dtype)
    # --- level-0 decoder in S2D space. dec0_0 = skip-branch (S2D conv on
    # the regridded skip) + upsample-folded branch (3^3 SAME conv on the
    # coarse dec1 output — the 2x upsample never materializes).
    t_up = _conv(t, s2d_params["dec0_0_up_w"], 0.0, compute_dtype)
    t = s2d_conv_elu(_s2d_regrid(skip0), "dec0_0_skip_w", "dec0_0_b",
                     residual=t_up)
    for i in range(1, cfg.n_conv_per_level):
        t = s2d_conv_elu(_s2d_regrid(t), f"dec0_{i}_w", f"dec0_{i}_b")
    t = _bn(t, s2d_params, "bn_up0", cfg, compute_dtype)
    # --- 1^3 head + argmax per slot, then depth-to-space the labels
    wh = params["head_w"].reshape(params["head_w"].shape[-2:])
    logits = (jnp.einsum("nzyxrc,cl->nzyxrl",
                         t.reshape(n, d // 2, h // 2, w // 2, 8, c0)
                          .astype(compute_dtype),
                         wh.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
              + params["head_b"])
    if return_logits:
        lg = logits.reshape(n, d // 2, h // 2, w // 2, 2, 2, 2, cfg.n_labels)
        lg = lg.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return lg.reshape(n, d, h, w, cfg.n_labels)
    cls = jnp.argmax(logits, axis=-1)              # (n, Q, Q, Q, 8)
    cls = cls.reshape(n, d // 2, h // 2, w // 2, 2, 2, 2)
    cls = cls.transpose(0, 1, 4, 2, 5, 3, 6)
    return cls.reshape(n, d, h, w)


def pad_to_divisor(data: np.ndarray, divisor: int) -> Tuple[np.ndarray, Tuple[slice, ...]]:
    """Zero-pad (z, y, x) up to multiples of ``divisor``; returns (padded, crop)."""
    pads = [(-len_ % divisor) for len_ in data.shape]
    padded = np.pad(data, [(0, p) for p in pads])
    crop = tuple(slice(0, s) for s in data.shape)
    return padded, crop


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def _segment_jit(params, x, cfg: UNetConfig, compute_dtype=jnp.float32):
    logits = unet_apply(params, x, cfg, compute_dtype)
    return jnp.argmax(logits, axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "compute_dtype", "conv_impl"))
def _segment_s2d_jit(params, s2d_params, x, cfg: UNetConfig,
                     compute_dtype=jnp.float32, conv_impl: str = "xla"):
    return unet_apply_s2d(params, s2d_params, x, cfg, compute_dtype,
                          conv_impl=conv_impl)


# s2d_level0_params is a host-side transform + device upload of the
# 8x-inflated level-0 kernels: cache it per parameter tree so repeated
# segment_volume calls (the per-session pipeline) pay it once. Strong
# refs to the source params keep ids stable; tiny capacity (weights are
# tens of MB).
_S2D_CACHE: "dict[int, tuple]" = {}


def _s2d_params_cached(params: Dict, cfg: UNetConfig) -> Dict:
    key = id(params)
    hit = _S2D_CACHE.get(key)
    if hit is not None and hit[0] is params and hit[1] == cfg:
        return hit[2]
    s2d = {k: jnp.asarray(v)
           for k, v in s2d_level0_params(params, cfg).items()}
    if len(_S2D_CACHE) >= 2:
        _S2D_CACHE.pop(next(iter(_S2D_CACHE)))
    _S2D_CACHE[key] = (params, cfg, s2d)
    return s2d


def segment_volume(params: Dict, data: np.ndarray,
                   cfg: "UNetConfig | None" = None,
                   labels: "Sequence[int] | None" = None,
                   compute_dtype=None,
                   use_s2d: "bool | None" = None,
                   mesh=None) -> np.ndarray:
    """Segment one (z, y, x) intensity volume -> int16 SynthSeg label map.

    Intensities are robust-max normalized (SynthSeg's inference-time
    preprocessing); the class argmax is mapped through ``labels``. cfg and
    labels default to what the parameter tree implies (converted real
    weights use the SynthSeg aseg numbering; other label counts map to
    0..n-1 unless given explicitly). ``compute_dtype`` defaults to
    bfloat16 on TPU (the MXU's native input precision, fp32 accumulation)
    and float32 elsewhere; pass jnp.float32 to force full precision.
    ``use_s2d`` selects the space-to-depth level-0 program: False/True/
    'xla' as before, or 'pallas' to additionally run the 192-channel S2D
    convs through the fused Pallas MXU kernel (labels.pallas_conv) —
    measured 78.0 -> 67.9 ms at 160^3 on TPU, recovering the XLA S2D
    emitter's conv penalty to TIE the default z-decomposed program (the
    remaining ~68 ms is mid-level convs + transforms, not level-0 conv
    FLOPs; see docs/VALIDATION.md). Default: the FT2_UNET_S2D env var
    ('1'/'xla'/'pallas'), else off.

    ``mesh`` (a jax.sharding.Mesh) runs the forward spatially partitioned:
    the volume's z axis is sharded over the mesh's first axis with weights
    replicated, and GSPMD inserts the conv halo exchanges — the multi-chip
    path for volumes too large for one chip's HBM (or to cut latency);
    sharded-vs-single parity is pinned in tests/test_parallel.py. The z
    axis is zero-padded up to lcm(divisor, mesh size) so it splits evenly;
    when that exceeds the single-device padding, labels within ~a receptive
    field of the far-z face see more zero context than the unsharded
    program would give them (the same boundary effect as any padding)."""
    if compute_dtype is None:
        compute_dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                         else jnp.float32)
    if use_s2d is None:
        env = os.environ.get("FT2_UNET_S2D", "").strip().lower()
        use_s2d = "pallas" if env == "pallas" else (
            env in ("1", "true", "yes", "on", "xla"))
    conv_impl = "pallas" if use_s2d == "pallas" else "xla"
    if mesh is not None and use_s2d:
        raise ValueError("use_s2d and mesh are mutually exclusive (the S2D "
                         "rearranges are not laid out for spatial sharding)")
    if cfg is None:
        cfg = config_from_params(params)
    if use_s2d and (cfg.kernel != 3 or cfg.n_levels < 2):
        raise ValueError(
            f"use_s2d needs 3^3 kernels and n_levels >= 2 (got kernel="
            f"{cfg.kernel}, n_levels={cfg.n_levels})")
    if labels is None:
        labels = (SYNTHSEG_LABELS if cfg.n_labels == len(SYNTHSEG_LABELS)
                  else tuple(range(cfg.n_labels)))
    data = np.asarray(data, np.float32)
    scale = np.percentile(data[data > 0], 99.5) if (data > 0).any() else 1.0
    norm = np.clip(data / max(scale, 1e-6), 0.0, 1.0)
    divisor = cfg.divisor
    if mesh is not None:
        # the z axis must also split evenly over the mesh; the crop strips
        # the extra padding from the labels afterwards
        ndev = int(mesh.devices.size)
        divisor = divisor * ndev // math.gcd(divisor, ndev)
    padded, crop = pad_to_divisor(norm, cfg.divisor)
    if divisor != cfg.divisor:
        zpad = -padded.shape[0] % divisor
        padded = np.pad(padded, ((0, zpad), (0, 0), (0, 0)))
    x = jnp.asarray(padded)[None, ..., None]
    pj = {k: jnp.asarray(v) for k, v in params.items()}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        x = jax.device_put(x, NamedSharding(mesh, P(None, axis)))
        pj = {k: jax.device_put(v, NamedSharding(mesh, P()))
              for k, v in pj.items()}
    if use_s2d:
        # alternative inference path: exact space-to-depth level 0. Wins
        # per-conv standalone but loses to the fused dense program in the
        # full network on the current chip (66 vs 61 ms at 160^3) — kept
        # selectable (FT2_UNET_S2D=1) for hardware where XLA's 3D/2D conv
        # emitters trade differently.
        s2d = _s2d_params_cached(params, cfg)
        cls = np.asarray(_segment_s2d_jit(pj, s2d, x, cfg, compute_dtype,
                                          conv_impl=conv_impl))[0]
    else:
        cls = np.asarray(_segment_jit(pj, x, cfg, compute_dtype))[0]
    lut = np.asarray(labels, np.int16)
    return lut[cls[crop]]
