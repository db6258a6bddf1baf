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
    )


def validate_params(params: Dict[str, np.ndarray], cfg: UNetConfig) -> None:
    """Raise unless every conv weight/bias matches the cfg's exact shapes."""
    expect = {}
    for name, c_in, c_out in _conv_shapes(cfg):
        k = 1 if name == "head" else cfg.kernel
        expect[name + "_w"] = (k, k, k, c_in, c_out)
        expect[name + "_b"] = (c_out,)
    missing = sorted(set(expect) - set(params))
    extra = sorted(set(params) - set(expect))
    if missing or extra:
        raise ValueError(f"parameter tree mismatch: missing={missing} extra={extra}")
    for k, shape in expect.items():
        if tuple(params[k].shape) != shape:
            raise ValueError(f"{k}: shape {tuple(params[k].shape)} != expected {shape}")


def _conv(x, w, b, compute_dtype=jnp.float32):
    """3-D conv, NDHWC, SAME — lowered onto the MXU by XLA.

    ``compute_dtype=bfloat16`` keeps ACTIVATIONS in the MXU's native bf16
    input precision while ACCUMULATING in fp32 (preferred_element_type);
    callers then cast the post-activation tensor back to compute_dtype, so
    inter-layer HBM traffic halves (the actual bottleneck at these small
    channel counts — measured: bf16 inputs with fp32 activations were
    SLOWER than pure fp32 from the extra cast traffic). The class decision
    is an argmax over well-separated logits, so bf16 mantissa loss only
    matters at decision boundaries (validated against fp32 in tests)."""
    out = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), w.astype(compute_dtype),
        window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)
    return out + b


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
    return _conv(x, params["head_w"], params["head_b"], compute_dtype)


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


def segment_volume(params: Dict, data: np.ndarray,
                   cfg: "UNetConfig | None" = None,
                   labels: "Sequence[int] | None" = None,
                   compute_dtype=None) -> np.ndarray:
    """Segment one (z, y, x) intensity volume -> int16 SynthSeg label map.

    Intensities are robust-max normalized (SynthSeg's inference-time
    preprocessing); the class argmax is mapped through ``labels``. cfg and
    labels default to what the parameter tree implies (converted real
    weights use the SynthSeg aseg numbering; other label counts map to
    0..n-1 unless given explicitly). ``compute_dtype`` defaults to
    bfloat16 on TPU (the MXU's native input precision, ~2x the fp32 conv
    rate, fp32 accumulation) and float32 elsewhere; pass jnp.float32 to
    force full precision."""
    if compute_dtype is None:
        compute_dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                         else jnp.float32)
    if cfg is None:
        cfg = config_from_params(params)
    if labels is None:
        labels = (SYNTHSEG_LABELS if cfg.n_labels == len(SYNTHSEG_LABELS)
                  else tuple(range(cfg.n_labels)))
    data = np.asarray(data, np.float32)
    scale = np.percentile(data[data > 0], 99.5) if (data > 0).any() else 1.0
    norm = np.clip(data / max(scale, 1e-6), 0.0, 1.0)
    padded, crop = pad_to_divisor(norm, cfg.divisor)
    x = jnp.asarray(padded)[None, ..., None]
    cls = np.asarray(_segment_jit({k: jnp.asarray(v) for k, v in params.items()},
                                  x, cfg, compute_dtype))[0]
    lut = np.asarray(labels, np.int16)
    return lut[cls[crop]]
