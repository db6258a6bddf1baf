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
``random_params`` builds a correctly-shaped parameter tree so the full
pipeline — padding, jitted forward, argmax label map, SynthSeg label
numbering — is exercised in tests and ready for real weights
(FT2_SYNTHSEG_WEIGHTS env var or SynthSegRunner(weights=...)).
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


def _conv(x, w, b):
    """3-D conv, NDHWC, SAME — lowered onto the MXU by XLA."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding="SAME",
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


def unet_apply(params: Dict, x: jnp.ndarray, cfg: UNetConfig = UNetConfig()):
    """Forward pass: (N, D, H, W, 1) float32 -> (N, D, H, W, n_labels) logits.

    D/H/W must be multiples of cfg.divisor (use pad_to_divisor)."""
    skips = []
    for lv in range(cfg.n_levels):
        for i in range(cfg.n_conv_per_level):
            x = jax.nn.elu(_conv(x, params[f"enc{lv}_{i}_w"], params[f"enc{lv}_{i}_b"]))
        if lv < cfg.n_levels - 1:
            skips.append(x)
            x = _maxpool2(x)
    for lv in range(cfg.n_levels - 2, -1, -1):
        x = _upsample2(x)
        x = jnp.concatenate([skips[lv], x], axis=-1)
        for i in range(cfg.n_conv_per_level):
            x = jax.nn.elu(_conv(x, params[f"dec{lv}_{i}_w"], params[f"dec{lv}_{i}_b"]))
    return _conv(x, params["head_w"], params["head_b"])


def pad_to_divisor(data: np.ndarray, divisor: int) -> Tuple[np.ndarray, Tuple[slice, ...]]:
    """Zero-pad (z, y, x) up to multiples of ``divisor``; returns (padded, crop)."""
    pads = [(-len_ % divisor) for len_ in data.shape]
    padded = np.pad(data, [(0, p) for p in pads])
    crop = tuple(slice(0, s) for s in data.shape)
    return padded, crop


@functools.partial(jax.jit, static_argnames=("cfg",))
def _segment_jit(params, x, cfg: UNetConfig):
    logits = unet_apply(params, x, cfg)
    return jnp.argmax(logits, axis=-1)


def segment_volume(params: Dict, data: np.ndarray,
                   cfg: UNetConfig = UNetConfig(),
                   labels: Sequence[int] = SYNTHSEG_LABELS) -> np.ndarray:
    """Segment one (z, y, x) intensity volume -> int16 SynthSeg label map.

    Intensities are robust-max normalized (SynthSeg's inference-time
    preprocessing); the class argmax is mapped through ``labels``."""
    data = np.asarray(data, np.float32)
    scale = np.percentile(data[data > 0], 99.5) if (data > 0).any() else 1.0
    norm = np.clip(data / max(scale, 1e-6), 0.0, 1.0)
    padded, crop = pad_to_divisor(norm, cfg.divisor)
    x = jnp.asarray(padded)[None, ..., None]
    cls = np.asarray(_segment_jit({k: jnp.asarray(v) for k, v in params.items()},
                                  x, cfg))[0]
    lut = np.asarray(labels, np.int16)
    return lut[cls[crop]]
