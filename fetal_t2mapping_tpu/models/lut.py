"""Lookup-table T2 estimation (the reference's obsolete LUT path, C30).

The reference shipped a pickled nearest-neighbour ``griddata`` table mapping
(TE, mean signal) -> (amplitude, T2) (reference utils/t2map_utils.py:295-405,
marked Obsolete). Rebuilt here as a first-class device op because a LUT is a
genuinely useful fast path on TPU: building the table is one fused pass over
a dense (k-normalized) parameter grid, and lookup is a vectorized
searchsorted + linear interpolation — no iteration at all. Useful as a
sub-millisecond initializer or a QC cross-check of the Newton fit.

Scheme: for the mono-exponential model the normalized decay
r = S(te_i)/S(te_0) = exp(-(te_i - te_0)/T2) is independent of k, so a 1-D
monotone table T2 <-> r per echo pair suffices; the estimate averages the
per-pair inversions weighted by signal (later echoes are noisier), and
k = S(te_0) * exp(te_0/T2).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("t2_min", "t2_max", "n_entries"))
def build_ratio_table(dte: float | jax.Array, *, t2_min: float = 5.0,
                      t2_max: float = 3000.0, n_entries: int = 2048):
    """(t2_grid, ratio_grid) for one echo spacing; ratio is increasing in T2."""
    t2 = jnp.exp(jnp.linspace(jnp.log(t2_min), jnp.log(t2_max), n_entries))
    return t2, jnp.exp(-dte / t2)


@functools.partial(jax.jit, static_argnames=("te", "t2_min", "t2_max", "n_entries"))
def lut_t2(signal, *, te: Tuple[float, ...], t2_min: float = 5.0,
           t2_max: float = 3000.0, n_entries: int = 2048):
    """Estimate (k, T2) for every voxel from decay ratios via table inversion.

    Args:
        signal: (N, T) voxel signals, T >= 2, echoes sorted by TE.
        te: static echo times (ms).

    Returns:
        (N, 2) array [k, T2]; T2 clipped to the table range.
    """
    signal = jnp.asarray(signal, jnp.float32)
    s0 = jnp.maximum(signal[:, 0], 1e-6)
    t2_est = jnp.zeros_like(s0)
    w_sum = jnp.zeros_like(s0)
    for i in range(1, len(te)):
        dte = te[i] - te[0]
        t2_grid, r_grid = build_ratio_table(dte, t2_min=t2_min, t2_max=t2_max,
                                            n_entries=n_entries)
        r = jnp.clip(signal[:, i] / s0, r_grid[0], r_grid[-1])
        idx = jnp.clip(jnp.searchsorted(r_grid, r), 1, n_entries - 1)
        r_lo = r_grid[idx - 1]
        r_hi = r_grid[idx]
        frac = (r - r_lo) / jnp.maximum(r_hi - r_lo, 1e-12)
        t2_i = t2_grid[idx - 1] * (1 - frac) + t2_grid[idx] * frac
        w = jnp.maximum(signal[:, i], 0.0)         # later echoes ~ noisier
        t2_est = t2_est + w * t2_i
        w_sum = w_sum + w
    t2_est = t2_est / jnp.maximum(w_sum, 1e-12)
    t2_est = jnp.clip(t2_est, t2_min, t2_max)
    k = s0 * jnp.exp(te[0] / t2_est)
    return jnp.stack([k, t2_est], axis=-1)


def lut_t2_host(signal, te: Sequence[float], **kwargs):
    """Host-friendly wrapper accepting any array-likes."""
    import numpy as np

    return np.asarray(lut_t2(jnp.asarray(signal, jnp.float32),
                             te=tuple(float(t) for t in te), **kwargs))
