"""NIST phantom sphere labels from seed voxels.

The reference builds per-sphere ROIs by writing a 1 at each seed voxel,
ball-dilating by radius 6, filling holes, and max-accumulating labels
(utils/qmri_utils.py:868-933). Dilating a single seed by a ball IS the ball:
here each sphere is produced directly as {voxel : ||voxel - seed||_2 <= r}
in index space — exact, no morphology pass, one fused elementwise kernel
for all seeds.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.volume import Volume


def phantom_labels_from_seeds(geometry: Volume, seeds_xyz: Sequence[Sequence[int]],
                              radius: int = 6) -> Volume:
    """Label map with sphere i+1 centred at seeds_xyz[i] (x, y, z order).

    Later seeds win on overlap via max-accumulation, matching the
    reference's sitk.Maximum fold.
    """
    nz, ny, nx = geometry.shape
    seeds = np.asarray(seeds_xyz, np.int32)
    if seeds.ndim != 2 or seeds.shape[1] != 3:
        raise ValueError("seeds must be (n, 3) in (x, y, z) order")

    zz = jnp.arange(nz)[:, None, None]
    yy = jnp.arange(ny)[None, :, None]
    xx = jnp.arange(nx)[None, None, :]

    def one(seed_and_label, acc):
        sx, sy, sz, label = seed_and_label
        d2 = (zz - sz) ** 2 + (yy - sy) ** 2 + (xx - sx) ** 2
        sphere = d2 <= radius * radius
        return jnp.maximum(acc, jnp.where(sphere, label, 0).astype(jnp.uint8))

    acc = jnp.zeros((nz, ny, nx), jnp.uint8)
    rows = jnp.concatenate(
        [jnp.asarray(seeds), jnp.arange(1, len(seeds) + 1, dtype=jnp.int32)[:, None]], axis=1)
    out = jax.lax.fori_loop(0, rows.shape[0], lambda i, a: one(rows[i], a), acc)
    return geometry.with_data(np.asarray(out))
