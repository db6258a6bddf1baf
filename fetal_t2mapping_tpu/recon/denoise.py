"""Volume-level TV denoising (reference utils/qmri_utils.py:393-405)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.volume import Volume
from ..ops.tv import tv_denoise_slices


def denoise_volume(vol: Volume, weight: float = 0.1, eps: float = 2e-4,
                   max_iter: int = 200) -> Volume:
    """Slice-wise TV-Chambolle denoising, geometry preserved.

    Returns a device-backed Volume: callers that keep computing on device
    (the fusion->denoise->write chain) never sync; ``np.asarray`` the data
    to materialize on host."""
    out = tv_denoise_slices(jnp.asarray(vol.data, jnp.float32), weight, eps,
                            max_iter)
    return vol.with_data(out)
