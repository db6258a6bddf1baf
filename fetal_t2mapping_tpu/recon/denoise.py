"""Volume-level TV denoising (reference utils/qmri_utils.py:393-405)."""

from __future__ import annotations

import numpy as np

from ..core.volume import Volume
from ..ops.tv import tv_denoise_slices


def denoise_volume(vol: Volume, weight: float = 0.1, eps: float = 2e-4,
                   max_iter: int = 200) -> Volume:
    """Slice-wise TV-Chambolle denoising, geometry preserved."""
    out = tv_denoise_slices(np.asarray(vol.data, np.float32), weight, eps, max_iter)
    return vol.with_data(np.asarray(out, np.float32))
