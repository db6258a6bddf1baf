"""Brain/phantom mask construction and brain extraction.

Replaces the reference's SimpleITK threshold/morphology recipes:
- mask_from_labels: labels > 0 (utils/qmri_utils.py:935-951)
- extract_brain: recon * mask, i.e. sitk.Mask (:953-974)
- phantom_mask: threshold 100 + fill holes + closing(15) + dilate(10)
  (:591-623)
"""

from __future__ import annotations

import numpy as np

from ..core.volume import Volume
from ..ops.morphology import binary_closing, binary_dilate, fill_holes


def mask_from_labels(labels: Volume) -> Volume:
    """Binary mask = any nonzero label."""
    return labels.with_data((np.asarray(labels.data) > 0).astype(np.uint8))


def extract_brain(recon: Volume, mask: Volume) -> Volume:
    """Zero everything outside the mask (BET-style extraction)."""
    if recon.shape != mask.shape:
        raise ValueError(f"shape mismatch {recon.shape} vs {mask.shape}")
    data = np.asarray(recon.data) * (np.asarray(mask.data) > 0)
    return recon.with_data(data.astype(np.asarray(recon.data).dtype))


def phantom_mask(recon: Volume, threshold: float = 100.0,
                 closing_radius: int = 15, dilate_radius: int = 10) -> Volume:
    """Foreground mask for NIST phantom volumes."""
    m = np.asarray(recon.data) > threshold
    m = np.asarray(fill_holes(m))
    m = np.asarray(binary_closing(m, closing_radius, box=True))
    m = np.asarray(binary_dilate(m, dilate_radius))
    return recon.with_data(m.astype(np.uint8))
