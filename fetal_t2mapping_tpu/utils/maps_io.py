"""Writers for fit outputs: NIfTI maps + phantom ROI statistics CSV.

Mirrors the reference's output contract (utils/t2map_utils.py:18-59):
- four maps (t2/k/sigma/res) copying the recon geometry, named
  ``sim-{sim}_{param}map_ada-{fit}.nii.gz``
- per-ROI nanmean/nanstd of T2/k/sigma against spectrometer ground truth.

Note: the reference call site swaps (gt, id) when writing the phantom CSV
(run_t2mapping.py:478 unpacks ``id,gt = set_phantom_gt`` although the
function returns ``gt,id``), so its 'id' column holds numbers and 'trueT2'
holds sphere names. We write the columns correctly.
"""

from __future__ import annotations

import os
from typing import Mapping, Sequence

import numpy as np
import pandas as pd

from ..core import nifti
from ..core.volume import Volume
from .bids import get_img_path


def save_nifti_maps(out, bids_path: str, acq: Mapping, t2map_dirname: str,
                    sim: str, fit: str) -> dict:
    """Write t2/k/sigma/res maps; returns {param: path}.

    The writes are queued on the shared async writer pool
    (:mod:`..core.volcache`): the device downloads + gzip compressions
    overlap the caller's next work (and each other — the native writer
    and zlib release the GIL). The pipeline flushes before returning."""
    base = get_img_path(bids_path, acq, t2map_dirname)
    if "t2map.nii.gz" not in base:
        # the substring replace below would silently no-op and queue all
        # four maps onto ONE identical path (three maps lost to the
        # serialized writer) — fail loudly instead
        raise ValueError(
            f"t2map_dirname {t2map_dirname!r} resolves to {base!r}, which "
            "does not end in 't2map.nii.gz'; cannot derive map filenames")
    jobs = []
    for vol, param in zip((out.t2, out.k, out.sigma, out.res), ("t2", "k", "sigma", "res")):
        path = base.replace("t2map.nii.gz", f"sim-{sim}_{param}map_ada-{fit}.nii.gz")
        jobs.append((param, path, vol))
    for _, path, vol in jobs:
        nifti.write_async(path, vol, dtype=np.float32)
    return {param: path for param, path, _ in jobs}


def phantom_roi_stats(t2_map: np.ndarray, k_map: np.ndarray, sigma_map: np.ndarray,
                      label: np.ndarray, ids: Sequence[str],
                      gt: Sequence[float]) -> pd.DataFrame:
    """Per-sphere nanmean/nanstd of the fitted maps vs ground-truth T2.

    Labeled voxels the fit mask excluded hold 0.0 in the maps and ARE
    averaged in — deliberate reference parity: the reference zero-fills
    its maps (run_t2mapping.py:415) and nanmeans over ``label==i``
    unmasked (utils/t2map_utils.py:40), so its sphere means include the
    same zeros. Pre-mask the label volume to change that."""
    rows = []
    for i, (sphere, true_t2) in enumerate(zip(ids, gt), start=1):
        sel = label == i
        with np.errstate(invalid="ignore"):
            rows.append({
                "id": sphere,
                "trueT2": true_t2,
                "meanT2": np.nanmean(t2_map[sel]) if sel.any() else np.nan,
                "stdT2": np.nanstd(t2_map[sel]) if sel.any() else np.nan,
                "meanK": np.nanmean(k_map[sel]) if sel.any() else np.nan,
                "stdK": np.nanstd(k_map[sel]) if sel.any() else np.nan,
                "meanC": np.nanmean(sigma_map[sel]) if sel.any() else np.nan,
                "stdC": np.nanstd(sigma_map[sel]) if sel.any() else np.nan,
            })
    return pd.DataFrame(rows)


def save_phantom_csv(out, label_vol: Volume, ids: Sequence[str], gt: Sequence[float],
                     bids_path: str, acq: Mapping, t2map_dirname: str,
                     sim: str, fit: str) -> str:
    df = phantom_roi_stats(
        np.asarray(out.t2.data), np.asarray(out.k.data), np.asarray(out.sigma.data),
        np.asarray(label_vol.data), ids, gt,
    )
    path = get_img_path(bids_path, acq, t2map_dirname).replace(
        "t2map.nii.gz", f"sim-{sim}_ROI_data_ada-{fit}.csv")
    df.to_csv(path, index=False)
    return path
