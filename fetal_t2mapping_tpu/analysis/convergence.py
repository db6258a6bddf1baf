"""Convergence observability figures.

Produces the reference's three convergence-study artifacts
(utils/t2map_utils.py:115-292): sampled-voxel loss curves, step-size curves
(log-y), and an iterations-vs-final-loss scatter, all colored by fitted T2.
The data comes from the solver's lax.scan traces instead of per-voxel Python
callbacks, so tracing costs nothing on the full-volume fit.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.cm as cm  # noqa: E402
from matplotlib.collections import LineCollection  # noqa: E402
from matplotlib.colors import Normalize  # noqa: E402
from matplotlib.figure import Figure  # noqa: E402

# Figures are built with the object-oriented API (Figure + Agg canvas),
# NOT pyplot: no global figure registry, so rendering is thread-safe and
# the pipeline can push it off the per-session critical path.
#
# Render cost is a per-session marginal cost in fleet operation, so it is
# engineered down (measured on the three-figure set): PNG compress_level 1
# instead of PIL's default 6 (encode 0.38 -> ~0.1 s; these are diagnostic
# artifacts, +15% file size is irrelevant), one LineCollection per trace
# figure instead of one Line2D per voxel, no tight_layout (a full extra
# layout pass per figure; the default margins fit these axes), and the
# scatter subsampled at 10k (s=4 ink saturates far below that). Together:
# 1.8 -> ~0.7 s for the set.
_PNG_KW = dict(pil_kwargs={"compress_level": 1})


def _subplots(figsize):
    fig = Figure(figsize=figsize)
    return fig, fig.add_subplot()


def _norm_cmap(values):
    vmin, vmax = float(np.min(values)), float(np.max(values))
    if vmin == vmax:
        vmax = vmin + 1.0
    return Normalize(vmin=vmin, vmax=vmax), cm.jet


def _trace_lines(ax, series, active, t2_values, norm, cmap):
    segs, colors = [], []
    for j in range(series.shape[1]):
        n_act = max(int(active[:, j].sum()), 1)
        segs.append(np.column_stack([np.arange(n_act), series[:n_act, j]]))
        colors.append(cmap(norm(t2_values[j])))
    ax.add_collection(LineCollection(segs, colors=colors, linewidths=1.5))
    ax.autoscale_view()


def save_convergence_plots(ada_path: str, traces: Dict[str, np.ndarray],
                           trace_t2: np.ndarray, n_iter: np.ndarray,
                           final_fun: np.ndarray, all_t2: np.ndarray,
                           sub: str, ses: str, sim: str, fit: str) -> list:
    """Write the three convergence figures; returns the file paths."""
    os.makedirs(ada_path, exist_ok=True)
    paths = []
    f_val = np.asarray(traces["f_val"])
    step = np.asarray(traces["step_size"])
    active = np.asarray(traces["active"])

    norm, cmap = _norm_cmap(trace_t2)

    # 1. loss curves
    fig, ax = _subplots((12, 6))
    _trace_lines(ax, f_val, active, trace_t2, norm, cmap)
    sm = cm.ScalarMappable(cmap=cmap, norm=norm)
    sm.set_array([])
    fig.colorbar(sm, ax=ax).set_label("T2 Value")
    ax.set_xlabel("Iteration")
    ax.set_ylabel("Objective Function Value (Loss)")
    ax.set_title("Convergence of Sampled Voxels Colored by T2 Value")
    ax.grid(True)
    p = os.path.join(ada_path, f"convergence_sampled_voxels_by_t2_{sub}_{ses}_sim-{sim}_{fit}.png")
    fig.savefig(p, **_PNG_KW)
    paths.append(p)

    # 2. step-size curves (log y)
    fig, ax = _subplots((12, 6))
    _trace_lines(ax, np.maximum(step, 1e-12), active, trace_t2, norm, cmap)
    sm = cm.ScalarMappable(cmap=cmap, norm=norm)
    sm.set_array([])
    fig.colorbar(sm, ax=ax).set_label("T2 Value")
    ax.set_xlabel("Iteration")
    ax.set_ylabel("Step Size")
    ax.set_yscale("log")
    ax.set_title("Step-Size Convergence of Sampled Voxels Colored by T2 Value")
    ax.grid(True)
    p = os.path.join(ada_path, f"step_size_convergence_sampled_voxels_by_t2_{sub}_{ses}_sim-{sim}_ada-{fit}.png")
    fig.savefig(p, **_PNG_KW)
    paths.append(p)

    # 3. iterations vs final loss scatter. Deterministically subsampled to
    # 10k points past that size: a s=4 scatter saturates to solid ink well
    # below 10k, while matplotlib's draw time keeps growing linearly
    # (seconds per figure at ~10^5+ voxels — it was the dominant cost of
    # the whole per-session plot stage).
    n_iter, final_fun, all_t2 = (np.asarray(n_iter), np.asarray(final_fun),
                                 np.asarray(all_t2))
    if n_iter.size > 10_000:
        sel = np.random.default_rng(0).choice(n_iter.size, 10_000,
                                              replace=False)
        n_iter, final_fun, all_t2 = n_iter[sel], final_fun[sel], all_t2[sel]
    nrm2, cmap2 = _norm_cmap(all_t2)
    fig, ax = _subplots((10, 8))
    ax.scatter(n_iter, final_fun, c=all_t2, cmap=cmap2, norm=nrm2, s=4)
    sm = cm.ScalarMappable(cmap=cmap2, norm=nrm2)
    sm.set_array([])
    fig.colorbar(sm, ax=ax).set_label("T2 Value")
    ax.set_xlabel("Number of Iterations")
    ax.set_ylabel("Final Loss Function Value")
    ax.set_title("Final Number of Iterations vs Final Loss (Colored by T2)")
    ax.grid(True)
    p = os.path.join(ada_path, f"scatter_iterations_vs_loss_by_t2_{sub}_{ses}_sim-{sim}_ada-{fit}.png")
    fig.savefig(p, **_PNG_KW)
    paths.append(p)
    return paths
