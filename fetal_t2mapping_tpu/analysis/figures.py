"""Publication-style figures for reproducibility analysis.

Generic versions of the reference's notebook figures (utils/ada_utils.py:
218-883): CoV boxplots with pairwise Wilcoxon annotations, Pearson
scatter/regression panels, per-tissue violin plots and T2 boxplots. All take
tidy DataFrames (from analysis.stats / analysis.roi) instead of hardcoded
subject lists, and write PNGs.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np
import pandas as pd

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from .stats import paired_wilcoxon, pearson_regression  # noqa: E402


def _aligned_pair(a, b):
    """Align two samples for a PAIRED test. pandas Series pair on their index
    (ROI/subject identity); plain arrays pair positionally only when equal
    length — truncating to min(len) would silently pair the wrong rows."""
    if isinstance(a, pd.Series) and isinstance(b, pd.Series):
        common = a.index.intersection(b.index)
        return a.loc[common].to_numpy(float), b.loc[common].to_numpy(float)
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    if len(a) != len(b):
        return None, None
    return a, b


def cov_boxplot(groups: Dict[str, np.ndarray], out_path: str,
                title: str = "Coefficient of variation",
                annotate_wilcoxon: bool = True) -> str:
    """Boxplot of CoV distributions per group with pairwise Wilcoxon p-values.

    Pass pandas Series (indexed by ROI/subject) to get identity-aligned
    pairing; unequal-length plain arrays get no annotation for that pair.
    """
    names = list(groups)
    data = [np.asarray(groups[n], float) for n in names]
    fig, ax = plt.subplots(figsize=(2 + 1.6 * len(names), 6))
    ax.boxplot(data, tick_labels=names, showmeans=True)
    ax.set_ylabel("CoV (%)")
    ax.set_title(title)
    ax.grid(True, axis="y", alpha=0.4)
    if annotate_wilcoxon and len(names) >= 2:
        y = max(np.nanmax(d) if len(d) else 0 for d in data)
        step = 0.08 * max(y, 1.0)
        level = y + step
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                ai, bj = _aligned_pair(groups[names[i]], groups[names[j]])
                if ai is not None and len(ai) >= 3:
                    res = paired_wilcoxon(ai, bj)
                    ax.plot([i + 1, j + 1], [level, level], "k-", lw=0.8)
                    ax.text((i + j) / 2 + 1, level, f"p={res['pvalue']:.3g}",
                            ha="center", va="bottom", fontsize=8)
                    level += step
    plt.tight_layout()
    plt.savefig(out_path)
    plt.close(fig)
    return out_path


def pearson_scatter(x: np.ndarray, y: np.ndarray, out_path: str,
                    xlabel: str = "repetition A", ylabel: str = "repetition B",
                    title: str = "") -> str:
    """Scatter + OLS regression + identity line, annotated with r/p."""
    reg = pearson_regression(x, y)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.scatter(x, y, s=14, alpha=0.7)
    lim = [np.nanmin([x, y]), np.nanmax([x, y])]
    ax.plot(lim, lim, "k--", lw=0.8, label="identity")
    if np.isfinite(reg["slope"]):
        xs = np.linspace(lim[0], lim[1], 10)
        ax.plot(xs, reg["slope"] * xs + reg["intercept"], "r-", lw=1.2,
                label=f"fit: r={reg['r']:.3f}, p={reg['pvalue']:.2g}")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    ax.legend()
    ax.grid(True, alpha=0.4)
    plt.tight_layout()
    plt.savefig(out_path)
    plt.close(fig)
    return out_path


def tissue_violin(df: pd.DataFrame, out_path: str, value_col: str = "mean",
                  tissue_col: str = "tissue", unit_col: str = "sub",
                  title: str = "T2 per tissue") -> str:
    """Violin plot of per-unit ROI T2 for each tissue class."""
    tissues = sorted(df[tissue_col].unique())
    data = [df[df[tissue_col] == t][value_col].dropna().to_numpy() for t in tissues]
    fig, ax = plt.subplots(figsize=(2 + 1.6 * len(tissues), 6))
    parts = ax.violinplot([d if len(d) else [np.nan] for d in data], showmedians=True)
    ax.set_xticks(np.arange(1, len(tissues) + 1))
    ax.set_xticklabels(tissues)
    ax.set_ylabel("T2 (ms)")
    ax.set_title(title)
    ax.grid(True, axis="y", alpha=0.4)
    plt.tight_layout()
    plt.savefig(out_path)
    plt.close(fig)
    return out_path


def t2_boxplot(df: pd.DataFrame, out_path: str, value_col: str = "mean",
               group_col: str = "roi", title: str = "ROI T2") -> str:
    groups = sorted(df[group_col].unique())
    data = [df[df[group_col] == g][value_col].dropna().to_numpy() for g in groups]
    fig, ax = plt.subplots(figsize=(2 + 0.8 * len(groups), 6))
    ax.boxplot(data, tick_labels=groups)
    ax.set_ylabel("T2 (ms)")
    ax.set_title(title)
    ax.tick_params(axis="x", rotation=75)
    ax.grid(True, axis="y", alpha=0.4)
    plt.tight_layout()
    plt.savefig(out_path)
    plt.close(fig)
    return out_path
