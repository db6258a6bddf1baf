"""Acquisition metadata: CSV session logs -> pandas DataFrame.

Every pipeline stage is driven by per-session CSV logs holding one row per
acquisition (sub/ses/run/EchoTime/orientation/...). Mirrors the reference's
loader and its per-project CSV shortlists (reference
utils/metadata_utils.py:19-125); the study shortlists are data constants of
the published analyses and are kept verbatim so '--csv prj-00X' selects the
same sessions.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import pandas as pd

# Study shortlists: sessions selected for the published analyses.
PRJ_004_LF: List[str] = [
    "2024083017_17510000.csv", "2024090320_55420000.csv", "2024090618_37050000.csv",
    "2024090811_14320000.csv", "2024091017_53530000_1.csv", "2024091017_53530000_2.csv",
    "2024091020_45220000.csv", "2024091320_23400000.csv", "2024091321_22550000.csv",
    "2024091322_27490000.csv", "2024092720_10110000.csv", "2024092719_10310000.csv",
    "2024102120_48480000.csv",
]
PRJ_004_HF: List[str] = [
    "2024083019_26300000.csv", "2024090322_28560000.csv", "2024090619_26370000.csv",
    "2024090812_21470000.csv", "2024091021_57280000.csv", "2024091319_13240000.csv",
    "2024091318_13560000.csv", "2024092721_25410000.csv", "2024102616_18560000.csv",
    "2024102122_28450000.csv",
]
PRJ_003_LF: List[str] = ["20240806_30540000_1.csv"]
PRJ_002_LF: List[str] = ["20240527_095111_2.csv"]
PRJ_002_HF: List[str] = ["20240609_50140000_2.csv"]


def project_csvs(project: str, low_field: bool) -> List[str]:
    table = {
        ("prj-004", True): PRJ_004_LF,
        ("prj-004", False): PRJ_004_HF,
        ("prj-003", True): PRJ_003_LF,
        ("prj-002", True): PRJ_002_LF,
        ("prj-002", False): PRJ_002_HF,
    }
    key = (project, low_field)
    if key not in table:
        raise ValueError(f"no session shortlist for {project} at "
                         f"{'0.55T' if low_field else '1.5T'}")
    return list(table[key])


def csv2df(csv_path: str) -> pd.DataFrame:
    return pd.read_csv(csv_path)


def set_metadata(csv_path: str, csvs: Sequence[str], low_field: bool) -> pd.DataFrame:
    """Load and concatenate session logs.

    ``csvs`` is either explicit CSV filenames or a single project name
    ('prj-002'/'prj-003'/'prj-004') selecting that study's shortlist.
    """
    expanded = []
    for c in csvs:
        if c.startswith("prj-"):
            expanded.extend(project_csvs(c, low_field))
        else:
            expanded.append(c)
    bad = [c for c in expanded if not c.lower().endswith(".csv")]
    if not expanded or bad:
        raise ValueError(
            f"{list(csvs)!r} is neither metadata CSV log file(s) nor known "
            "project name(s) (prj-002 / prj-003 / prj-004)")
    frames = [csv2df(os.path.join(csv_path, c)) for c in expanded]
    return pd.concat(frames, ignore_index=True)
