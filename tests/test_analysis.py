"""Analysis layer: ROI reductions, CoV/Pearson stats, figure writers."""

import numpy as np
import pandas as pd

from fetal_t2mapping_tpu.analysis.figures import (
    cov_boxplot,
    pearson_scatter,
    t2_boxplot,
    tissue_violin,
)
from fetal_t2mapping_tpu.analysis.roi import (
    FETA_LABELS,
    roi_stats_per_label,
    t2_per_atlas_roi,
)
from fetal_t2mapping_tpu.analysis.stats import (
    coefficient_of_variation,
    cov_by_group,
    pairwise_repeatability,
    paired_wilcoxon,
    pearson_regression,
)


class TestRoiStats:
    def test_segment_reduction_matches_numpy(self):
        rng = np.random.default_rng(0)
        labels = rng.integers(0, 5, size=(8, 8, 8))
        values = rng.normal(100, 20, size=(8, 8, 8)).astype(np.float32)
        df = roi_stats_per_label(values, labels, n_labels=5)
        for lab in range(1, 5):
            sel = labels == lab
            np.testing.assert_allclose(df.loc[lab, "mean"], values[sel].mean(), rtol=1e-5)
            np.testing.assert_allclose(df.loc[lab, "std"], values[sel].std(), rtol=1e-4)
            assert df.loc[lab, "n"] == sel.sum()

    def test_atlas_roi_intersection_and_erosion(self):
        shape = (10, 12, 12)
        t2 = np.full(shape, 80.0, np.float32)
        feta = np.zeros(shape, np.int16)
        feta[2:8, 2:10, 2:10] = 2  # GM
        atlas = np.zeros(shape, np.int16)
        atlas[2:8, 2:10, 2:6] = 1
        atlas[2:8, 2:10, 6:10] = 2
        labels = [{"index": 1, "name": "roi_a"}, {"index": 2, "name": "roi_b"}]
        df = t2_per_atlas_roi(t2, feta, atlas, labels, tissue_class=2, erode=True)
        assert list(df["roi"]) == ["roi_a", "roi_b"]
        # erosion removes the outer shell: counts must be below raw intersection
        raw = ((feta == 2) & (atlas == 1)).sum()
        assert 0 < df.loc[0, "nvoxel"] < raw
        np.testing.assert_allclose(df["mean"].dropna(), 80.0)

    def test_feta_label_table(self):
        names = {l["index"]: l["name"] for l in FETA_LABELS}
        assert names[2] == "gm" and names[3] == "wm" and names[7] == "bs"


class TestStats:
    def test_cov(self):
        assert coefficient_of_variation([100, 100, 100]) == 0.0
        v = coefficient_of_variation([90, 110])
        np.testing.assert_allclose(v, 100 * np.std([90, 110]) / 100.0)

    def test_cov_by_group(self):
        df = pd.DataFrame({
            "sub": ["s1"] * 4 + ["s2"] * 4,
            "ses": ["a", "b"] * 4,
            "roi": ["r1", "r1", "r2", "r2"] * 2,
            "mean": [100, 110, 50, 55, 200, 180, 70, 77],
        })
        out = cov_by_group(df, within=["sub"])
        assert set(out["roi"]) == {"r1", "r2"}
        assert (out["n_repeats"] == 2).all()

    def test_pearson_and_wilcoxon(self):
        rng = np.random.default_rng(1)
        x = rng.uniform(50, 150, 30)
        y = 1.1 * x + rng.normal(0, 2, 30)
        reg = pearson_regression(x, y)
        assert reg["r"] > 0.99 and abs(reg["slope"] - 1.1) < 0.05
        w = paired_wilcoxon(x, y)
        assert w["n"] == 30 and np.isfinite(w["pvalue"])

    def test_pairwise_repeatability(self):
        df = pd.DataFrame({
            "sub": ["s1"] * 6,
            "ses": ["a", "a", "b", "b", "c", "c"],
            "roi": ["r1", "r2"] * 3,
            "mean": [1, 2, 3, 4, 5, 6],
        })
        pairs = pairwise_repeatability(df, unit_cols=("sub",))
        # 3 sessions -> 3 pairs x 2 rois
        assert len(pairs) == 6
        row = pairs[(pairs.rep_a == "a") & (pairs.rep_b == "b") & (pairs.roi == "r1")].iloc[0]
        assert row.value_a == 1 and row.value_b == 3


class TestFigures:
    def test_figure_writers(self, tmp_path):
        rng = np.random.default_rng(2)
        p1 = cov_boxplot({"inter-run": rng.uniform(1, 5, 10),
                          "inter-ses": rng.uniform(2, 7, 10)},
                         str(tmp_path / "cov.png"))
        p2 = pearson_scatter(rng.uniform(50, 150, 20), rng.uniform(50, 150, 20),
                             str(tmp_path / "pearson.png"))
        df = pd.DataFrame({"tissue": ["wm"] * 5 + ["gm"] * 5,
                           "mean": rng.uniform(60, 120, 10),
                           "roi": list("abcde") * 2})
        p3 = tissue_violin(df, str(tmp_path / "violin.png"))
        p4 = t2_boxplot(df, str(tmp_path / "box.png"))
        import os
        for p in (p1, p2, p3, p4):
            assert os.path.exists(p) and os.path.getsize(p) > 0


class TestMapAndCurveFigures:
    def test_map_montage(self, tmp_path):
        from fetal_t2mapping_tpu.analysis.figures import map_montage

        rng = np.random.default_rng(3)
        data = rng.uniform(50, 600, (12, 16, 16)).astype(np.float32)
        mask = np.zeros(data.shape, bool)
        mask[:, 4:12, 4:12] = True
        p = map_montage(data, str(tmp_path / "montage.png"), n_slices=3,
                        mask=mask, title="t2")
        import os
        assert os.path.exists(p) and os.path.getsize(p) > 0

    def test_relaxation_curves_r2_exact_fit(self, tmp_path):
        from fetal_t2mapping_tpu.analysis.figures import relaxation_curves

        tes = np.array([114.0, 202.0, 299.0])
        k, t2 = 1200.0, 150.0
        means = k * np.exp(-tes / t2)
        p = relaxation_curves(tes, {"wm": means}, str(tmp_path / "curves.png"),
                              fits={"wm": (k, t2)},
                              roi_stds={"wm": 0.05 * means},
                              gt={"wm": 150.0})
        import os
        assert os.path.exists(p) and os.path.getsize(p) > 0
