"""Profiler accumulator + LUT T2 estimator."""

import numpy as np

from fetal_t2mapping_tpu.models.lut import lut_t2_host
from fetal_t2mapping_tpu.utils.profiling import Profiler, profiler, trace


def test_profiler_accumulates_and_reports():
    p = Profiler()
    with p.stage("fit", items=1000):
        pass
    with p.stage("fit", items=500):
        pass
    with p.stage("io"):
        pass
    s = p.stats("fit")
    assert s.calls == 2 and s.items == 1500
    rep = p.report()
    assert "fit" in rep and "io" in rep
    d = p.as_dict()
    assert d["fit"]["items"] == 1500
    p.reset()
    assert p.stats("fit") is None


def test_global_profiler_exists():
    with profiler.stage("test_stage"):
        pass
    assert profiler.stats("test_stage").calls >= 1


def test_trace_degrades_gracefully(tmp_path):
    # must never raise, whatever the backend supports
    with trace(str(tmp_path)):
        pass


def test_lut_recovers_t2_noiseless():
    rng = np.random.default_rng(0)
    te = [114.0, 202.0, 299.0]
    k = rng.uniform(500.0, 4000.0, 512).astype(np.float32)
    t2 = rng.uniform(30.0, 800.0, 512).astype(np.float32)
    sig = k[:, None] * np.exp(-np.asarray(te)[None, :] / t2[:, None])
    out = lut_t2_host(sig, te)
    rel_t2 = np.abs(out[:, 1] - t2) / t2
    rel_k = np.abs(out[:, 0] - k) / k
    assert rel_t2.max() < 2e-3, rel_t2.max()
    assert rel_k.max() < 2e-2


def test_lut_is_noise_tolerant_enough_for_init():
    rng = np.random.default_rng(1)
    te = [114.0, 202.0, 299.0]
    t2 = np.full(2000, 120.0, np.float32)
    sig = 1000.0 * np.exp(-np.asarray(te)[None, :] / t2[:, None])
    sig = np.maximum(sig + rng.normal(0, 10, sig.shape), 1.0).astype(np.float32)
    out = lut_t2_host(sig, te)
    assert abs(np.median(out[:, 1]) - 120.0) / 120.0 < 0.05
