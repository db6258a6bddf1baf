"""Headline benchmark: dense 256^3 multi-echo voxel T2 fit on one TPU chip.

Prints ONE JSON line:
  {"metric": "t2fit_voxels_per_sec", "value": ..., "unit": "voxels/s",
   "vs_baseline": ...}

Baseline: the reference fits one full map in ~150 s on a 20-process CPU
workstation (reference run_t2mapping.py:440-442, "~2-3 minutes"). Treating
that generously as the full 256^3 = 16.7M voxels gives a baseline rate of
16.7e6/150 ~ 1.12e5 voxels/s; vs_baseline = our_rate / baseline_rate.

The timed path is the fused Pallas kernel (models.pallas_fit.fit_fused):
log-linear init + damped projected-Newton loop entirely in VMEM, with an
on-device two-phase straggler compaction. Accuracy is asserted against the
scipy curve_fit oracle on a subsample before timing counts; all large
arrays stay on device (only scalars and the 256-voxel subsample cross the
host link).
"""

import json
import sys
import time

import numpy as np

N_SIDE = 256
TES = (114.0, 202.0, 299.0)
BASELINE_VOXELS_PER_SEC = 16_777_216 / 150.0


def main(model: str = "gaussian"):
    import jax
    import jax.numpy as jnp
    from fetal_t2mapping_tpu.models.pallas_fit import fit_fused

    n = N_SIDE ** 3
    rng = np.random.default_rng(0)
    te = np.asarray(TES, np.float32)
    k = rng.uniform(600.0, 5000.0, n).astype(np.float32)
    t2 = rng.uniform(20.0, 500.0, n).astype(np.float32)
    sig = (k[:, None] * np.exp(-te[None, :] / t2[:, None])).astype(np.float32)
    sig = np.maximum(sig + rng.normal(0, 8.0, sig.shape).astype(np.float32), 1e-2)

    if model == "gaussian":
        lo = (0.0, 10.0)
        hi = (1e6, 2000.0)
        kwargs = {}
    else:
        # secondary benchmark: the 3-parameter models with in-kernel multistart
        lo = (1.0, 10.0, 1.0)
        hi = (1e6, 2000.0, 1000.0)
        kwargs = dict(guess=(650.0, 110.0, 40.0))

    def fit(signal):
        return fit_fused(signal, TES, lo, hi, model=model,
                         phase1_iters=10, max_iters=60, **kwargs)

    sig_dev = jax.device_put(sig)

    # warmup/compile; the scalar read syncs the whole pipeline before any
    # host gather (gathering from an in-flight result stalls the tunnel)
    res = fit(sig_dev)
    float(jnp.mean(res.fun))

    # accuracy gate: BASELINE.md metric — rel T2 error vs scipy curve_fit on
    # a subsample (noise-limited truth error is NOT the solver's error).
    # Only the 256 sampled rows cross the host link.
    from fetal_t2mapping_tpu.models.oracle import curve_fit_t2

    idx = np.random.default_rng(1).choice(n, 256, replace=False)
    x_idx = np.asarray(res.x[jnp.asarray(idx)])
    ref = curve_fit_t2(sig[idx], te, lo=lo[:2], hi=hi[:2])
    interior = (ref[:, 1] > 15.0) & (ref[:, 1] < 1900.0)
    rel_cf = np.abs(x_idx[interior, 1] - ref[interior, 1]) / ref[interior, 1]
    t2_dev = jax.device_put(t2)
    med_rel = float(jnp.median(jnp.abs(res.x[:, 1] - t2_dev) / t2_dev))
    conv_rate = float(jnp.mean(res.converged.astype(jnp.float32)))
    # gaussian model must match the curve_fit oracle tightly (same objective);
    # the 3-param models fit an extra noise parameter, which legitimately
    # shifts T2 away from the 2-param LSQ answer — gate them on the median
    # error against the known simulation truth instead
    if model == "gaussian":
        if rel_cf.max() > 1e-3:
            print(f"accuracy gate FAILED: max rel T2 err vs curve_fit "
                  f"{rel_cf.max():.2e} > 1e-3; refusing to report a throughput "
                  "number for wrong answers", file=sys.stderr)
            raise SystemExit(1)
    elif med_rel > 5e-2:
        print(f"accuracy gate FAILED: median rel T2 err vs truth {med_rel:.2e} "
              "> 5e-2", file=sys.stderr)
        raise SystemExit(1)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fit(sig_dev)
        float(jnp.mean(out.fun))  # scalar host read = full-pipeline sync
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    rate = n / dt
    metric = ("t2fit_voxels_per_sec" if model == "gaussian"
              else f"t2fit_{model}_voxels_per_sec")
    print(json.dumps({
        "metric": metric,
        "value": round(rate, 1),
        "unit": "voxels/s",
        "vs_baseline": round(rate / BASELINE_VOXELS_PER_SEC, 2),
    }))
    print(f"# 256^3 x {len(TES)} TEs {model} fit (fused pallas): {dt*1e3:.1f} ms/volume, "
          f"max rel T2 err vs curve_fit {rel_cf.max():.2e} (median vs truth {med_rel:.2e}), "
          f"converged {conv_rate:.3f}",
          file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[sys.argv.index("--model") + 1] if "--model" in sys.argv else "gaussian")
