"""Headline benchmark: dense 256^3 multi-echo voxel T2 fits on one TPU chip.

Emits ONE JSON line per fit configuration — every noise model the reference
supports (gaussian, gaussian_rician, rician; reference run_t2mapping.py:29-111)
plus a 6-echo gaussian row — each with accuracy, convergence and overflow
fields, and an exp-unit roofline line. The HEADLINE metric (gaussian, 3 TEs,
the reference protocol) is printed LAST so drivers that parse the final line
keep working:
  {"metric": "t2fit_voxels_per_sec", "value": ..., "unit": "voxels/s",
   "vs_baseline": ...}

Baseline: the reference fits one full map in ~150 s on a 20-process CPU
workstation (reference run_t2mapping.py:440-442, "~2-3 minutes"). Treating
that generously as the full 256^3 = 16.7M voxels gives a baseline rate of
16.7e6/150 ~ 1.12e5 voxels/s; vs_baseline = our_rate / baseline_rate.

The timed path is the fused Pallas kernel (models.pallas_fit.fit_fused,
strategy='single'): log-linear init + the FULL damped projected-Newton
budget entirely in VMEM, one kernel pass, per-block early exit — no
compaction traffic (measured: the two-phase merge scatter alone costs
~85 ms at 256^3; the single-phase kernel does the whole job in ~104 ms).
n_overflow is structurally 0 on this path. Accuracy is asserted against
the scipy curve_fit oracle on a subsample before timing counts; all large
arrays stay on device (only scalars and the 256-voxel subsample cross the
host link).

Roofline: the fit is bound by the VPU's transcendental unit (T exps per
voxel-iteration; everything else is a handful of VPU mul/adds that
pipeline behind them). ``exp_unit_peak`` measures the chip's exp
throughput with a dependent-chain microbenchmark; ``exp_utilization`` is
the fit's achieved exp rate (accepted-step count x T exps — a LOWER bound:
rejected trial steps also burn exps) against that peak.
"""

import json
import sys
import time

import numpy as np

N_SIDE = 256
TES3 = (114.0, 202.0, 299.0)
TES6 = (114.0, 150.0, 202.0, 250.0, 299.0, 350.0)
BASELINE_VOXELS_PER_SEC = 16_777_216 / 150.0


def _make_data(n, tes, seed=0):
    rng = np.random.default_rng(seed)
    te = np.asarray(tes, np.float32)
    k = rng.uniform(600.0, 5000.0, n).astype(np.float32)
    t2 = rng.uniform(20.0, 500.0, n).astype(np.float32)
    sig = (k[:, None] * np.exp(-te[None, :] / t2[:, None])).astype(np.float32)
    sig = np.maximum(sig + rng.normal(0, 8.0, sig.shape).astype(np.float32), 1e-2)
    return sig, k, t2


def exp_unit_peak(jax, jnp):
    """Measured exp/s on this chip: dependent exp chain over 4M lanes."""
    from jax import lax

    n = 1 << 22
    iters = 1024  # long chain amortizes the tunnel's fixed dispatch latency

    @jax.jit
    def run(x):
        def body(y, _):
            return jnp.exp(y) * 1e-6, None  # y ~ 1e-6: stable, non-constant
        y, _ = lax.scan(body, x, None, length=iters)
        return y

    x = jnp.full((n,), 1e-6, jnp.float32)
    float(jnp.mean(run(x)))  # compile + warm
    t0 = time.perf_counter()
    float(jnp.mean(run(x)))  # scalar read = full sync
    dt = time.perf_counter() - t0
    return n * iters / dt


def kernel_marginal_ps(jax, jnp, tes):
    """Marginal per-voxel-iteration cost of the gaussian Newton kernel:
    two-point timing of the phase-1 pallas call at different iteration
    budgets on pre-tiled device data (isolates the loop body from init,
    DMA and compaction)."""
    from fetal_t2mapping_tpu.models.pallas_fit import (
        _gauss_fit_tiles, _to_tiles)

    n = N_SIDE ** 3
    sig, _, _ = _make_data(n, tes, seed=2)
    tiles = jax.jit(lambda s: _to_tiles(s, n)[0])(jax.device_put(sig))
    n_pad = int(tiles.shape[1]) * int(tiles.shape[2])
    float(jnp.mean(tiles))
    te_t = tuple(float(t) for t in tes)
    kw = dict(te=te_t, lo=(0.0, 10.0), hi=(1e6, 2000.0), ftol=1e-9)

    def timed(iters):
        f = lambda: _gauss_fit_tiles(tiles, max_iters=iters, **kw)[1]
        float(jnp.mean(f()))  # compile
        t0 = time.perf_counter()
        outs = [f() for _ in range(4)]
        float(sum(jnp.mean(o) for o in outs))
        return (time.perf_counter() - t0) / 4

    t_lo, t_hi = timed(2), timed(12)
    return (t_hi - t_lo) / 10.0 / n_pad * 1e12


def run_model(model, tes, *, headline=False):
    import jax
    import jax.numpy as jnp
    from fetal_t2mapping_tpu.models.pallas_fit import fit_fused

    n = N_SIDE ** 3
    sig, k, t2 = _make_data(n, tes)

    if model == "gaussian":
        lo, hi = (0.0, 10.0), (1e6, 2000.0)
        kwargs = {}  # reference runs gaussian at ftol 1e-6; ours is tighter (1e-9)
    else:
        # the 3-parameter models run the in-kernel 3-start multistart, at the
        # reference's production tolerances for these objectives (ftol/gtol
        # 1e-2, reference run_t2mapping.py:38-106): the sigma direction is a
        # flat ridge at 3 TEs (0 dof), so a 1e-9 ftol never "converges" and
        # only burns refit rounds polishing noise
        lo, hi = (1.0, 10.0, 1.0), (1e6, 2000.0, 1000.0)
        kwargs = dict(guess=(650.0, 110.0, 40.0), ftol=1e-2, gtol=1e-2)

    def fit(signal):
        return fit_fused(signal, tes, lo, hi, model=model,
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

    # identifiability filter ON THE TRUTH: voxels whose noiseless signal at
    # the last TE is under 3 sigma of the noise are fitting pure noise — the
    # SSE argmin there is a degenerate ridge where curve_fit and any other
    # optimizer legitimately land at different (k, T2) of equal objective
    # (the reference prints per-voxel FAIL on these, run_t2mapping.py:301).
    ident = np.flatnonzero(k * np.exp(-tes[-1] / t2) >= 3 * 8.0)
    idx = np.random.default_rng(1).choice(ident, 256, replace=False)
    x_idx = np.asarray(res.x[jnp.asarray(idx)])
    ref = curve_fit_t2(sig[idx], np.asarray(tes, np.float32),
                       lo=lo[:2], hi=hi[:2])
    interior = (ref[:, 1] > 15.0) & (ref[:, 1] < 1900.0)
    rel_cf = np.abs(x_idx[interior, 1] - ref[interior, 1]) / ref[interior, 1]
    t2_dev = jax.device_put(t2)
    med_rel = float(jnp.median(jnp.abs(res.x[:, 1] - t2_dev) / t2_dev))
    conv_rate = float(jnp.mean(res.converged.astype(jnp.float32)))
    n_overflow = int(res.n_overflow)
    mean_iters = float(jnp.mean(res.n_iter.astype(jnp.float32)))
    # gaussian must match the curve_fit oracle tightly (same objective); the
    # 3-param models fit an extra noise parameter, which legitimately shifts
    # T2 away from the 2-param LSQ answer — gate them on the median error
    # against the known simulation truth instead
    if model == "gaussian":
        if rel_cf.max() > 1e-3:
            print(f"accuracy gate FAILED ({model}): max rel T2 err vs "
                  f"curve_fit {rel_cf.max():.2e} > 1e-3; refusing to report "
                  "a throughput number for wrong answers", file=sys.stderr)
            raise SystemExit(1)
    elif med_rel > 5e-2:
        print(f"accuracy gate FAILED ({model}): median rel T2 err vs truth "
              f"{med_rel:.2e} > 5e-2", file=sys.stderr)
        raise SystemExit(1)

    # amortized timing: the tunneled chip costs ~200 ms of FIXED dispatch +
    # sync latency per host round trip (observed: 1 fit 430 ms, 16 chained
    # fits 230 ms/fit); chaining REPS dispatches per scalar-read sync times
    # the device, not the tunnel
    reps = 4
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fit(sig_dev) for _ in range(reps)]
        float(sum(jnp.mean(o.fun) for o in outs))  # one sync for the chain
        times.append((time.perf_counter() - t0) / reps)
    dt = float(np.median(times))

    rate = n / dt
    metric = ("t2fit_voxels_per_sec" if headline
              else f"t2fit_{model}_{len(tes)}te_voxels_per_sec")
    record = {
        "metric": metric,
        "value": round(rate, 1),
        "unit": "voxels/s",
        "vs_baseline": round(rate / BASELINE_VOXELS_PER_SEC, 2),
        "max_rel_t2_err_vs_curvefit": float(f"{rel_cf.max():.3g}"),
        "median_rel_t2_err_vs_truth": float(f"{med_rel:.3g}"),
        "converged": round(conv_rate, 4),
        "n_overflow": n_overflow,
    }
    if model != "gaussian":
        record["note"] = (
            "vs_curvefit here measures the LEGITIMATE T2 shift of the "
            "3-parameter noise model against the 2-param gaussian LSQ "
            "oracle (curve_fit fits no sigma), not solver error; these "
            "models gate on median-vs-truth < 5e-2")
    print(f"# 256^3 x {len(tes)} TEs {model} fit (fused pallas): "
          f"{dt*1e3:.1f} ms/volume, max rel T2 err vs curve_fit "
          f"{rel_cf.max():.2e} (median vs truth {med_rel:.2e}), converged "
          f"{conv_rate:.4f}, n_overflow {n_overflow}, mean iters "
          f"{mean_iters:.1f}", file=sys.stderr)
    return record, dt, mean_iters


def run_volume_serving():
    """Serving-path row: fit_volume on a 240^3 stack with an ellipsoid
    'brain' mask — ONE jitted program (device mask compaction -> fused fit
    -> packed dense-map scatter). Data is generated ON DEVICE (a 166 MB
    host upload would time the tunnel, not the chip)."""
    import jax
    import jax.numpy as jnp
    from fetal_t2mapping_tpu.models.volume_fit import fit_volume

    n_side, te = 240, TES3
    te_arr = jnp.asarray(te, jnp.float32)

    @jax.jit
    def make_data(key):
        kk, kt, kn = jax.random.split(key, 3)
        shape = (n_side, n_side, n_side)
        k = jax.random.uniform(kk, shape, jnp.float32, 600.0, 5000.0)
        t2 = jax.random.uniform(kt, shape, jnp.float32, 20.0, 500.0)
        sig = k[..., None] * jnp.exp(-te_arr / t2[..., None])
        sig = jnp.maximum(sig + 8.0 * jax.random.normal(kn, sig.shape), 1e-2)
        ax = (jnp.arange(n_side, dtype=jnp.float32) - (n_side - 1) / 2) / (n_side / 2)
        zz, yy, xx = jnp.meshgrid(ax, ax, ax, indexing="ij")
        mask = (zz / 0.75) ** 2 + (yy / 0.85) ** 2 + (xx / 0.65) ** 2 <= 1.0
        return sig, mask, t2

    sig, mask, t2 = make_data(jax.random.PRNGKey(0))
    # ellipsoid touches ~122K 32-voxel blocks (~3.9M voxels of block
    # capacity) for 3.0M masked voxels; 0.30 covers it with headroom.
    # check_capacity=False keeps the chained reps async (its host sync
    # would serialize every rep on the tunnel's ~200 ms RPC latency);
    # the gate below watches result.n_overflow instead.
    fit = lambda: fit_volume(sig, mask, te, (0.0, 10.0), (1e6, 2000.0),
                             model="gaussian", mask_frac=0.30,
                             check_capacity=False)
    res = fit()
    n_masked = int(res.n_masked)
    n_overflow = int(res.n_overflow)
    m = mask
    med_rel = float(jnp.median(jnp.abs(res.t2[m] - t2[m]) / t2[m]))
    conv = float(jnp.mean(res.converged[m].astype(jnp.float32)))
    if n_overflow or med_rel > 5e-2:
        print(f"serving gate FAILED: n_overflow {n_overflow}, "
              f"median rel T2 err {med_rel:.2e}", file=sys.stderr)
        raise SystemExit(1)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fit() for _ in range(4)]
        float(sum(jnp.mean(o.fun) for o in outs))
        times.append((time.perf_counter() - t0) / 4)
    dt = float(np.median(times))
    rate = n_masked / dt
    print(f"# 240^3 serving fit_volume: {dt*1e3:.1f} ms end-to-end, "
          f"{n_masked} masked voxels, conv {conv:.4f}, med rel err "
          f"{med_rel:.2e}", file=sys.stderr)
    print(json.dumps({
        "metric": "t2fit_volume_serving_voxels_per_sec",
        "value": round(rate, 1),
        "unit": "masked voxels/s (240^3 grid, ellipsoid mask, one jitted "
                "compact->fit->scatter program)",
        "vs_baseline": round(rate / BASELINE_VOXELS_PER_SEC, 2),
        "median_rel_t2_err_vs_truth": float(f"{med_rel:.3g}"),
        "converged": round(conv, 4),
        "n_overflow": n_overflow,
    }))
    sys.stdout.flush()


def main(only=None):
    import jax
    import jax.numpy as jnp

    configs = [
        ("gaussian_rician", TES3, False),
        ("rician", TES3, False),
        ("gaussian", TES6, False),
        ("gaussian", TES3, True),  # headline LAST: drivers parse the final line
    ]
    if only:
        configs = [c for c in configs if c[0] == only] or \
            [(only, TES3, only == "gaussian")]

    if not only:
        run_volume_serving()

    for model, tes, headline in configs:
        record, dt, mean_iters = run_model(model, tes, headline=headline)
        if headline:
            # roofline lines before the headline line: measured exp peak for
            # context, and the kernel's MARGINAL per-voxel-iteration cost
            # (two-point fit over the iteration budget), the honest
            # hardware-utilization number for a VPU-bound kernel
            peak = exp_unit_peak(jax, jnp)
            achieved = N_SIDE ** 3 * mean_iters * len(tes) / dt
            print(json.dumps({
                "metric": "exp_unit_utilization",
                "value": round(achieved / peak, 4),
                "unit": "useful-exp fraction of measured exp peak "
                        f"({peak/1e9:.1f} G exp/s); the kernel is VPU-bound,"
                        " not exp-bound",
                "vs_baseline": None,
            }))
            marg = kernel_marginal_ps(jax, jnp, tes)
            print(json.dumps({
                "metric": "kernel_marginal_ps_per_voxel_iteration",
                "value": round(marg, 1),
                "unit": "ps (1-VPU-op/cycle model for the ~200-op Newton "
                        "body is ~210 ps)",
                "vs_baseline": None,
            }))
        print(json.dumps(record))
        sys.stdout.flush()


if __name__ == "__main__":
    main(sys.argv[sys.argv.index("--model") + 1] if "--model" in sys.argv else None)
