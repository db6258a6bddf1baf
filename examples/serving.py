"""Production serving path: one jitted program per T2-mapping request.

The file pipeline (cli/t2mapping.py) mirrors the reference's study workflow
— NIfTI in, maps + CSVs out (reference run_t2mapping.py). A deployment
serving many requests wants something tighter: hold the echo stack on
device and run block-granular mask compaction -> fused Pallas fit ->
dense-map scatter as ONE XLA program per request (`models.fit_volume`),
with nothing crossing the host link but the input upload and whatever maps
the caller downloads.

This example synthesizes a brain-like request (anatomy-sized ellipsoid
mask, Rician-ish noise), "serves" it, and prints the per-request latency
budget and accuracy. On one TPU chip a 240^3 request with a ~3M-voxel mask
completes in ~130 ms end-to-end.

Run:  python examples/serving.py [n_requests]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _platform  # noqa: F401  (JAX_PLATFORMS=cpu honor)

import numpy as np

import jax
import jax.numpy as jnp

from fetal_t2mapping_tpu.config import fit_config
from fetal_t2mapping_tpu.models import fit_volume

TES = (114.0, 201.9, 299.3)          # LF HASTE protocol (config.py)
N_SIDE = 96                           # keep the demo quick on CPU; a real
                                      # deployment uses the full 240^3 FOV


def make_request(key, n_side):
    """Synthesize one request ON DEVICE (k, T2 truth + noisy echo stack)."""
    te = jnp.asarray(TES, jnp.float32)
    kk, kt, kn = jax.random.split(key, 3)
    shape = (n_side, n_side, n_side)
    k = jax.random.uniform(kk, shape, jnp.float32, 600.0, 3000.0)
    t2 = jax.random.uniform(kt, shape, jnp.float32, 40.0, 400.0)
    sig = k[..., None] * jnp.exp(-te / t2[..., None])
    sig = jnp.maximum(sig + 5.0 * jax.random.normal(kn, sig.shape), 1e-2)
    ax = (jnp.arange(n_side, dtype=jnp.float32) - (n_side - 1) / 2) / (n_side / 2)
    zz, yy, xx = jnp.meshgrid(ax, ax, ax, indexing="ij")
    mask = (zz / 0.8) ** 2 + (yy / 0.85) ** 2 + (xx / 0.7) ** 2 <= 1.0
    return sig, mask, t2


def main(n_requests=4):
    cfg = fit_config("gaussian", low_field=True)   # reference fit table bounds
    make = jax.jit(make_request, static_argnums=1)

    times = []
    stats = []
    for i in range(n_requests):
        sig, mask, t2 = make(jax.random.PRNGKey(i), N_SIDE)
        float(jnp.sum(mask.astype(jnp.float32)))   # request fully on device
        t0 = time.perf_counter()
        res = fit_volume(sig, mask, TES, cfg.lower, cfg.upper,
                         model="gaussian", mask_frac=0.6)
        n_masked = int(res.n_masked)               # syncs the program
        dt = time.perf_counter() - t0
        times.append(dt)
        m = np.asarray(mask)
        rel = np.abs(np.asarray(res.t2)[m] - np.asarray(t2)[m]) / np.asarray(t2)[m]
        stats.append({"ms": dt * 1e3, "n_masked": n_masked,
                      "median_rel_err": float(np.median(rel)),
                      "converged": float(np.asarray(res.converged)[m].mean()),
                      "n_overflow": int(res.n_overflow)})
        print(f"request {i}: {dt * 1e3:7.1f} ms  ({n_masked} masked voxels, "
              f"median rel T2 err {np.median(rel):.3%}, "
              f"converged {stats[-1]['converged']:.4f}, "
              f"overflow {int(res.n_overflow)})")

    warm = times[1:] or times
    print(f"\nwarm latency: {np.median(warm) * 1e3:.1f} ms/request "
          f"(first request includes compile)")
    return stats


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
