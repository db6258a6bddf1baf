"""Secondary benchmark: SynthSeg-topology 3-D U-Net inference on one chip.

Prints one JSON line (not the driver headline — that is repo-root
bench.py). Baseline anchor: the reference shells out to FreeSurfer's
`mri_synthseg` (reference utils/qmri_utils.py:424-466), which runs the same
5-level/24-feature U-Net topology at ~10-60 s per volume on CPU (the
documented SynthSeg CPU envelope). Here the forward pass is pure XLA convs
on the MXU (labels/unet3d.py); random weights — the arithmetic is
weight-agnostic.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    from fetal_t2mapping_tpu.labels.unet3d import (UNetConfig, pad_to_divisor,
                                                   random_params,
                                                   s2d_level0_params,
                                                   unet_apply, unet_apply_s2d)

    cfg = UNetConfig()
    params_np = random_params(cfg)
    params = {k: jax.device_put(v) for k, v in params_np.items()}
    s2d = {k: jax.device_put(v)
           for k, v in s2d_level0_params(params_np, cfg).items()}
    n = 160                                   # SynthSeg's native 160^3 crop
    rng = np.random.default_rng(0)
    vol = rng.random((n, n, n)).astype(np.float32)
    x, _ = pad_to_divisor(vol, cfg.divisor)
    x = jax.device_put(x[None, ..., None])

    import jax.numpy as jnp

    # production path: exact space-to-depth level 0 (bf16 MXU inputs)
    apply = jax.jit(lambda p, s, v: unet_apply_s2d(p, s, v, cfg, jnp.bfloat16))
    out = apply(params, s2d, x)               # compile
    float(out.mean())

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = apply(params, s2d, x)
        float(out.mean())
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(json.dumps({
        "metric": "unet3d_synthseg_160_forward_seconds",
        "value": round(dt, 3),
        "unit": f"s per {n}^3 volume (5-level/24-feature U-Net, "
                f"{cfg.n_labels}-label head, space-to-depth level-0 "
                "bf16 XLA convs)",
        "volumes_per_sec": round(1.0 / dt, 2),
    }))


if __name__ == "__main__":
    main()
