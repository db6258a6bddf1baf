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

    def timed(fn):
        out = fn()                            # compile
        float(out.mean())
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            float(out.mean())
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    # production path: z-decomposed 2D convs, bf16 MXU inputs (argmax
    # labels, matching the s2d program's output semantics)
    dense = jax.jit(
        lambda p, v: jnp.argmax(unet_apply(p, v, cfg, jnp.bfloat16), -1))
    dt = timed(lambda: dense(params, x))
    # alternative: exact space-to-depth level 0 (FT2_UNET_S2D=1)
    s2d_fn = jax.jit(
        lambda p, s, v: unet_apply_s2d(p, s, v, cfg, jnp.bfloat16))
    dt_s2d = timed(lambda: s2d_fn(params, s2d, x))
    print(json.dumps({
        "metric": "unet3d_synthseg_160_forward_seconds",
        "value": round(dt, 3),
        "unit": f"s per {n}^3 volume (5-level/24-feature U-Net, "
                f"{cfg.n_labels}-label head, z-decomposed bf16 XLA convs; "
                f"space-to-depth-level-0 alternative {dt_s2d:.3f} s)",
        "volumes_per_sec": round(1.0 / dt, 2),
    }))


if __name__ == "__main__":
    main()
