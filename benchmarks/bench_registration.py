"""Secondary benchmark: 192^3 rigid registration on one TPU chip.

Prints one JSON line (not the driver headline — that is repo-root bench.py).
Baseline anchor: the reference's stage-2 hot loop is SimpleElastix rigid
registration per orientation pair (reference utils/qmri_utils.py:159-165),
typically seconds-to-tens-of-seconds per pair on CPU.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    from fetal_t2mapping_tpu.core.volume import Volume
    from fetal_t2mapping_tpu.recon.registration import register_rigid
    from fetal_t2mapping_tpu.recon.resample import resample_to_reference

    n = 192
    z, y, x = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing="ij")
    img = (1000 * np.exp(-3 * (z**2 + y**2 + x**2))
           * (1 + 0.3 * np.sin(6 * x) * np.cos(5 * y) + 0.2 * np.sin(7 * z))
           ).astype(np.float32)
    fixed = Volume(data=img, spacing=(1.0, 1.0, 1.0), origin=(0.0, 0.0, 0.0))

    th = np.deg2rad(4.0)
    T = np.eye(4)
    T[:3, :3] = [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    c = np.array([(n - 1) / 2.0] * 3)
    T[:3, 3] = [3.0, -2.0, 1.0] + c - T[:3, :3] @ c
    moving = resample_to_reference(fixed, fixed, transform=T)

    # Device-resident operands: a recon pipeline registers stacks that are
    # already on device, and the tunneled chip's host link would otherwise
    # dominate the measurement (28 MB/volume/call). jnp.asarray is a no-op
    # inside register_rigid when data already lives on device.
    import jax.numpy as jnp

    fixed = Volume(data=jnp.asarray(np.asarray(fixed.data)),
                   spacing=fixed.spacing, origin=fixed.origin,
                   direction=fixed.direction)
    moving = Volume(data=jnp.asarray(np.asarray(moving.data)),
                    spacing=moving.spacing, origin=moving.origin,
                    direction=moving.direction)

    reg = register_rigid(fixed, moving)  # warm-up/compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        reg = register_rigid(fixed, moving)
        # the result is device-lazy: block on the solved params so the
        # loop times the solve, not just its dispatch
        jax.block_until_ready(reg.params_device)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    back = resample_to_reference(moving, fixed, transform=reg.matrix)
    m = img > 50
    rel = float(np.median(np.abs(np.asarray(back.data)[m] - img[m])
                          / np.maximum(img[m], 1.0)))
    if rel > 0.01:
        print(f"registration quality gate FAILED: median warp err {rel:.4f}",
              file=sys.stderr)
        raise SystemExit(1)
    print(json.dumps({"metric": "rigid_registration_192_seconds", "value": round(dt, 2),
                      "unit": "s", "median_warp_err": round(rel, 5)}))


if __name__ == "__main__":
    main()
