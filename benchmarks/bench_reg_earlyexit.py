"""Early-exit registration speedup at 192^3 on the TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from fetal_t2mapping_tpu.core.volume import Volume
from fetal_t2mapping_tpu.recon.registration import register_rigid, register_rigid_multi
from fetal_t2mapping_tpu.recon.resample import resample_to_reference

N = 192
rng = np.random.default_rng(0)
base = rng.standard_normal((N // 8, N // 8, N // 8)).astype(np.float32)
data = jax.image.resize(jnp.asarray(base), (N, N, N), "cubic")
fixed = Volume(np.asarray(data), spacing=(1.0, 1.0, 1.0))
center = np.asarray(fixed.center_world())

def pose(rx, ry, rz, t):
    cx, sx = np.cos(rx), np.sin(rx); cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    R = (np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
         @ np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
         @ np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]]))
    T = np.eye(4); T[:3, :3] = R; T[:3, 3] = center - R @ center + np.asarray(t)
    return T

T = pose(0.05, -0.04, 0.04, (4.0, -3.0, 3.0))
moving = resample_to_reference(fixed, fixed, transform=T)

def recov(reg):
    comp = T @ reg.matrix
    rot = float(np.arccos(np.clip((np.trace(comp[:3, :3]) - 1) / 2, -1, 1)))
    tr = float(np.abs(comp[:3, 3] - center + comp[:3, :3] @ center).max())
    return rot, tr

def timeit(fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    return float(np.median(ts))

for tol in (None, 1e-3):
    f = lambda: jax.block_until_ready(
        register_rigid(fixed, moving, stop_tol=tol).params_device)
    dt = timeit(f)
    reg = register_rigid(fixed, moving, stop_tol=tol)
    rot, tr = recov(reg)
    print(f"single stop_tol={tol}: {dt:.3f} s, iters_run={reg.iters_run}, "
          f"recovery {rot:.2e} rad / {tr:.2e} mm", flush=True)

movs = [resample_to_reference(fixed, fixed, transform=pose(*p)) for p in
        [(0.05, -0.04, 0.04, (4.0, -3.0, 3.0)),
         (-0.04, 0.05, -0.03, (-3.0, 4.0, -2.0)),
         (0.03, 0.02, 0.05, (2.0, 2.0, -4.0)),
         (-0.05, -0.03, -0.04, (-4.0, -2.0, 2.0))]]
for tol in (None, 1e-3):
    f = lambda: jax.block_until_ready(
        [r.params_device for r in register_rigid_multi(fixed, movs, stop_tol=tol)])
    dt = timeit(f)
    regs = register_rigid_multi(fixed, movs, stop_tol=tol)
    print(f"multi4 stop_tol={tol}: {dt:.3f} s ({dt/4:.3f}/pair), "
          f"iters_run={regs[0].iters_run}", flush=True)
