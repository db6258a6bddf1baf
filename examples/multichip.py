"""Multi-chip scaling surfaces, end to end on one host.

The reference scales with a 20-process fork over voxels on one machine
(reference run_t2mapping.py:442). This framework scales over a
`jax.sharding.Mesh`; three kernels carry the story, each demonstrated
below against its single-device result:

1. **Voxel-sharded fit** — the embarrassingly-parallel axis. The whole
   masked volume fit (`models.fit_volume`) runs on a Z-sharded stack;
   XLA partitions compaction, the Pallas/Newton solve and the map
   scatter, with one scalar psum for overflow accounting.
2. **Sample-sharded registration** — `register_rigid(mesh=)` shards the
   fixed-image sample axis; the metric/gradient sums (and MI's Parzen
   joint-histogram matmul) become psum collectives inside the same
   jitted multi-level Adam program.
3. **Spatially-partitioned U-Net** — `segment_volume(mesh=)` shards the
   volume's z axis with replicated weights; GSPMD inserts the conv halo
   exchanges at every level.

Run:  python examples/multichip.py
(on CPU it simulates an 8-device mesh via
--xla_force_host_platform_device_count; on TPU hardware the same code
runs over the real chips of the slice.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# simulate an 8-device mesh when running standalone on CPU (must happen
# before the backend initializes; under pytest the conftest already did it)
if ("cpu" in os.environ.get("JAX_PLATFORMS", "")
        and "host_platform_device_count" not in os.environ.get("XLA_FLAGS", "")):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import _platform  # noqa: F401  (JAX_PLATFORMS=cpu honor)

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from fetal_t2mapping_tpu.core.volume import Volume
from fetal_t2mapping_tpu.labels.unet3d import (UNetConfig, random_params,
                                               segment_volume)
from fetal_t2mapping_tpu.models.volume_fit import fit_volume
from fetal_t2mapping_tpu.parallel.mesh import VOXEL_AXIS, voxel_mesh
from fetal_t2mapping_tpu.recon.registration import register_rigid
from fetal_t2mapping_tpu.recon.resample import resample_to_reference

TES = (114.0, 202.0, 299.0)
LO, HI = (0.0, 10.0), (10000.0, 2000.0)


def sharded_fit(mesh, rng):
    """Z-sharded fit_volume vs the same volume on one device."""
    n_dev = mesh.devices.size
    z, y, x = 4 * n_dev, 24, 24
    t2 = rng.uniform(40.0, 400.0, (z, y, x)).astype(np.float32)
    k = rng.uniform(650.0, 900.0, (z, y, x)).astype(np.float32)
    te = np.asarray(TES, np.float32)
    vol = (k[..., None] * np.exp(-te / t2[..., None])).astype(np.float32)
    mask = rng.random((z, y, x)) < 0.5

    single = fit_volume(vol, mask, TES, LO, HI, max_iters=25)
    vol_sh = jax.device_put(
        vol, NamedSharding(mesh, P(VOXEL_AXIS, None, None, None)))
    mask_sh = jax.device_put(mask, NamedSharding(mesh, P(VOXEL_AXIS, None, None)))
    sharded = fit_volume(vol_sh, mask_sh, TES, LO, HI, mask_frac=1.0,
                         max_iters=25)
    m = np.asarray(mask)
    t2_s, t2_1 = np.asarray(sharded.t2)[m], np.asarray(single.t2)[m]
    rel_truth = np.abs(t2_s - t2[m]) / t2[m]
    return {
        "n_masked": int(m.sum()),
        "max_shard_vs_single_rel": float(
            np.abs(t2_s - t2_1).max() / np.abs(t2_1).max()),
        "max_rel_t2_err_vs_truth": float(rel_truth.max()),
        "overflow": int(sharded.n_overflow),
    }


def sharded_registration(mesh, rng):
    """mesh= rigid registration recovering a known pose."""
    n = 28
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    gz, gy, gx = np.meshgrid(ax, ax, ax, indexing="ij")
    img = (np.exp(-4 * (gz ** 2 + gy ** 2 + gx ** 2))
           * (1 + 0.4 * np.sin(7 * gx) * np.cos(5 * gy)
              + 0.2 * np.sin(6 * gz))).astype(np.float32)
    fixed = Volume(img)
    center = np.asarray(fixed.center_world())
    rot, trans = 0.04, np.array([1.5, -1.0, 1.0])
    c, s = np.cos(rot), np.sin(rot)
    T = np.eye(4)
    T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    T[:3, 3] = center - T[:3, :3] @ center + trans
    moving = resample_to_reference(fixed, fixed, transform=T)

    reg = register_rigid(fixed, moving, mesh=mesh, metric="ncc",
                         levels=(2, 1), sigmas=(1.0, 0.0), iters=(150, 100),
                         stop_tol=None)
    comp = T @ reg.matrix
    rot_err = float(np.arccos(np.clip((np.trace(comp[:3, :3]) - 1) / 2, -1, 1)))
    t_err = float(np.abs(comp[:3, 3] - center + comp[:3, :3] @ center).max())
    return {"rot_err_rad": rot_err, "trans_err_mm": t_err}


def sharded_unet(mesh, rng):
    """z-sharded U-Net labels vs the single-device program."""
    cfg = UNetConfig(n_levels=3, base_features=4, n_labels=7)
    params = random_params(cfg, seed=2)
    data = np.abs(rng.normal(400.0, 90.0,
                             (4 * mesh.devices.size, 20, 16))).astype(np.float32)
    single = segment_volume(params, data, cfg, compute_dtype=jnp.float32)
    sharded = segment_volume(params, data, cfg, compute_dtype=jnp.float32,
                             mesh=mesh)
    return {
        "label_agreement": float((single == sharded).mean()),
        "n_labels": int(len(np.unique(sharded))),
    }


def main():
    mesh = voxel_mesh()
    rng = np.random.default_rng(0)
    stats = {
        "n_devices": int(mesh.devices.size),
        "fit": sharded_fit(mesh, rng),
        "registration": sharded_registration(mesh, rng),
        "unet": sharded_unet(mesh, rng),
    }
    print(f"mesh: {stats['n_devices']} devices over axis {VOXEL_AXIS!r}")
    f = stats["fit"]
    print(f"fit_volume (z-sharded, {f['n_masked']} masked voxels): "
          f"shard-vs-single max rel {f['max_shard_vs_single_rel']:.2e}, "
          f"vs truth {f['max_rel_t2_err_vs_truth']:.2e}, "
          f"overflow {f['overflow']}")
    r = stats["registration"]
    print(f"register_rigid(mesh=): recovered pose to "
          f"{r['rot_err_rad']:.4f} rad / {r['trans_err_mm']:.2f} mm")
    u = stats["unet"]
    print(f"segment_volume(mesh=): sharded-vs-single label agreement "
          f"{u['label_agreement']:.4f} ({u['n_labels']} labels)")
    return stats


if __name__ == "__main__":
    main()
