"""Physical-space volume resampling on device.

Replaces the reference's ``sitk.Resample`` calls: iso-resampling to 1 mm^3
(reference utils/qmri_utils.py:35-80), label/mask resampling to a reference
grid (:468-589) and transform application. The kernel is one trilinear (or
nearest) gather over the target grid's world points, fully direction-aware
— unlike the reference's fusion grid, which assumes axis-aligned direction.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.volume import Volume
from ..ops.interp import sample_nearest, sample_trilinear


def _world_to_index_matrix(vol: Volume):
    """(3x3 matrix, origin) mapping world(LPS) -> continuous (x,y,z) index."""
    M = vol.direction_matrix @ np.diag(vol.spacing)
    return np.linalg.inv(M), np.asarray(vol.origin)


def sample_volume_at_world(vol: Volume, world_pts, *, method: str = "linear",
                           cval: float = 0.0):
    """Sample ``vol`` at (N, 3) world (x,y,z) points; returns (N,) values."""
    inv, origin = _world_to_index_matrix(vol)
    pts = jnp.asarray(world_pts, jnp.float32)
    idx_xyz = (pts - jnp.asarray(origin, jnp.float32)) @ jnp.asarray(inv.T, jnp.float32)
    coords_zyx = idx_xyz[..., ::-1]
    data = jnp.asarray(vol.data)
    if method == "linear":
        return sample_trilinear(data, coords_zyx, cval=cval)
    if method == "nearest":
        return sample_nearest(data, coords_zyx, cval=cval)
    raise ValueError(f"unknown method {method!r}")


def resample_volume(vol: Volume, new_spacing: Sequence[float] = (1.0, 1.0, 1.0),
                    *, method: str = "linear", cval: float = 0.0,
                    device: bool = False) -> Volume:
    """Resample to a new voxel spacing (same origin/direction).

    New size = round(old_size * old_spacing / new_spacing), matching the
    reference (utils/qmri_utils.py:77). ``device=True`` keeps the result
    on device (see :func:`resample_to_reference`).
    """
    new_size = [int(round(osz * ospc / nspc))
                for osz, ospc, nspc in zip(vol.size, vol.spacing, new_spacing)]
    target = Volume(
        data=np.zeros(new_size[::-1], np.float32),
        spacing=tuple(float(s) for s in new_spacing),
        origin=vol.origin,
        direction=vol.direction,
    )
    return resample_to_reference(vol, target, method=method, cval=cval,
                                 device=device)


@jax.jit
def _compose_device_transform(T, M_inv, A_ref, ref_origin, origin):
    """index_ref -> index_vol affine from a DEVICE world transform (one
    program; eager slicing/matmuls would each be a singleton program
    paying seconds of remote load per process on the tunneled chip)."""
    R3, t3 = T[:3, :3], T[:3, 3]
    B_T = (M_inv @ R3 @ A_ref).T
    c = M_inv @ (R3 @ ref_origin + t3 - origin)
    return B_T, c


@functools.partial(jax.jit, static_argnames=("shape", "method"))
def _affine_gather(data, B_T, c, cval, *, shape, method):
    """Sample ``data`` at continuous (x,y,z) indices B @ idx_ref + c for every
    voxel of a (nz, ny, nx) target grid — the index grid is generated ON
    DEVICE (broadcasted_iota), so nothing but the source volume and the tiny
    affine crosses the host link. ``cval`` is a traced operand: NaN (used by
    fusion to mark out-of-FOV) as a static arg would never hit the jit cache
    (NaN != NaN) and every warp would recompile."""
    nz, ny, nx = shape
    iz = jax.lax.broadcasted_iota(jnp.float32, shape, 0)
    iy = jax.lax.broadcasted_iota(jnp.float32, shape, 1)
    ix = jax.lax.broadcasted_iota(jnp.float32, shape, 2)
    idx_xyz = jnp.stack([ix, iy, iz], axis=-1).reshape(-1, 3)
    coords_zyx = (idx_xyz @ B_T + c)[..., ::-1]
    sampler = sample_trilinear if method == "linear" else sample_nearest
    return sampler(data, coords_zyx, cval=cval).reshape(shape)


def resample_to_reference(vol: Volume, ref: Volume, *, transform: Optional[np.ndarray] = None,
                          method: str = "linear", cval: float = 0.0,
                          device: bool = False) -> Volume:
    """Resample ``vol`` onto the grid of ``ref``.

    One fused affine-index gather: the target's voxel indices map straight to
    continuous source indices through a single 3x3 matrix
    (inv(M_src) @ T @ M_ref), composed on host, applied on device.

    Args:
        transform: optional 4x4 world->world matrix mapping reference-space
            points into ``vol``'s space (a registration result). Identity if
            None.
        device: return the warped data as a device array instead of
            transferring it to host — for callers that keep computing on
            device (e.g. fusion accumulates warped volumes in HBM and
            transfers only the final fused volume). ``vol.data`` may
            likewise already be a device array (the upload is skipped).
    """
    A_ref = ref.direction_matrix @ np.diag(ref.spacing)      # idx(x,y,z)->world
    M_inv, origin = _world_to_index_matrix(vol)
    if transform is not None and not isinstance(transform, np.ndarray) \
            and type(transform).__module__.split(".")[0] != "numpy":
        # device transform (e.g. RegistrationResult.matrix_device): compose
        # B/c ON DEVICE so a registration->warp chain never syncs the host
        # (one jitted program — eager slicing/matmuls here would each be a
        # singleton program paying seconds of remote load per process)
        B_T, c = _compose_device_transform(
            jnp.asarray(transform, jnp.float32),
            np.asarray(M_inv, np.float32), np.asarray(A_ref, np.float32),
            np.asarray(ref.origin, np.float32), np.asarray(origin, np.float32))
    else:
        # host transform: compose B/c in numpy and hand plain fp32 arrays
        # to the jit — each eager jnp.asarray/convert here would become
        # its own singleton device program, and on the tunneled chip every
        # first program execution pays seconds of remote load (measured
        # dominating pipeline cold-start)
        T = np.eye(4) if transform is None else np.asarray(transform, np.float64)
        B = M_inv @ T[:3, :3] @ A_ref
        c = np.asarray(
            M_inv @ (T[:3, :3] @ np.asarray(ref.origin) + T[:3, 3] - origin),
            np.float32)
        B_T = np.ascontiguousarray(B.T, np.float32)
    data_in = vol.data
    if isinstance(data_in, np.ndarray) and data_in.dtype == np.float64:
        data_in = data_in.astype(np.float32)        # host cast, no program
    vals = _affine_gather(
        data_in, B_T, c, np.float32(cval),
        shape=tuple(int(s) for s in ref.shape), method=method)
    if device:
        data = vals
        if method == "nearest":
            data = data.astype(np.asarray(vol.data).dtype
                               if isinstance(vol.data, np.ndarray)
                               else vol.data.dtype)
    else:
        data = np.asarray(vals, np.float32)
        if method == "nearest":
            data = data.astype(np.asarray(vol.data).dtype)
    return Volume(data=data, spacing=ref.spacing, origin=ref.origin, direction=ref.direction)
