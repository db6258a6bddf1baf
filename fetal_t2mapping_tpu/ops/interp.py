"""Gather-based volume sampling (trilinear / nearest) — the resample kernel.

This is the workhorse beneath resampling (reference utils/qmri_utils.py:
61-80), HR fusion (:82-136) and registration warps (:159-221): evaluate a
volume at arbitrary continuous voxel coordinates. On TPU this is a flat
8-neighbour gather + fused blend; XLA fuses the weight arithmetic into the
gather consumers, and the same jitted function is differentiable w.r.t. the
coordinates, which is what makes the registration optimizer autodiff-able
(no finite differences anywhere).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _flat_gather(vol, iz, iy, ix):
    nz, ny, nx = vol.shape
    flat = vol.reshape(-1)
    idx = (iz * ny + iy) * nx + ix
    return flat[idx]


def sample_trilinear(volume, coords, *, cval: float = 0.0):
    """Trilinearly sample ``volume`` at continuous voxel coordinates.

    Args:
        volume: (Z, Y, X) array.
        coords: (..., 3) coordinates in (z, y, x) voxel-index space.
        cval: value returned outside the volume.

    Returns:
        (...,) sampled values, dtype of ``volume`` promoted to float.
    """
    vol = jnp.asarray(volume)
    c = jnp.asarray(coords)
    z, y, x = c[..., 0], c[..., 1], c[..., 2]
    nz, ny, nx = vol.shape

    z0 = jnp.floor(z)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fz, fy, fx = z - z0, y - y0, x - x0
    z0i = z0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    inb = (
        (z >= 0) & (z <= nz - 1) & (y >= 0) & (y <= ny - 1) & (x >= 0) & (x <= nx - 1)
    )

    def cl(i, n):
        return jnp.clip(i, 0, n - 1)

    out = jnp.zeros_like(fz, dtype=vol.dtype if jnp.issubdtype(vol.dtype, jnp.floating) else jnp.float32)
    for dz in (0, 1):
        wz = (1 - fz) if dz == 0 else fz
        for dy in (0, 1):
            wy = (1 - fy) if dy == 0 else fy
            for dx in (0, 1):
                wx = (1 - fx) if dx == 0 else fx
                v = _flat_gather(vol, cl(z0i + dz, nz), cl(y0i + dy, ny), cl(x0i + dx, nx))
                out = out + v * (wz * wy * wx)
    return jnp.where(inb, out, jnp.asarray(cval, out.dtype))


def sample_trilinear_flat(flat, shape, coords, *, base=0, cval: float = 0.0):
    """Trilinear sampling from a FLAT buffer of equally-shaped blocks.

    ``flat`` holds one or more (Z, Y, X) blocks back to back; ``base`` is
    the flat offset of the block to sample (a traced scalar). Functionally
    identical to ``sample_trilinear(flat[base:base+Z*Y*X].reshape(shape),
    coords)`` — but when ``base`` and ``coords`` are vmapped over a batch
    of blocks the gather stays a plain 1-D gather into an UNBATCHED
    operand (vmap merely widens the index vector), whereas a vmapped
    ``sample_trilinear`` batches the operand itself and XLA lowers that to
    a far slower batched gather on TPU. Used by the multi-pair
    registration engine (recon/registration.py:_level_scan_multi).

    Per-axis index clamping is against the block ``shape``, so samples can
    never read a neighbouring block.
    """
    flat = jnp.asarray(flat)
    c = jnp.asarray(coords)
    z, y, x = c[..., 0], c[..., 1], c[..., 2]
    nz, ny, nx = shape

    z0 = jnp.floor(z)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fz, fy, fx = z - z0, y - y0, x - x0
    z0i = z0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    inb = (
        (z >= 0) & (z <= nz - 1) & (y >= 0) & (y <= ny - 1) & (x >= 0) & (x <= nx - 1)
    )

    def cl(i, n):
        return jnp.clip(i, 0, n - 1)

    out = jnp.zeros_like(
        fz, dtype=flat.dtype if jnp.issubdtype(flat.dtype, jnp.floating) else jnp.float32)
    for dz in (0, 1):
        wz = (1 - fz) if dz == 0 else fz
        for dy in (0, 1):
            wy = (1 - fy) if dy == 0 else fy
            for dx in (0, 1):
                wx = (1 - fx) if dx == 0 else fx
                idx = (cl(z0i + dz, nz) * ny + cl(y0i + dy, ny)) * nx + cl(x0i + dx, nx)
                out = out + flat[base + idx] * (wz * wy * wx)
    return jnp.where(inb, out, jnp.asarray(cval, out.dtype))


def sample_nearest(volume, coords, *, cval: float = 0.0):
    """Nearest-neighbour sampling (labels/masks; FLIRT -interp nearestneighbour).

    Rounding is floor(x + 0.5) — scipy/ITK convention — NOT jnp.round's
    half-to-even, which picks alternating neighbours on exact half-integer
    grids (factor-of-2 resampling). The in-bounds envelope matches
    sample_trilinear (continuous coords within [0, n-1]), so a label map
    resampled 'nearest' never extends beyond the image resampled 'linear'."""
    vol = jnp.asarray(volume)
    c = jnp.asarray(coords)
    nz, ny, nx = vol.shape
    z, y, x = c[..., 0], c[..., 1], c[..., 2]
    iz = jnp.floor(z + 0.5).astype(jnp.int32)
    iy = jnp.floor(y + 0.5).astype(jnp.int32)
    ix = jnp.floor(x + 0.5).astype(jnp.int32)
    inb = (
        (z >= 0) & (z <= nz - 1) & (y >= 0) & (y <= ny - 1) & (x >= 0) & (x <= nx - 1)
    )
    v = _flat_gather(vol, jnp.clip(iz, 0, nz - 1), jnp.clip(iy, 0, ny - 1), jnp.clip(ix, 0, nx - 1))
    return jnp.where(inb, v, jnp.asarray(cval, v.dtype))
