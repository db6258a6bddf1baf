"""Separable Gaussian filtering on device (shared by registration pyramids
and the N4 bias-field smoother)."""

from __future__ import annotations

import functools
from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def gaussian_kernel1d(sigma: float) -> np.ndarray:
    if sigma <= 0:
        return np.array([1.0], np.float32)
    radius = max(1, int(3.0 * sigma + 0.5))
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _conv1d_along(x, k, axis):
    r = (k.shape[0] - 1) // 2
    xm = jnp.moveaxis(x, axis, -1)
    shape = xm.shape
    flat = xm.reshape(-1, 1, shape[-1])
    out = lax.conv_general_dilated(
        flat, k.reshape(1, 1, -1), window_strides=(1,),
        padding=[(r, r)], dimension_numbers=("NCH", "OIH", "NCH"))
    return jnp.moveaxis(out.reshape(shape), -1, axis)


@functools.partial(jax.jit, static_argnames=("sigma",))
def gaussian_smooth3d(data, sigma: Union[float, Sequence[float]]):
    """Separable Gaussian smoothing along the three spatial axes.

    ``sigma`` is a scalar or per-axis tuple in VOXELS (zero disables an axis).
    """
    x = jnp.asarray(data, jnp.float32)
    sigmas = (sigma,) * 3 if np.isscalar(sigma) else tuple(sigma)
    for axis, sg in enumerate(sigmas):
        if sg <= 0:
            continue
        x = _conv1d_along(x, jnp.asarray(gaussian_kernel1d(float(sg))), axis)
    return x


@functools.partial(jax.jit, static_argnames=("sigma", "factor"))
def smooth_subsample(data, sigma: float, factor: int):
    """Gaussian smoothing + strided subsampling (one image-pyramid level)."""
    x = gaussian_smooth3d(data, float(sigma))
    if factor > 1:
        x = x[::factor, ::factor, ::factor]
    return x
