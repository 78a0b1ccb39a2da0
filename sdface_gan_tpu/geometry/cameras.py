"""Camera sampling for the SDF pipeline.

Functional JAX port of the reference
``generate_camera_params`` (``im2scene/sdf/models/sdf_utils.py:97-159``):
cameras sit on the unit sphere looking at the origin; azimuth/elevation are
Gaussian (std) or uniform (range) or an 8-azimuth sweep; intrinsics come
from a half-angle fov (default 6 degrees) with near/far = 1 -/+ dist_radius.

All branches are static (selected in Python); randomness is explicit via
PRNG keys so camera sampling can live inside a jitted train step.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class CameraParams(NamedTuple):
    extrinsics: jnp.ndarray  # [B, 3, 4] camera-to-world [R^T | t]
    focal: jnp.ndarray  # [B, 1, 1]
    near: jnp.ndarray  # [B, 1, 1]
    far: jnp.ndarray  # [B, 1, 1]
    viewpoint: jnp.ndarray  # [B, 2] (azim, elev)


def _normalize(v: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    # torch F.normalize semantics: x / max(||x||, eps)
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps)


def camera_extrinsics_from_angles(
    azim: jnp.ndarray, elev: jnp.ndarray, dist: jnp.ndarray
) -> jnp.ndarray:
    """Look-at extrinsics for cameras at (azim, elev, dist) facing the origin.

    Ports the rotation construction of ``sdf_utils.py:137-158`` including
    the degenerate-x-axis fix when the camera direction is parallel to up.
    """
    azim = azim.reshape(-1)
    elev = elev.reshape(-1)
    dist = dist.reshape(-1)
    x = jnp.cos(elev) * jnp.sin(azim)
    y = jnp.sin(elev)
    z = jnp.cos(elev) * jnp.cos(azim)
    camera_dir = jnp.stack([x, y, z], axis=-1)  # [B, 3]
    camera_loc = dist[:, None] * camera_dir

    up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), camera_dir.shape)
    z_axis = _normalize(camera_dir)
    x_axis = _normalize(jnp.cross(up, z_axis))
    y_axis = _normalize(jnp.cross(z_axis, x_axis))
    # Degenerate when camera_dir ~ up: rebuild x from y x z (sdf_utils.py:151-154)
    is_close = jnp.all(jnp.abs(x_axis) < 5e-3, axis=-1, keepdims=True)
    replacement = _normalize(jnp.cross(y_axis, z_axis))
    x_axis = jnp.where(is_close, replacement, x_axis)

    r = jnp.stack([x_axis, y_axis, z_axis], axis=1)  # [B, 3, 3] rows
    rt = jnp.swapaxes(r, 1, 2)  # camera-to-world rotation
    return jnp.concatenate([rt, camera_loc[:, :, None]], axis=-1)  # [B, 3, 4]


def generate_camera_params(
    resolution: int,
    key: Optional[jax.Array] = None,
    batch: int = 1,
    locations: Optional[jnp.ndarray] = None,
    sweep: bool = False,
    uniform: bool = False,
    azim_range: float = 0.3,
    elev_range: float = 0.15,
    fov_ang: float = 6.0,
    dist_radius: float = 0.12,
) -> CameraParams:
    """Sample camera extrinsics + intrinsics (see module docstring).

    ``locations`` ([B,2] azim/elev) overrides sampling; ``sweep`` renders
    8 fixed azimuths per identity (eval grids).  Otherwise angles are
    N(0, range) (default) or U(-range, range) when ``uniform``.
    """
    if locations is not None:
        azim = locations[:, 0].reshape(-1, 1)
        elev = locations[:, 1].reshape(-1, 1)
        n = azim.shape[0]
    elif sweep:
        azim = (-azim_range + (2 * azim_range / 7) * jnp.arange(8.0)).reshape(-1, 1)
        azim = jnp.tile(azim, (batch, 1))
        ekey = key if key is not None else jax.random.PRNGKey(0)
        elev_rand = jax.random.uniform(ekey, (batch, 1))
        elev = -elev_range + 2 * elev_range * jnp.repeat(elev_rand, 8, axis=0)
        n = batch * 8
    else:
        if key is None:
            raise ValueError("key required for random camera sampling")
        ka, ke = jax.random.split(key)
        if uniform:
            azim = -azim_range + 2 * azim_range * jax.random.uniform(ka, (batch, 1))
            elev = -elev_range + 2 * elev_range * jax.random.uniform(ke, (batch, 1))
        else:
            azim = azim_range * jax.random.normal(ka, (batch, 1))
            elev = elev_range * jax.random.normal(ke, (batch, 1))
        n = batch

    dist = jnp.ones((n, 1))
    near = (dist - dist_radius)[:, :, None]
    far = (dist + dist_radius)[:, :, None]
    fov_rad = fov_ang * math.pi / 180.0
    focal = jnp.full((n, 1, 1), 0.5 * resolution / math.tan(fov_rad))

    viewpoint = jnp.concatenate([azim, elev], axis=1)
    extrinsics = camera_extrinsics_from_angles(azim, elev, dist)
    return CameraParams(extrinsics, focal, near, far, viewpoint)
