"""GIRAFFE camera + pixel geometry.

JAX rebuild of ``im2scene/camera.py`` and the projection helpers of
``im2scene/common.py``: fov intrinsics on a [-1, 1] sensor, uniform
sphere-sampled look-at poses (+z up), pixel grids, and the
pixels/origin -> world transforms used by the volume renderer.
Randomness is explicit PRNG keys, so pose sampling jits.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def get_camera_mat(fov: float = 49.13, invert: bool = True) -> jnp.ndarray:
    """[1, 4, 4] intrinsics for a [-1, 1] sensor (reference
    ``camera.py:6-21``); ``invert`` returns K^-1 (the renderer's direction)."""
    focal = 1.0 / math.tan(0.5 * fov * math.pi / 180.0)
    mat = jnp.diag(jnp.array([focal, focal, 1.0, 1.0]))[None]
    if invert:
        mat = jnp.linalg.inv(mat)
    return mat


def to_sphere(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(u, v) in [0,1]^2 -> unit sphere (reference ``camera.py:79-85``)."""
    theta = 2.0 * jnp.pi * u
    phi = jnp.arccos(1.0 - 2.0 * v)
    return jnp.stack(
        [jnp.sin(phi) * jnp.cos(theta), jnp.sin(phi) * jnp.sin(theta), jnp.cos(phi)],
        axis=-1,
    )


def look_at(
    eye: jnp.ndarray, at: Optional[jnp.ndarray] = None, up: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Rotation matrices [B, 3, 3] with columns (x, y, z) axes looking from
    ``eye`` to ``at`` with +z world up (reference ``camera.py:101-127``)."""
    if at is None:
        at = jnp.zeros(3)
    if up is None:
        up = jnp.array([0.0, 0.0, 1.0])
    z = eye - at[None]
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), eps)
    x = jnp.cross(jnp.broadcast_to(up, z.shape), z)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
    y = jnp.cross(z, x)
    y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), eps)
    return jnp.stack([x, y, z], axis=-1)  # columns


def _pose_from_loc(loc: jnp.ndarray) -> jnp.ndarray:
    b = loc.shape[0]
    r = look_at(loc)
    rt = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    rt = rt.at[:, :3, :3].set(r)
    rt = rt.at[:, :3, 3].set(loc)
    return rt


def get_random_pose(
    key: jax.Array,
    range_u: Tuple[float, float],
    range_v: Tuple[float, float],
    range_radius: Tuple[float, float],
    batch_size: int = 32,
) -> jnp.ndarray:
    """Uniformly sampled camera-to-world poses on the view sphere
    (reference ``camera.py:24-37``)."""
    ku, kv, kr = jax.random.split(key, 3)
    u = jax.random.uniform(ku, (batch_size,), minval=range_u[0], maxval=range_u[1])
    v = jax.random.uniform(kv, (batch_size,), minval=range_v[0], maxval=range_v[1])
    r = jax.random.uniform(
        kr, (batch_size,), minval=range_radius[0], maxval=range_radius[1]
    )
    loc = to_sphere(u, v) * r[:, None]
    return _pose_from_loc(loc)


def get_camera_pose(
    range_u, range_v, range_r, val_u=0.5, val_v=0.5, val_r=0.5, batch_size=32
) -> jnp.ndarray:
    """Deterministic pose at fractional (u, v, r) positions within the
    ranges (reference ``camera.py:57-75``)."""
    u = range_u[0] + val_u * (range_u[1] - range_u[0])
    v = range_v[0] + val_v * (range_v[1] - range_v[0])
    r = range_r[0] + val_r * (range_r[1] - range_r[0])
    loc = to_sphere(jnp.full((batch_size,), u), jnp.full((batch_size,), v)) * r
    return _pose_from_loc(loc)


def get_rotation_matrix(value: float, batch_size: int = 32) -> jnp.ndarray:
    """Rotation about z by ``value * 2 pi`` (reference ``camera.py:130-133``)."""
    a = value * 2.0 * math.pi
    r = jnp.array(
        [
            [math.cos(a), -math.sin(a), 0.0],
            [math.sin(a), math.cos(a), 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    return jnp.tile(r[None], (batch_size, 1, 1))


def arange_pixels(
    resolution: int, batch_size: int = 1, invert_y: bool = True
) -> jnp.ndarray:
    """Scaled pixel coordinates [B, N, 2] in [-1, 1], x-major ordering
    (reference ``common.py:7-51``; the GIRAFFE renderer then flips y,
    ``generator.py:433-434`` — fold that in via ``invert_y``)."""
    lin = jnp.linspace(-1.0, 1.0, resolution)
    xs, ys = jnp.meshgrid(lin, lin, indexing="ij")  # x-major like the reference
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
    if invert_y:
        pix = pix.at[:, 1].multiply(-1.0)
    return jnp.tile(pix[None], (batch_size, 1, 1))


def image_points_to_world(
    pixels: jnp.ndarray, camera_mat: jnp.ndarray, world_mat: jnp.ndarray
) -> jnp.ndarray:
    """Lift image-plane pixels (depth -1) to world space (reference
    ``common.py:182-203`` with ``transform_to_world``, invert=False:
    ``p_world = world_mat @ camera_mat @ [x*|d|, y*|d|, d, 1]``)."""
    b, n, _ = pixels.shape
    d = -1.0
    hom = jnp.concatenate(
        [
            pixels * abs(d),
            jnp.full((b, n, 1), d),
            jnp.ones((b, n, 1)),
        ],
        axis=-1,
    )  # [B, N, 4]
    m = world_mat @ camera_mat  # [B, 4, 4]
    out = jnp.einsum("bij,bnj->bni", m, hom)
    return out[..., :3]


def origin_to_world(
    n_points: int, camera_mat: jnp.ndarray, world_mat: jnp.ndarray
) -> jnp.ndarray:
    """Camera origin in world coordinates, repeated N times (reference
    ``common.py:146-179``)."""
    b = camera_mat.shape[0]
    p = jnp.array([0.0, 0.0, 0.0, 1.0])
    m = world_mat @ camera_mat
    out = jnp.einsum("bij,j->bi", m, p)[:, :3]
    return jnp.tile(out[:, None, :], (1, n_points, 1))


def interpolate_sphere(z1: jnp.ndarray, z2: jnp.ndarray, t: float) -> jnp.ndarray:
    """Slerp between latent codes (reference ``common.py:206-214``)."""
    p = jnp.sum(z1 * z2, axis=-1, keepdims=True)
    p = p / jnp.sqrt(jnp.sum(z1**2, axis=-1, keepdims=True))
    p = p / jnp.sqrt(jnp.sum(z2**2, axis=-1, keepdims=True))
    omega = jnp.arccos(jnp.clip(p, -1.0, 1.0))
    s1 = jnp.sin((1 - t) * omega) / jnp.sin(omega)
    s2 = jnp.sin(t * omega) / jnp.sin(omega)
    return s1 * z1 + s2 * z2
