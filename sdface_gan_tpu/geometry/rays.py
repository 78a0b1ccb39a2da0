"""Ray generation and depth sampling for the volume renderer.

JAX port of the ray math inside the reference ``VolumeFeatureRenderer``
(``im2scene/sdf/models/sdf_model.py:166-179,207-222,310-351``): pixel-center
meshgrid -> camera rays rotated into world space, then offset (StyleSDF
eq. 3) or stratified (NeRF) depth sampling, then z-normalization.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class Rays(NamedTuple):
    origins: jnp.ndarray  # [B, H, W, 3]
    directions: jnp.ndarray  # [B, H, W, 3]
    viewdirs: jnp.ndarray  # [B, H, W, 3] normalized


def pixel_grid(res: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel-center coordinates, matching the reference's transposed
    meshgrid buffers (``sdf_model.py:167-171``): i varies along W, j along H."""
    lin = jnp.linspace(0.5, res - 0.5, res)
    jj, ii = jnp.meshgrid(lin, lin, indexing="ij")  # jj = row (y), ii = col (x)
    return ii[None], jj[None]  # each [1, H, W]


def get_rays(
    focal: jnp.ndarray,
    c2w: jnp.ndarray,
    res: int,
    static_viewdirs: bool = False,
) -> Rays:
    """Generate camera rays (``sdf_model.py:207-222``).

    Args:
      focal: [B, 1, 1].
      c2w: [B, 3, 4] camera-to-world.
    """
    ii, jj = pixel_grid(res)
    dirs = jnp.stack(
        [
            (ii - res * 0.5) / focal,
            -(jj - res * 0.5) / focal,
            -jnp.ones_like(ii) * jnp.ones_like(focal),
        ],
        axis=-1,
    )  # [B, H, W, 3]
    rays_d = jnp.sum(dirs[..., None, :] * c2w[:, None, None, :3, :3], axis=-1)
    rays_o = jnp.broadcast_to(c2w[:, None, None, :3, -1], rays_d.shape)
    raw_view = dirs if static_viewdirs else rays_d
    viewdirs = raw_view / jnp.linalg.norm(raw_view, axis=-1, keepdims=True)
    return Rays(rays_o, rays_d, viewdirs)


def base_t_vals(n_samples: int, offset_sampling: bool) -> jnp.ndarray:
    """Canonical per-ray sample positions in [0,1] (``sdf_model.py:174-179``)."""
    if offset_sampling:
        return jnp.linspace(0.0, 1.0 - 1.0 / n_samples, n_samples)
    return jnp.linspace(0.0, 1.0, n_samples)


def sample_depths(
    near: jnp.ndarray,
    far: jnp.ndarray,
    n_samples: int,
    key: Optional[jax.Array],
    offset_sampling: bool = True,
    perturb: float = 1.0,
) -> jnp.ndarray:
    """Depth values per ray (``sdf_model.py:310-340``).

    Args:
      near/far: [B, H, W, 1] (broadcastable).
      key: PRNG key; required when ``perturb > 0``.

    Returns z_vals [B, H, W, n_samples].
    """
    t_vals = base_t_vals(n_samples, offset_sampling).reshape(1, 1, 1, -1)
    z_vals = near * (1.0 - t_vals) + far * t_vals
    if perturb <= 0.0:
        return jnp.broadcast_to(z_vals, z_vals.shape[:3] + (n_samples,))

    if key is None:
        raise ValueError("key required when perturb > 0")
    if offset_sampling:
        # One shared offset per ray within the inter-sample gap (eq. 3).
        upper = jnp.concatenate([z_vals[..., 1:], jnp.broadcast_to(far, z_vals[..., :1].shape)], -1)
        lower = z_vals
        shape = jnp.broadcast_shapes(near.shape[:3], far.shape[:3])
        t_rand = jax.random.uniform(key, shape)[..., None]
    else:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
        lower = jnp.concatenate([z_vals[..., :1], mids], -1)
        shape = jnp.broadcast_shapes(near.shape[:3], far.shape[:3]) + (n_samples,)
        t_rand = jax.random.uniform(key, shape)
    return lower + (upper - lower) * t_rand


def stratified_depths(
    near: jnp.ndarray,
    far: jnp.ndarray,
    n_samples: int,
    key: jax.Array,
    offset_sampling: bool = True,
) -> jnp.ndarray:
    """Stratified jitter used by the sphere-init pass (``sdf_model.py:386-395``):
    base t_vals follow the renderer's sampling mode, jitter is always NeRF-style."""
    t_vals = base_t_vals(n_samples, offset_sampling).reshape(1, 1, 1, -1)
    z_vals = near * (1.0 - t_vals) + far * t_vals
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
    lower = jnp.concatenate([z_vals[..., :1], mids], -1)
    shape = jnp.broadcast_shapes(near.shape[:3], far.shape[:3]) + (n_samples,)
    t_rand = jax.random.uniform(key, shape)
    return lower + (upper - lower) * t_rand


def points_along_rays(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, z_vals: jnp.ndarray
) -> jnp.ndarray:
    """World-space sample points [B, H, W, S, 3] (``sdf_model.py:343``)."""
    return rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]


def z_normalize_points(
    pts: jnp.ndarray, near: jnp.ndarray, far: jnp.ndarray
) -> jnp.ndarray:
    """Scale points so z spans ~[-1,1] (``sdf_model.py:348-349``)."""
    return pts * 2.0 / (far - near)[..., None, :]
