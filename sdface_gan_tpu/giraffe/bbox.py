"""Bounding-box transform sampling for compositional scenes.

JAX rebuild of ``im2scene/giraffe/models/bounding_box_generator.py``:
per-object scale/translation/rotation sampling within configured ranges,
optional pairwise collision re-sampling (bounded iterations under jit),
optional plane constraint.  No learnable parameters — it's a sampler.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .camera import get_rotation_matrix


@dataclass(frozen=True)
class BBoxConfig:
    n_boxes: int = 1
    scale_range_min: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    scale_range_max: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    translation_range_min: Tuple[float, float, float] = (-0.75, -0.75, 0.0)
    translation_range_max: Tuple[float, float, float] = (0.75, 0.75, 0.0)
    z_level_plane: float = 0.0
    rotation_range: Tuple[float, float] = (0.0, 1.0)
    check_collision: bool = False
    collision_padding: float = 0.1
    fix_scale_ratio: bool = True
    object_on_plane: bool = False


def _rot_z(angles: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(angles), jnp.sin(angles)
    zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zeros], -1),
            jnp.stack([s, c, zeros], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )


def _pairwise_free(cfg: BBoxConfig, s: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """True where no pair of boxes overlaps (reference ``check_for_collison``,
    generalized to any n via pairwise axis-separation)."""
    n = cfg.n_boxes
    if n == 1:
        return jnp.ones(s.shape[0], dtype=bool)
    free = jnp.ones(s.shape[0], dtype=bool)
    for i in range(n):
        for j in range(i + 1, n):
            d_t = jnp.abs(t[:, i] - t[:, j])
            d_s = jnp.abs(s[:, i] + s[:, j]) + cfg.collision_padding
            free = free & jnp.any(d_t >= d_s, axis=-1)
    return free


def sample_transformations(
    key: jax.Array,
    cfg: BBoxConfig,
    batch_size: int,
    max_resample: int = 8,
    prior: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Random (s [B,n,3], t [B,n,3], R [B,n,3,3]) (reference
    ``get_random_offset``/``forward``, ``bounding_box_generator.py:120-161``).

    ``prior`` ([M, n_boxes, 3], the CLEVR location-prior coordinates
    pre-scaled by 0.23788) replaces uniform translation sampling when
    given.  Collision handling re-samples translations a bounded number
    of times (static unroll) instead of the reference's unbounded loop.
    """
    ks, kt, kr = jax.random.split(key, 3)
    n = cfg.n_boxes
    smin = jnp.asarray(cfg.scale_range_min)
    srange = jnp.asarray(cfg.scale_range_max) - smin
    tmin = jnp.asarray(cfg.translation_range_min)
    trange = jnp.asarray(cfg.translation_range_max) - tmin

    if cfg.fix_scale_ratio:
        s_rand = jax.random.uniform(ks, (batch_size, n, 1))
    else:
        s_rand = jax.random.uniform(ks, (batch_size, n, 3))
    s = smin + s_rand * srange

    if prior is not None:
        pick = jax.random.randint(kt, (batch_size,), 0, prior.shape[0])
        t = prior[pick]
    else:
        t = tmin + jax.random.uniform(kt, (batch_size, n, 3)) * trange
    if cfg.check_collision and prior is None:
        for i in range(max_resample):
            kt, sub = jax.random.split(kt)
            free = _pairwise_free(cfg, s, t)
            t_new = tmin + jax.random.uniform(sub, (batch_size, n, 3)) * trange
            t = jnp.where(free[:, None, None], t, t_new)
    if cfg.object_on_plane:
        t = t.at[..., -1].set(cfg.z_level_plane)

    r0, r1 = cfg.rotation_range
    rv = r0 + jax.random.uniform(kr, (batch_size, n)) * (r1 - r0)
    r = _rot_z(rv * 2.0 * jnp.pi)
    return s, t, r


def fixed_transformations(
    cfg: BBoxConfig,
    batch_size: int,
    val_s: Sequence[Sequence[float]] = ((0.5, 0.5, 0.5),),
    val_t: Sequence[Sequence[float]] = ((0.5, 0.5, 0.5),),
    val_r: Sequence[float] = (0.5,),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deterministic transforms at fractional positions (reference
    ``get_transformations``, used by the render programs)."""
    smin = jnp.asarray(cfg.scale_range_min)
    srange = jnp.asarray(cfg.scale_range_max) - smin
    tmin = jnp.asarray(cfg.translation_range_min)
    trange = jnp.asarray(cfg.translation_range_max) - tmin
    vs = jnp.asarray(val_s)[None]  # [1, n, 3]
    vt = jnp.asarray(val_t)[None]
    if cfg.fix_scale_ratio:
        s = smin + vs[..., :1] * srange
    else:
        s = smin + vs * srange
    t = tmin + vt * trange
    if cfg.object_on_plane:
        t = t.at[..., -1].set(cfg.z_level_plane)
    r0, r1 = cfg.rotation_range
    rs = jnp.stack(
        [
            get_rotation_matrix(float(r0 + v * (r1 - r0)), 1)[0]
            for v in val_r
        ],
        axis=0,
    )[None]
    s = jnp.tile(s, (batch_size, 1, 1))
    t = jnp.tile(t, (batch_size, 1, 1))
    r = jnp.tile(rs, (batch_size, 1, 1, 1))
    return s, t, r


def transform_points_to_box(
    p: jnp.ndarray,
    s: jnp.ndarray,
    t: jnp.ndarray,
    r: jnp.ndarray,
    box_idx: int = 0,
    scale_factor: float = 1.0,
) -> jnp.ndarray:
    """World -> box-local coordinates: ``R (p - t) / s`` (reference
    ``generator.py:300-306``).  p: [B, N, 3]."""
    rot = r[:, box_idx]  # [B, 3, 3]
    shifted = p - t[:, box_idx][:, None, :]
    local = jnp.einsum("bij,bnj->bni", rot, shifted)
    return local / s[:, box_idx][:, None, :] * scale_factor
