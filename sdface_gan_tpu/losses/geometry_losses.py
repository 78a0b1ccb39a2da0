"""Geometry regularizers: eikonal, minimal surface, sphere init, hash TV.

References: ``sdf_losses.py:13-24`` (eikonal + minimal surface),
``training_utils.py:287-327`` (sphere-init L1), ``smoothLoss.py:5-40``
(hash-grid total-variation smoothness).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.hash_encoder import HashGridSpec, hash_table_total_variation


def eikonal_loss(
    eikonal_term: Optional[jnp.ndarray],
    sdf: Optional[jnp.ndarray] = None,
    beta: float = 100.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``(||grad sdf|| - 1)^2`` + minimal-surface ``exp(-beta |sdf|)``
    (reference ``sdf_losses.py:13-24``)."""
    if eikonal_term is None:
        eik = jnp.zeros(())
    else:
        eik = jnp.mean((jnp.linalg.norm(eikonal_term, axis=-1) - 1.0) ** 2)
    if sdf is None:
        min_surf = jnp.zeros(())
    else:
        min_surf = jnp.mean(jnp.exp(-beta * jnp.abs(sdf)))
    return eik, min_surf


def sphere_init_loss(sdf: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """L1 regression of raw SDF to a centered sphere
    (reference ``training_utils.py:307``: ``F.l1_loss(sdf, target)``)."""
    return jnp.mean(jnp.abs(sdf - target))


def hash_smoothness_loss(
    table: jnp.ndarray,
    spec: HashGridSpec,
    key: jax.Array,
    bbox_min: jnp.ndarray,
    bbox_max: jnp.ndarray,
    sample_size: int = 32,
    bound: float = 1.0,
) -> jnp.ndarray:
    """TV smoothness of the hash embedding on a random grid in the bbox
    (reference ``smoothLoss.py:5-40`` + weight applied by the caller,
    ``training_utils.py:433-437``).

    Samples a random ``sample_size**3`` axis-aligned grid inside
    [bbox_min, bbox_max] and penalizes squared differences between
    neighboring hash-table cells along each axis.
    """
    k0, k1 = jax.random.split(key)
    extent = bbox_max - bbox_min
    # Random grid origin + uniform spacing, mirroring the reference's
    # random-coordinate meshgrid construction.
    offset = jax.random.uniform(k0, (3,)) * extent / sample_size
    lin = jnp.linspace(0.0, 1.0, sample_size, endpoint=False)
    axes = [bbox_min[d] + offset[d] + lin * extent[d] for d in range(3)]
    gx, gy, gz = jnp.meshgrid(*axes, indexing="ij")
    pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    return hash_table_total_variation(table, spec, pts, bound=bound)
