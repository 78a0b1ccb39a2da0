"""Geometry regularizers: eikonal, minimal surface, sphere init, hash TV.

References: ``sdf_losses.py:13-24`` (eikonal + minimal surface),
``training_utils.py:287-327`` (sphere-init L1), ``smoothLoss.py:5-40``
(hash-grid total-variation smoothness).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.hash_encoder import HashGridSpec, hash_encode


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


def occupancy_sparsity_loss(sdf: jnp.ndarray, sigmoid_beta: jnp.ndarray) -> jnp.ndarray:
    """Mean occupancy ``sigmoid(-sdf/beta)`` over the ray samples — the
    DVGO/Plenoxels empty-space sparsity prior, re-expressed for the SDF
    density transform (``sigma = sigmoid(-sdf/beta)/beta``, reference
    ``sdf_model.py:163``).

    Not in the reference: on synthetic data whose background matches the
    fixed composite background, a uniform low-density fog renders the same
    images as true geometry and none of the reference regularizers breaks
    the tie (measured, docs/TRAINING_RUN.md).  Real geometry pays ~ the
    object's volume fraction of the frustum; fog pays its occupancy
    everywhere, so any positive weight makes fog strictly more expensive.
    ``beta`` is detached: the prior must not fight the learnable-β anneal
    by widening the sigmoid instead of clearing space.  Bounded as β → 0
    (a raw-density penalty would diverge as 1/β on saturated interiors).
    """
    beta = jax.lax.stop_gradient(sigmoid_beta.astype(jnp.float32))
    return jnp.mean(jax.nn.sigmoid(-sdf.astype(jnp.float32) / beta))


def distortion_loss(weights: jnp.ndarray, s_vals: jnp.ndarray) -> jnp.ndarray:
    """mip-NeRF 360 distortion: concentrate each ray's compositing weight
    into a thin interval.

    ``L = mean_ray [ sum_ij w_i w_j |s_i - s_j| + (1/3) sum_i w_i^2 d_i ]``
    with ``s`` the normalized sample positions in [0, 1] and ``d`` the
    interval widths.  Not in the reference; added as a second tie-breaker
    against the measured fog regime (docs/TRAINING_RUN.md): fog spreads
    weight across the whole ray and pays O(w_total^2); a surface
    concentrates weight in one interval and pays ~0; an empty (background)
    ray pays ~0.  Unlike :func:`occupancy_sparsity_loss` it never taxes a
    saturated interior, so it cannot push a healthy surface positive.

    Both tensors are the squeezed ``[B, H, W, S]`` layout (CLAUDE.md: no
    trailing singletons in hot paths).  ``s`` is ascending per ray, so the
    pairwise term has the exact O(S) cumsum form
    ``2 sum_i w_i (s_i * W_{<i} - (ws)_{<i})``.
    """
    w = weights.astype(jnp.float32)
    s = s_vals.astype(jnp.float32)
    # interval widths: forward diffs, last interval reuses the previous one
    # (matches the integrator's finite last bin under a fixed background)
    d = jnp.diff(s, axis=-1)
    d = jnp.concatenate([d, d[..., -1:]], axis=-1)
    ws = w * s
    w_before = jnp.cumsum(w, axis=-1) - w  # exclusive prefix sums
    ws_before = jnp.cumsum(ws, axis=-1) - ws
    pairwise = 2.0 * jnp.sum(w * (s * w_before - ws_before), axis=-1)
    intra = jnp.sum(w * w * d, axis=-1) / 3.0
    return jnp.mean(pairwise + intra)


def sphere_init_loss(sdf: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """L1 regression of raw SDF to a centered sphere
    (reference ``training_utils.py:307``: ``F.l1_loss(sdf, target)``)."""
    return jnp.mean(jnp.abs(sdf - target))


def hash_smoothness_loss(
    table: jnp.ndarray,
    spec: HashGridSpec,
    key: jax.Array,
    bbox: jnp.ndarray,
    sample_points: int = 32,
    voxel_size: float = 0.1,
    margin: float = 0.05,
    bound: float = 2.0,
) -> jnp.ndarray:
    """Total-variation smoothness of the hash EMBEDDING on a randomly
    placed axis-aligned grid (reference ``smoothLoss.py:5-29``; applied
    with weight 1000 at ``training_utils.py:433-437``).

    Semantics match the reference: a ``(sample_points-1)^3`` integer grid
    is jittered by one random sub-voxel offset, scaled by ``voxel_size``,
    randomly offset inside ``bbox`` (``[3, 2]`` min/max per axis, the
    hardcoded stage-A bounding box), normalized to [0, 1] per axis, then
    fed through the NGP encoder (which maps via ``(x + bound)/(2 bound)``);
    the loss is the summed squared difference between grid-neighbor
    embeddings along each axis, divided by ``sample_points**3``.
    """
    k_off, k_jit = jax.random.split(key)
    n = sample_points - 1
    lo, hi = bbox[:, 0], bbox[:, 1]
    grid_size = n * voxel_size
    offset_max = hi - lo - grid_size - 2.0 * margin
    offset = jax.random.uniform(k_off, (3,)) * offset_max + margin

    idx = jnp.arange(n, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(idx, idx, idx, indexing="ij")
    coords = jnp.stack([gx, gy, gz], axis=-1)  # [n,n,n,3]
    jitter = jax.random.uniform(k_jit, (1, 1, 1, 3))
    pts = (coords + jitter) * voxel_size + lo + offset
    pts01 = (pts - lo) / (hi - lo)

    emb = hash_encode(pts01, table, spec, bound=bound)  # [n,n,n,C]
    tv = (
        jnp.sum((emb[1:] - emb[:-1]) ** 2)
        + jnp.sum((emb[:, 1:] - emb[:, :-1]) ** 2)
        + jnp.sum((emb[:, :, 1:] - emb[:, :, :-1]) ** 2)
    )
    return tv / float(sample_points**3)
