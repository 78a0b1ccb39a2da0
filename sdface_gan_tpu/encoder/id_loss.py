"""ArcFace identity loss.

Rebuild of ``im2scene/encoder/id_loss.py``: crop the face region
(rows 35:223, cols 32:220 of a 256^2 image), pool to 112^2, embed with the
ir_se-50 backbone, and penalize ``1 - cos(feat(gen), feat(real))``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .irse import apply_irse_backbone


def extract_face_features(backbone_params, imgs: jnp.ndarray) -> jnp.ndarray:
    """imgs: [B, 256, 256, 3] in [-1, 1] -> [B, 512] embeddings
    (reference ``id_loss.py:14-22``)."""
    crop = imgs[:, 35:223, 32:220, :]
    b, h, w, c = crop.shape
    pooled = jax.image.resize(crop, (b, 112, 112, c), method="bilinear")
    feats = apply_irse_backbone(backbone_params, pooled)
    return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)


def id_loss(backbone_params, generated: jnp.ndarray, real: jnp.ndarray) -> jnp.ndarray:
    """``mean(1 - <feat(gen), feat(real)>)`` (reference ``id_loss.py:24-43``)."""
    f_gen = extract_face_features(backbone_params, generated)
    f_real = jax.lax.stop_gradient(extract_face_features(backbone_params, real))
    return jnp.mean(1.0 - jnp.sum(f_gen * f_real, axis=-1))
