"""Inversion loss bundle.

Rebuild of the reference ``LossUtils`` (``psp_encoders.py:195-228``):
weighted sum of ArcFace identity loss (0.1), pixel L2 (1.0), and LPIPS
(0.8).  Components whose pretrained weights are unavailable degrade to
zero contributions (flagged off), keeping the encoder stage trainable with
the always-available L2 term.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp

from .id_loss import id_loss
from .lpips import apply_lpips


class LossUtils:
    def __init__(
        self,
        irse_params: Optional[Any] = None,
        lpips_params: Optional[Any] = None,
        id_lambda: float = 0.1,
        l2_lambda: float = 1.0,
        lpips_lambda: float = 0.8,
    ):
        self.irse_params = irse_params
        self.lpips_params = lpips_params
        self.id_lambda = id_lambda
        self.l2_lambda = l2_lambda
        self.lpips_lambda = lpips_lambda

    def __call__(
        self, generated: jnp.ndarray, real: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        total = jnp.zeros(())
        out: Dict[str, jnp.ndarray] = {}
        l2 = jnp.mean((generated - real) ** 2)
        out["l2"] = l2
        total = total + self.l2_lambda * l2
        if self.irse_params is not None and self.id_lambda > 0:
            lid = id_loss(self.irse_params, generated, real)
            out["id"] = lid
            total = total + self.id_lambda * lid
        if self.lpips_params is not None and self.lpips_lambda > 0:
            lp = apply_lpips(self.lpips_params, generated, real)
            out["lpips"] = lp
            total = total + self.lpips_lambda * lp
        out["loss"] = total
        return out
