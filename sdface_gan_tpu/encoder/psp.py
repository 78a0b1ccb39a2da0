"""pSp inversion encoder: GradualStyleEncoder + renderer-style projection.

The reference's pSp stage-C path (``im2scene/training_utils.py:1013-1015``,
commented operative lines; ``encoder/psp_encoders.py:37-122``) feeds the
[B, n_styles, 512] W+ stack straight into the generator with
``input_is_latent=True``.  Its renderer then slices ``latent[0][:, 0]``
(``sdf_model.py:1183-1185``) — a 512-d decoder style into the 256-d
renderer mapping, which cannot run.  This module completes the design the
TPU way: the W+ stack drives the StyleGAN decoder (style_count ==
``DecoderConfig.n_latent``), and a small learned projection of the first
W+ entry supplies the renderer's ``style_dim``-d latent.

ir_se50 pretraining: load ``model_ir_se50.pth`` through
``import_irse_state`` onto ``params["gse"]["backbone"]`` (the reference
does the same with ``strict=False``, ``training_utils.py:938-940``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.init import uniform
from .irse import (
    IRSEConfig,
    apply_gradual_style_encoder,
    init_gradual_style_encoder,
)

Params = Dict[str, Any]


@dataclass(frozen=True)
class PSPConfig:
    img_size: int = 256
    style_count: int = 6          # == decoder n_latent for 256^2 / 64-res in
    renderer_style_dim: int = 256
    # pSp's start_from_latent_avg: the encoder predicts OFFSETS from the
    # generator's mean styles (renderer W mean, decoder W mean) instead of
    # absolute latents — without it, L2-only training drifts off the
    # trained style manifold (observed on a real run: reconstructions
    # dissolve into texture by 4k iters; with it they stay face-shaped).
    start_from_avg: bool = True

    @property
    def irse(self) -> IRSEConfig:
        # Clamp the FPN split points to style_count: an equal-resolution
        # decoder (renderer out_im_res == img_size) has n_latent == 2, below
        # the reference's hardcoded coarse/middle boundaries
        # (psp_encoders.py:55-57 assume 18 styles at 1024^2).
        return IRSEConfig(
            psp_input_size=self.img_size,
            style_count=self.style_count,
            coarse_ind=min(IRSEConfig.coarse_ind, self.style_count),
            middle_ind=min(IRSEConfig.middle_ind, self.style_count),
        )


def init_psp_encoder(key: jax.Array, cfg: PSPConfig) -> Params:
    kg, kw, kb = jax.random.split(key, 3)
    bound = 1.0 / math.sqrt(512)
    return {
        "gse": init_gradual_style_encoder(kg, cfg.irse),
        "proj": {
            "w": uniform(kw, (512, cfg.renderer_style_dim), bound),
            "b": uniform(kb, (cfg.renderer_style_dim,), bound),
        },
    }


def apply_psp_encoder(
    p: Params, cfg: PSPConfig, x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x [B, S, S, 3] in [-1, 1] -> (renderer latent [B, style_dim],
    W+ stack [B, style_count, 512])."""
    wplus = apply_gradual_style_encoder(p["gse"], x, cfg.irse)
    rend = wplus[:, 0] @ p["proj"]["w"] + p["proj"]["b"]
    return rend, wplus
