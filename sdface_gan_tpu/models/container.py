"""SDFModel container — the reference's top-level model bundle.

Equivalent of ``im2scene/sdf/models/__init__.py:3-57`` + the stage-aware
assembly of ``sdf/config.py:8-35``: holds the generator, its EMA copy, the
stage-appropriate discriminator config/params, and an optional inversion
encoder.  A thin convenience wrapper over the functional API for users
coming from the reference's module tree.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .discriminator import (
    StyleDiscConfig,
    VolumeRenderDiscConfig,
    init_style_discriminator,
    init_volume_render_discriminator,
)
from .generator import GeneratorConfig, init_generator


@dataclass
class SDFModel:
    gcfg: GeneratorConfig
    generator: Dict[str, Any]
    generator_test: Dict[str, Any]  # EMA copy (reference naming)
    discriminator: Dict[str, Any]
    dcfg: Any
    encoder: Optional[Dict[str, Any]] = None

    @classmethod
    def create(
        cls,
        key: jax.Array,
        gcfg: GeneratorConfig,
        stage_a: Optional[bool] = None,
        with_encoder: bool = False,
        encoder_cfg: Optional[Any] = None,
    ) -> "SDFModel":
        """Build generator (+EMA) and the stage-appropriate discriminator
        (reference picks ``VolumeRenderDiscriminator`` vs StyleGAN
        ``Discriminator`` on ``need_train_vol_render``,
        ``sdf/config.py:14-23``)."""
        if stage_a is None:
            stage_a = not gcfg.full_pipeline
        kg, kd, ke = jax.random.split(key, 3)
        g = init_generator(kg, gcfg)
        if stage_a:
            dcfg: Any = VolumeRenderDiscConfig(in_res=gcfg.renderer.out_im_res)
            d = init_volume_render_discriminator(kd, dcfg)
        else:
            dcfg = StyleDiscConfig(
                size=gcfg.size, channel_multiplier=gcfg.channel_multiplier
            )
            d = init_style_discriminator(kd, dcfg)
        encoder = None
        if with_encoder:
            from ..encoder import VAEEncoderConfig, init_vae_encoder

            ecfg = encoder_cfg or VAEEncoderConfig(
                img_size=gcfg.size, z_size=gcfg.style_dim
            )
            encoder = init_vae_encoder(ke, ecfg)
        return cls(
            gcfg=gcfg,
            generator=g,
            generator_test=jax.tree_util.tree_map(jnp.copy, g),
            discriminator=d,
            dcfg=dcfg,
            encoder=encoder,
        )
