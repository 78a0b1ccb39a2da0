"""Inversion encoders + perceptual losses (reference ``im2scene/encoder/``
and ``giraffe/models/autoencoder.py``): the VAE encoder used by ``--vae``,
the pSp GradualStyleEncoder on an ir_se-50 FPN, the ArcFace identity loss,
and LPIPS.  Pretrained torch weights (model_ir_se50 / LPIPS Alex) load via
the importers when available; the architectures run regardless."""

from .vae import VAEEncoderConfig, apply_vae_encoder, init_vae_encoder, reparameterize
from .irse import (
    IRSEConfig,
    apply_gradual_style_encoder,
    apply_irse_backbone,
    init_gradual_style_encoder,
    init_irse_backbone,
)
from .id_loss import id_loss
from .lpips import LPIPSConfig, apply_lpips, init_lpips
from .losses import LossUtils
from .psp import PSPConfig, apply_psp_encoder, init_psp_encoder

__all__ = [
    "VAEEncoderConfig",
    "init_vae_encoder",
    "apply_vae_encoder",
    "reparameterize",
    "IRSEConfig",
    "init_irse_backbone",
    "apply_irse_backbone",
    "init_gradual_style_encoder",
    "apply_gradual_style_encoder",
    "id_loss",
    "LPIPSConfig",
    "init_lpips",
    "apply_lpips",
    "LossUtils",
    "PSPConfig",
    "init_psp_encoder",
    "apply_psp_encoder",
]
