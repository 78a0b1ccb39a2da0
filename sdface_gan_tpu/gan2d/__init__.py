"""Plain 2D GAN baseline family (reference ``im2scene/gan2d/``)."""

from .generator import Gan2dGeneratorConfig, apply_gan2d_generator, init_gan2d_generator
from .trainer import Gan2dTrainHParams, make_gan2d_d_step, make_gan2d_g_step

__all__ = [
    "Gan2dGeneratorConfig",
    "init_gan2d_generator",
    "apply_gan2d_generator",
    "Gan2dTrainHParams",
    "make_gan2d_d_step",
    "make_gan2d_g_step",
]
