"""GIRAFFE compositional-NeRF GAN family (second model family of the
reference; ``im2scene/giraffe/``).  Functional JAX rebuild: camera math,
NeRF decoders (positional / Gauss / hash encodings), bounding-box object
transforms, density compositing, 2D neural-renderer upsampler, DCGAN
discriminator, and the BCE + R1 trainer."""

from .camera import (
    arange_pixels,
    get_camera_mat,
    get_camera_pose,
    get_random_pose,
    get_rotation_matrix,
    image_points_to_world,
    origin_to_world,
)
from .decoder import DecoderConfig, apply_giraffe_decoder, init_giraffe_decoder
from .generator import GiraffeConfig, giraffe_forward, init_giraffe
from .neural_renderer import NeuralRendererConfig, apply_neural_renderer, init_neural_renderer
from .bbox import BBoxConfig, sample_transformations
from .discriminator import DCDiscConfig, apply_dc_discriminator, init_dc_discriminator

__all__ = [
    "get_camera_mat",
    "get_random_pose",
    "get_camera_pose",
    "get_rotation_matrix",
    "arange_pixels",
    "image_points_to_world",
    "origin_to_world",
    "DecoderConfig",
    "init_giraffe_decoder",
    "apply_giraffe_decoder",
    "NeuralRendererConfig",
    "init_neural_renderer",
    "apply_neural_renderer",
    "BBoxConfig",
    "sample_transformations",
    "DCDiscConfig",
    "init_dc_discriminator",
    "apply_dc_discriminator",
    "GiraffeConfig",
    "init_giraffe",
    "giraffe_forward",
]
