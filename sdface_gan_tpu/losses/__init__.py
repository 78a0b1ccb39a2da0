from .gan_losses import (
    d_logistic_loss,
    d_r1_loss,
    g_content_loss,
    g_nonsaturating_loss,
    g_path_regularize,
    viewpoints_loss,
)
from .geometry_losses import (
    distortion_loss,
    eikonal_loss,
    hash_smoothness_loss,
    occupancy_sparsity_loss,
    sphere_init_loss,
)

__all__ = [
    "d_logistic_loss",
    "d_r1_loss",
    "g_nonsaturating_loss",
    "g_content_loss",
    "g_path_regularize",
    "viewpoints_loss",
    "eikonal_loss",
    "sphere_init_loss",
    "hash_smoothness_loss",
    "occupancy_sparsity_loss",
    "distortion_loss",
]
