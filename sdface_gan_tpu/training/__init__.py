from .ema import EMA_DECAY, accumulate
from .optim import (
    decoder_only,
    encoder_optimizer,
    stage_a_optimizers,
    stage_b_optimizers,
)
from .steps import (
    CameraHParams,
    TrainHParams,
    make_sphere_init_step,
    make_stage_a_d_step,
    make_stage_a_g_step,
    make_stage_b_d_step,
    make_stage_b_g_step,
    make_stage_b_path_step,
)

__all__ = [
    "EMA_DECAY",
    "accumulate",
    "stage_a_optimizers",
    "stage_b_optimizers",
    "decoder_only",
    "encoder_optimizer",
    "CameraHParams",
    "TrainHParams",
    "make_sphere_init_step",
    "make_stage_a_d_step",
    "make_stage_a_g_step",
    "make_stage_b_d_step",
    "make_stage_b_g_step",
    "make_stage_b_path_step",
]
