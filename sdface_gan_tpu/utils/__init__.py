from .checkpoints import (
    CheckpointIO,
    latest_checkpoint_step,
    load_checkpoint,
    save_checkpoint,
)
from .logging import MetricsLogger
from .images import save_image_grid

__all__ = [
    "CheckpointIO",
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint_step",
    "MetricsLogger",
    "save_image_grid",
]
