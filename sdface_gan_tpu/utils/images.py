"""Image grid export (replaces torchvision ``save_image`` usage in the
reference's sample-grid cadence, ``training_utils.py:473-499``)."""

from __future__ import annotations

import numpy as np
from PIL import Image


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> uint8."""
    return np.clip((np.asarray(img) + 1.0) * 127.5, 0, 255).astype(np.uint8)


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8) -> None:
    """Save a [N, H, W, 3] batch (values in [-1, 1]) as a tiled PNG grid."""
    imgs = to_uint8(images)
    n, h, w, c = imgs.shape
    ncol = min(nrow, n)
    nr = (n + ncol - 1) // ncol
    grid = np.zeros((nr * h, ncol * w, c), dtype=np.uint8)
    for i in range(n):
        r, col = divmod(i, ncol)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = imgs[i]
    Image.fromarray(grid).save(path)


def save_image(img: np.ndarray, path: str) -> None:
    """Save one [H, W, 3] image in [-1, 1]."""
    Image.fromarray(to_uint8(img)).save(path)
