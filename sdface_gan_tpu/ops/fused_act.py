"""Fused bias + leaky-ReLU.

TPU-native equivalent of the reference CUDA op ``fused_bias_act``
(``im2scene/sdf/models/fused_bias_act_kernel.cu``, wrapper
``sdf_op.py:88-120``): ``out = scale * leaky_relu(x + bias)``.

On TPU there is nothing to hand-fuse — XLA folds bias-add + select + mul
into the producing matmul/conv epilogue — so this is a plain jnp function
kept as a *named op* for parity and unit testing.  Channel dim is the LAST
axis (NHWC / [..., C]), unlike the reference's NCHW dim-1 bias.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp

SQRT2 = math.sqrt(2.0)


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    negative_slope: float = 0.2,
    scale: float = SQRT2,
) -> jnp.ndarray:
    """``scale * leaky_relu(x + bias)`` with bias broadcast on the last axis."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return scale * jnp.where(x >= 0, x, negative_slope * x)
