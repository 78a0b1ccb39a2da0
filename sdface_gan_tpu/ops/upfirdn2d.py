"""upfirdn2d — upsample / FIR filter / downsample, the StyleGAN2 resampling op.

TPU-native equivalent of the reference CUDA kernel
(``im2scene/sdf/models/upfirdn2d_kernel.cu``; python reference
``sdf_op.py:273-314``).  Instead of a hand-written kernel we express the
whole op as ONE ``lax.conv_general_dilated`` call:

* zero-stuffed upsampling  -> ``lhs_dilation=(up, up)`` (+ trailing pad to
  reproduce the reference's appended zeros after the last pixel),
* FIR filtering            -> depthwise conv with the (flipped) 2D kernel,
* downsampling             -> ``window_strides=(down, down)``.

XLA lowers this to a single fused pass; the backward pass is the exact
transpose conv the reference hand-derives in its autograd Function.

Layout is NHWC (TPU-native) — the reference uses NCHW.

Output size matches the reference exactly:
``out = (in * up + pad0 + pad1 - kernel) // down + 1`` per spatial dim.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax.numpy as jnp
from jax import lax


def make_kernel(k: Union[Sequence[float], jnp.ndarray]) -> jnp.ndarray:
    """Build a normalized 2D FIR kernel from a 1D or 2D tap list.

    1D inputs become their outer product; the kernel is normalized to sum 1
    (reference ``sdf_model.py:469-477``).
    """
    k = jnp.asarray(k, dtype=jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / jnp.sum(k)


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: int = 1,
    down: int = 1,
    pad: Tuple[int, int] = (0, 0),
    channels_last: bool = True,
) -> jnp.ndarray:
    """Apply up/FIR/down resampling.

    Args:
      x: [B, H, W, C] (default) or [B, C, H, W] with ``channels_last=False``
        — the NCHW path exists for few-channel tensors (RGB skips), whose
        NHWC layout lane-pads C up to 128 on TPU.
      kernel: [kh, kw] FIR taps (already scaled by ``up**2`` for upsampling
        paths, as the callers do — reference ``sdf_model.py:485,529``).
      up / down: integer resampling factors (same for both spatial dims,
        matching the reference wrapper ``sdf_op.py:259-270``).
      pad: (pad0, pad1) applied before filtering on both spatial dims.
    """
    if x.ndim != 4:
        raise ValueError(f"upfirdn2d expects a rank-4 tensor, got {x.shape}")
    c = x.shape[-1] if channels_last else x.shape[1]
    dn = ("NHWC", "HWIO", "NHWC") if channels_last else ("NCHW", "HWIO", "NCHW")
    kh, kw = kernel.shape
    # Cross-correlation with a flipped kernel == true convolution, matching
    # the reference's F.conv2d(out, flip(kernel)) (sdf_op.py:304-308).
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    w = jnp.broadcast_to(k[:, :, None, None], (kh, kw, 1, c))
    # lhs_dilation inserts zeros BETWEEN samples; the reference zero-stuffs
    # with (up-1) zeros AFTER each sample (including the last), so append
    # (up-1) to the trailing pad to match shapes/values exactly.
    pads = ((pad[0], pad[1] + up - 1), (pad[0], pad[1] + up - 1))
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(down, down),
        padding=pads,
        lhs_dilation=(up, up),
        dimension_numbers=dn,
        feature_group_count=c,
    )


def upsample2d(
    x: jnp.ndarray, kernel: jnp.ndarray, factor: int = 2, channels_last: bool = True
) -> jnp.ndarray:
    """Blur-upsample (reference ``Upsample``, ``sdf_model.py:480-498``)."""
    k = make_kernel(kernel) * (factor**2)
    p = k.shape[0] - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, k, up=factor, down=1, pad=(pad0, pad1),
                     channels_last=channels_last)


def downsample2d(x: jnp.ndarray, kernel: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Blur-downsample (reference ``Downsample``, ``sdf_model.py:501-519``)."""
    k = make_kernel(kernel)
    p = k.shape[0] - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, k, up=1, down=factor, pad=(pad0, pad1))


def blur(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    pad: Tuple[int, int],
    upsample_factor: int = 1,
) -> jnp.ndarray:
    """FIR blur with explicit padding (reference ``Blur``, ``sdf_model.py:522-538``)."""
    k = make_kernel(kernel)
    if upsample_factor > 1:
        k = k * (upsample_factor**2)
    return upfirdn2d(x, k, pad=pad)
