"""Discriminators for the SDF pipeline.

TPU-native rebuild of
* ``VolumeRenderDiscriminator`` — stage-A D on 64^2 thumbs with CoordConv
  residual blocks and a 3-channel head = [GAN logit, azim, elev]
  (reference ``sdf_model.py:1222-1398``);
* StyleGAN ``Discriminator`` — stage-B D on full-res images with blur-
  downsampled ResBlocks and minibatch-stddev (``sdf_model.py:1402-1509``).

NHWC layout; coordinate channels are concatenated on the last axis, which
XLA folds into the conv's im2col without a copy.  All convs are plain
``lax.conv_general_dilated`` calls (MXU path); the residual averaging and
leaky-relu epilogues fuse.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.fused_act import fused_leaky_relu
from ..ops.upfirdn2d import blur as fir_blur
from .init import uniform
from .stylegan2 import (
    BLUR_KERNEL,
    apply_equal_conv2d,
    apply_equal_linear,
    init_equal_conv2d,
    init_equal_linear,
)

Params = Dict[str, Any]

# Stage-A channel schedule (reference ``sdf_model.py:1359-1367``).
VOLRENDER_CHANNELS = {2: 400, 4: 400, 8: 400, 16: 400, 32: 256, 64: 128, 128: 64}


def _torch_conv(key: jax.Array, in_ch: int, out_ch: int, k: int, bias: bool = True) -> Params:
    """torch ``nn.Conv2d`` default init (kaiming_uniform a=sqrt(5)):
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weight and bias."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_ch * k * k)
    p: Params = {"w": uniform(kw, (k, k, in_ch, out_ch), bound)}
    if bias:
        p["b"] = uniform(kb, (out_ch,), bound)
    return p


def _conv(p: Params, x: jnp.ndarray, stride: int = 1, padding: int = 0) -> jnp.ndarray:
    out = lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        out = out + p["b"]
    return out


def add_coords(x: jnp.ndarray) -> jnp.ndarray:
    """Append normalized (y, x) coordinate channels in [-1, 1]
    (reference ``AddCoords``, ``sdf_model.py:1252-1276``)."""
    b, h, w, _ = x.shape
    yy = jnp.linspace(-1.0, 1.0, h, dtype=x.dtype)[None, :, None, None]
    xx = jnp.linspace(-1.0, 1.0, w, dtype=x.dtype)[None, None, :, None]
    yy = jnp.broadcast_to(yy, (b, h, w, 1))
    xx = jnp.broadcast_to(xx, (b, h, w, 1))
    return jnp.concatenate([x, yy, xx], axis=-1)


# ---------------------------------------------------------------------------
# Stage-A: VolumeRenderDiscriminator
# ---------------------------------------------------------------------------

def _init_vrd_conv(
    key: jax.Array, in_ch: int, out_ch: int, k: int, activate: bool
) -> Params:
    """VolumeRenderDiscConv2d (reference ``sdf_model.py:1222-1249``): plain
    conv (biasless when activated) + FusedLeakyReLU(scale=1) whose bias is
    re-initialized U(+-1/sqrt(fan_in))."""
    kc, kb = jax.random.split(key)
    p = _torch_conv(kc, in_ch, out_ch, k, bias=not activate)
    if activate:
        bound = math.sqrt(1.0 / (in_ch * k * k))
        p["act_bias"] = uniform(kb, (out_ch,), bound)
    return p


def _apply_vrd_conv(p: Params, x: jnp.ndarray, stride: int = 1, padding: int = 0) -> jnp.ndarray:
    out = _conv(p, x, stride=stride, padding=padding)
    if "act_bias" in p:
        out = fused_leaky_relu(out, p["act_bias"], scale=1.0)
    return out


def _init_coord_conv_layer(key: jax.Array, in_ch: int, out_ch: int, k: int) -> Params:
    """CoordConvLayer (reference ``sdf_model.py:1299-1322``): CoordConv
    (in+2 channels) -> FusedLeakyReLU(scale=1) with uniform bias init."""
    kc, kb = jax.random.split(key)
    p = _torch_conv(kc, in_ch + 2, out_ch, k, bias=False)
    bound = math.sqrt(1.0 / (in_ch * k * k))
    p["act_bias"] = uniform(kb, (out_ch,), bound)
    return p


def _apply_coord_conv_layer(p: Params, x: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    pad = k // 2 if k > 2 else 0
    out = _conv(p, add_coords(x), padding=pad)
    return fused_leaky_relu(out, p["act_bias"], scale=1.0)


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return lax.reduce_window(
        x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) * 0.25


@dataclass(frozen=True)
class VolumeRenderDiscConfig:
    in_res: int = 64
    viewpoint_head: bool = True

    @property
    def final_out(self) -> int:
        return 3 if self.viewpoint_head else 1

    def block_channels(self) -> List[Tuple[int, int]]:
        log = int(math.log2(self.in_res))
        chans = []
        in_ch = VOLRENDER_CHANNELS[self.in_res]
        for i in range(log - 1, 0, -1):
            chans.append((in_ch, VOLRENDER_CHANNELS[2**i]))
            in_ch = VOLRENDER_CHANNELS[2**i]
        return chans


def init_volume_render_discriminator(key: jax.Array, cfg: VolumeRenderDiscConfig) -> Params:
    blocks = cfg.block_channels()
    keys = jax.random.split(key, 2 + 3 * len(blocks))
    ki = iter(range(len(keys)))
    params: Params = {
        "conv_in": _init_vrd_conv(keys[next(ki)], 3, VOLRENDER_CHANNELS[cfg.in_res], 1, True),
        "blocks": [],
        "final": _init_vrd_conv(keys[next(ki)], blocks[-1][1], cfg.final_out, 2, False),
    }
    for in_ch, out_ch in blocks:
        block = {
            "conv1": _init_coord_conv_layer(keys[next(ki)], in_ch, out_ch, 3),
            "conv2": _init_coord_conv_layer(keys[next(ki)], out_ch, out_ch, 3),
        }
        if in_ch != out_ch:
            block["skip"] = _init_vrd_conv(keys[next(ki)], in_ch, out_ch, 1, False)
        else:
            next(ki)
        params["blocks"].append(block)
    return params


def apply_volume_render_discriminator(
    p: Params, cfg: VolumeRenderDiscConfig, x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (gan_logits [B,1], viewpoint_preds [B,2] or None).

    x: [B, H, W, 3] thumb images (NHWC).
    Reference forward: ``sdf_model.py:1326-1351,1385-1396``.
    """
    out = _apply_vrd_conv(p["conv_in"], x)
    for block in p["blocks"]:
        h = _apply_coord_conv_layer(block["conv1"], out)
        h = _apply_coord_conv_layer(block["conv2"], h)
        h = _avg_pool2(h)
        skip_in = _avg_pool2(out)
        if "skip" in block:
            skip_in = _apply_vrd_conv(block["skip"], skip_in)
        out = (h + skip_in) / math.sqrt(2.0)
    out = _apply_vrd_conv(p["final"], out)  # [B, 1, 1, final_out]
    out = out.reshape(out.shape[0], -1)
    gan_preds = out[:, :1]
    view_preds = out[:, 1:] if cfg.viewpoint_head else None
    return gan_preds, view_preds


# ---------------------------------------------------------------------------
# Stage-B: StyleGAN Discriminator
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class StyleDiscConfig:
    size: int = 256
    channel_multiplier: int = 2
    channel_base: int = 512
    stddev_group: int = 4
    stddev_feat: int = 1

    @property
    def channels(self) -> Dict[int, int]:
        from .stylegan2 import channel_table

        return channel_table(self.channel_multiplier, self.channel_base)

    def block_channels(self) -> List[Tuple[int, int]]:
        chans = self.channels
        out = []
        in_ch = chans[self.size]
        for i in range(int(math.log2(self.size)), 2, -1):
            out.append((in_ch, chans[2 ** (i - 1)]))
            in_ch = chans[2 ** (i - 1)]
        return out


def _init_conv_layer(
    key: jax.Array, in_ch: int, out_ch: int, k: int, downsample: bool = False,
    activate: bool = True, bias: bool = True,
) -> Params:
    p: Params = {"conv": init_equal_conv2d(key, in_ch, out_ch, k, bias=bias and not activate)}
    if activate:
        p["act_bias"] = jnp.zeros((out_ch,), dtype=jnp.float32)
    return p


def _apply_conv_layer(
    p: Params, x: jnp.ndarray, k: int, downsample: bool = False
) -> jnp.ndarray:
    """ConvLayer (reference ``sdf_model.py:846-880``): optional blur +
    stride-2 conv, then fused leaky relu."""
    if downsample:
        factor = 2
        pb = (len(BLUR_KERNEL) - factor) + (k - 1)
        pad0 = (pb + 1) // 2
        pad1 = pb // 2
        x = fir_blur(x, jnp.asarray(BLUR_KERNEL, jnp.float32), (pad0, pad1))
        out = apply_equal_conv2d(p["conv"], x, stride=2, padding=0)
    else:
        out = apply_equal_conv2d(p["conv"], x, stride=1, padding=k // 2)
    if "act_bias" in p:
        out = fused_leaky_relu(out, p["act_bias"])
    return out


def init_style_discriminator(key: jax.Array, cfg: StyleDiscConfig) -> Params:
    blocks = cfg.block_channels()
    chans = cfg.channels
    keys = jax.random.split(key, 4 + 3 * len(blocks))
    ki = iter(range(len(keys)))
    params: Params = {
        "conv_in": _init_conv_layer(keys[next(ki)], 3, chans[cfg.size], 1),
        "blocks": [
            {
                "conv1": _init_conv_layer(keys[next(ki)], in_ch, in_ch, 3),
                "conv2": _init_conv_layer(keys[next(ki)], in_ch, out_ch, 3, downsample=True),
                "skip": _init_conv_layer(
                    keys[next(ki)], in_ch, out_ch, 1, downsample=True, activate=False, bias=False
                ),
            }
            for in_ch, out_ch in blocks
        ],
        "final_conv": _init_conv_layer(keys[next(ki)], blocks[-1][1] + 1, chans[4], 3),
        "final_linear1": init_equal_linear(keys[next(ki)], chans[4] * 4 * 4, chans[4]),
        "final_linear2": init_equal_linear(keys[next(ki)], chans[4], 1),
    }
    return params


def minibatch_stddev(x: jnp.ndarray, group_size: int = 4, feat: int = 1) -> jnp.ndarray:
    """Minibatch-stddev channel (reference ``sdf_model.py:1465-1477``).

    x: [B, H, W, C]; appends one channel with the group-averaged stddev.
    """
    b, h, w, c = x.shape
    # Largest group <= group_size that divides the batch.  The reference
    # (and upstream StyleGAN2) crashes on batches with no small divisor
    # (e.g. b=5 -> group 2 -> ragged reshape); the divisor search keeps
    # every batch size valid (group 1 degenerates to a zero channel).
    group = min(b, group_size)
    while b % group:
        group -= 1
    g = x.reshape(group, b // group, h, w, feat, c // feat)
    var = jnp.var(g, axis=0)
    stddev = jnp.sqrt(var + 1e-8)
    stddev = jnp.mean(stddev, axis=(1, 2, 3, 4), keepdims=True)  # [b/group,1,1,1,1]
    stddev = stddev.reshape(b // group, 1, 1, 1)
    stddev = jnp.tile(stddev, (group, h, w, 1))
    return jnp.concatenate([x, stddev], axis=-1)


def style_discriminator_features(
    p: Params, cfg: StyleDiscConfig, x: jnp.ndarray
) -> jnp.ndarray:
    """Conv trunk + minibatch-stddev + final conv, flattened
    (reference ``get_feat``, ``sdf_model.py:1488-1509``)."""
    out = _apply_conv_layer(p["conv_in"], x, 1)
    for block in p["blocks"]:
        h = _apply_conv_layer(block["conv1"], out, 3)
        h = _apply_conv_layer(block["conv2"], h, 3, downsample=True)
        skip = _apply_conv_layer(block["skip"], out, 1, downsample=True)
        out = (h + skip) / math.sqrt(2.0)
    out = minibatch_stddev(out, cfg.stddev_group, cfg.stddev_feat)
    out = _apply_conv_layer(p["final_conv"], out, 3)
    return out.reshape(out.shape[0], -1)


def apply_style_discriminator(p: Params, cfg: StyleDiscConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Returns GAN logits [B, 1].  x: [B, size, size, 3] NHWC."""
    feat = style_discriminator_features(p, cfg, x)
    out = apply_equal_linear(p["final_linear1"], feat, activate=True)
    return apply_equal_linear(p["final_linear2"], out)
