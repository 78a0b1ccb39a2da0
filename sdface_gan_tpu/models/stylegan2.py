"""StyleGAN2 building blocks and the 64->256 feature Decoder.

TPU-native rebuild of the reference StyleGAN2 stack
(``im2scene/sdf/models/sdf_model.py:429-1056``): equalized-lr linears and
convs, modulated conv, noise injection, StyledConv/ToRGB, and the Decoder
that upsamples the volume renderer's 64x64 256-ch feature map to the final
image.

TPU-first design decisions:
* NHWC layout + HWIO kernels (XLA's native TPU conv layout) — no NCHW.
* **Modulated conv without grouped conv.** The reference builds a per-sample
  weight tensor and runs ``groups=batch`` convolutions
  (``sdf_model.py:660-701``), which lowers poorly.  Because conv is linear
  in both input and weight, style modulation commutes:
  ``conv(x, w*s) == conv(x*s, w)`` (s is per-in-channel) and demodulation is
  a per-(sample, out-channel) rescale of the OUTPUT.  So we scale the input,
  run ONE batched conv with shared weights (perfect MXU tiling), and scale
  the output — bit-equivalent math, no groups.
* upfirdn2d is the single fused ``conv_general_dilated`` in ``ops/``.
* Noise is explicit (PRNG keys), so the decoder jits and shards cleanly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.fused_act import fused_leaky_relu
from ..ops.upfirdn2d import blur as fir_blur
from ..ops.upfirdn2d import make_kernel, upsample2d

Params = Dict[str, Any]

BLUR_KERNEL = (1, 3, 3, 1)


# ---------------------------------------------------------------------------
# Equalized-lr layers
# ---------------------------------------------------------------------------

def init_equal_linear(
    key: jax.Array, in_dim: int, out_dim: int, lr_mul: float = 1.0, bias_init: float = 0.0
) -> Params:
    """EqualLinear (reference ``sdf_model.py:575-608``): weight stored as
    N(0,1)/lr_mul, runtime scale ``lr_mul/sqrt(in)``."""
    w = jax.random.normal(key, (in_dim, out_dim), dtype=jnp.float32) / lr_mul
    return {"w": w, "b": jnp.full((out_dim,), bias_init, dtype=jnp.float32)}


def apply_equal_linear(
    p: Params,
    x: jnp.ndarray,
    lr_mul: float = 1.0,
    activate: bool = False,
) -> jnp.ndarray:
    in_dim = p["w"].shape[0]
    scale = (1.0 / math.sqrt(in_dim)) * lr_mul
    out = x.astype(p["w"].dtype) @ (p["w"] * scale)
    if activate:
        return fused_leaky_relu(out, p["b"] * lr_mul)
    return out + p["b"] * lr_mul


def init_mapping_linear(
    key: jax.Array, in_dim: int, out_dim: int, is_last: bool = False
) -> Params:
    """MappingLinear (reference ``sdf_model.py:437-461``)."""
    from .init import mapping_linear_params

    return mapping_linear_params(key, in_dim, out_dim, is_last=is_last)


def apply_mapping_linear(p: Params, x: jnp.ndarray, activate: bool = True) -> jnp.ndarray:
    out = x.astype(p["w"].dtype) @ p["w"]
    if activate:
        return fused_leaky_relu(out, p["b"], scale=1.0)
    return out + p["b"]


def pixel_norm(x: jnp.ndarray) -> jnp.ndarray:
    """PixelNorm over the channel (last) axis (reference ``sdf_model.py:429-434``)."""
    return x * lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + 1e-8)


def init_equal_conv2d(
    key: jax.Array, in_ch: int, out_ch: int, kernel_size: int, bias: bool = True
) -> Params:
    w = jax.random.normal(
        key, (kernel_size, kernel_size, in_ch, out_ch), dtype=jnp.float32
    )
    p: Params = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_ch,), dtype=jnp.float32)
    return p


def apply_equal_conv2d(
    p: Params, x: jnp.ndarray, stride: int = 1, padding: int = 0
) -> jnp.ndarray:
    """EqualConv2d (reference ``sdf_model.py:541-572``) in NHWC/HWIO."""
    kh, kw, in_ch, _ = p["w"].shape
    scale = 1.0 / math.sqrt(in_ch * kh * kw)
    out = lax.conv_general_dilated(
        x.astype(p["w"].dtype),
        p["w"] * scale,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        out = out + p["b"]
    return out


# ---------------------------------------------------------------------------
# Modulated convolution
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ModConvConfig:
    in_ch: int
    out_ch: int
    kernel_size: int
    style_dim: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Tuple[int, ...] = BLUR_KERNEL


def init_modulated_conv(key: jax.Array, cfg: ModConvConfig) -> Params:
    kw, km = jax.random.split(key)
    return {
        "w": jax.random.normal(
            kw, (cfg.kernel_size, cfg.kernel_size, cfg.in_ch, cfg.out_ch), dtype=jnp.float32
        ),
        "modulation": init_equal_linear(km, cfg.style_dim, cfg.in_ch, bias_init=1.0),
    }


def _mod_demod(p: Params, cfg: ModConvConfig, style: jnp.ndarray):
    """Per-sample input-channel scale s and output-channel demod factor."""
    s = apply_equal_linear(p["modulation"], style)  # [B, in_ch]
    fan_in = cfg.in_ch * cfg.kernel_size**2
    scale = 1.0 / math.sqrt(fan_in)
    demod = None
    if cfg.demodulate:
        # rsqrt(sum_{kh,kw,in} (scale * W * s)^2 + 1e-8) per (batch, out)
        w2 = jnp.sum((scale * p["w"]) ** 2, axis=(0, 1))  # [in, out]
        demod = lax.rsqrt((s**2) @ w2 + 1e-8)  # [B, out]
    return s, scale, demod


def apply_modulated_conv(
    p: Params, cfg: ModConvConfig, x: jnp.ndarray, style: jnp.ndarray
) -> jnp.ndarray:
    """Modulated conv via input/output scaling (see module docstring).

    x: [B, H, W, in_ch] NHWC; style: [B, style_dim].
    Matches reference ``ModulatedConv2d.forward`` (``sdf_model.py:655-701``)
    exactly: conv(x * s, scale*W) * demod == grouped-conv(x, scale*W*s*demod).
    """
    s, scale, demod = _mod_demod(p, cfg, style)
    w = p["w"] * scale
    k = cfg.kernel_size
    x = x.astype(w.dtype)

    if cfg.upsample:
        xs = x * s[:, None, None, :]
        # conv_transpose(stride 2) == lhs-dilated conv with flipped kernel
        out = lax.conv_general_dilated(
            xs,
            jnp.flip(w, (0, 1)),
            window_strides=(1, 1),
            padding=((k - 1, k - 1), (k - 1, k - 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if demod is not None:
            out = out * demod[:, None, None, :]
        factor = 2
        pb = (len(cfg.blur_kernel) - factor) - (k - 1)
        pad0 = (pb + 1) // 2 + factor - 1
        pad1 = pb // 2 + 1
        return fir_blur(out, jnp.asarray(cfg.blur_kernel, jnp.float32), (pad0, pad1), upsample_factor=factor)

    if cfg.downsample:
        factor = 2
        pb = (len(cfg.blur_kernel) - factor) + (k - 1)
        pad0 = (pb + 1) // 2
        pad1 = pb // 2
        xb = fir_blur(x, jnp.asarray(cfg.blur_kernel, jnp.float32), (pad0, pad1))
        xs = xb * s[:, None, None, :]
        out = lax.conv_general_dilated(
            xs,
            w,
            window_strides=(2, 2),
            padding=((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if demod is not None:
            out = out * demod[:, None, None, :]
        return out

    xs = x * s[:, None, None, :]
    pad = k // 2
    out = lax.conv_general_dilated(
        xs,
        w,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if demod is not None:
        out = out * demod[:, None, None, :]
    return out


# ---------------------------------------------------------------------------
# StyledConv / ToRGB
# ---------------------------------------------------------------------------

def init_styled_conv(key: jax.Array, cfg: ModConvConfig) -> Params:
    kc, _ = jax.random.split(key)
    return {
        "conv": init_modulated_conv(kc, cfg),
        "noise_weight": jnp.zeros((1,), dtype=jnp.float32),
        "act_bias": jnp.zeros((cfg.out_ch,), dtype=jnp.float32),
    }


def apply_styled_conv(
    p: Params,
    cfg: ModConvConfig,
    x: jnp.ndarray,
    style: jnp.ndarray,
    noise: Optional[jnp.ndarray] = None,
    noise_key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """ModConv -> noise injection -> fused leaky relu
    (reference ``StyledConv``, ``sdf_model.py:795-819``)."""
    out = apply_modulated_conv(p["conv"], cfg, x, style)
    if noise is None and noise_key is not None:
        b, h, w, _ = out.shape
        # [B,H,W] (not [B,H,W,1]): a trailing singleton would lane-pad the
        # tensor 128x under TPU tiling; the [..., None] broadcast below
        # reads the dense layout and fuses into the add.
        noise = jax.random.normal(noise_key, (b, h, w), dtype=out.dtype)
    if noise is not None:
        if noise.ndim == 4:
            noise = noise[..., 0]
        out = out + p["noise_weight"] * noise[..., None]
    return fused_leaky_relu(out, p["act_bias"])


def init_to_rgb(key: jax.Array, in_ch: int, style_dim: int) -> Params:
    cfg = ModConvConfig(in_ch, 3, 1, style_dim, demodulate=False)
    return {
        "conv": init_modulated_conv(key, cfg),
        "bias": jnp.zeros((1, 1, 1, 3), dtype=jnp.float32),
    }


def apply_to_rgb(
    p: Params,
    in_ch: int,
    style_dim: int,
    x: jnp.ndarray,
    style: jnp.ndarray,
    skip: Optional[jnp.ndarray] = None,
    upsample: bool = True,
) -> jnp.ndarray:
    """1x1 non-demod modconv to RGB + skip pyramid
    (reference ``ToRGB``, ``sdf_model.py:822-843``)."""
    cfg = ModConvConfig(in_ch, 3, 1, style_dim, demodulate=False)
    out = apply_modulated_conv(p["conv"], cfg, x, style) + p["bias"]
    if skip is not None:
        if upsample:
            skip = upsample2d(skip, jnp.asarray(BLUR_KERNEL, jnp.float32))
        out = out + skip
    return out


# NOTE on skip layout: carrying the 3-channel skip pyramid NCHW (dense
# lanes) was tried and measured — no gain in the full pipeline (XLA fuses
# the upsample+add into the ToRGB epilogue well enough), and when the
# decoder is jitted standalone the NHWC->NCHW conv output lets layout
# assignment propagate NCHW into the big styled convs (3.5x slower).
# upfirdn2d keeps its channels_last=False option for few-channel tensors.


# ---------------------------------------------------------------------------
# Decoder — 64^2 feature map -> full-res image
# ---------------------------------------------------------------------------

def channel_table(
    channel_multiplier: int, channel_base: int = 512
) -> Dict[int, int]:
    """Per-resolution channel widths (reference ``sdf_model.py:913-923``).

    ``channel_base`` scales the whole table (the reference hard-codes 512);
    the default reproduces reference widths exactly.  Smaller bases exist so
    tiny smoke/dryrun configs don't compile-and-run 512-wide convs at 16^2
    (the table floors at 512 below 64^2 otherwise).
    """
    base = channel_base
    return {
        4: base,
        8: base,
        16: base,
        32: base,
        64: base // 2 * channel_multiplier,
        128: base // 4 * channel_multiplier,
        256: base // 8 * channel_multiplier,
        512: base // 16 * channel_multiplier,
        1024: base // 32 * channel_multiplier,
    }


@dataclass(frozen=True)
class DecoderConfig:
    size: int = 256
    style_dim: int = 512  # 2x the renderer style_dim (reference sdf_model.py:887)
    in_res: int = 64  # renderer_spatial_output_dim
    in_channels: int = 256  # renderer feature width
    channel_multiplier: int = 2
    channel_base: int = 512
    lr_mapping: float = 0.01
    n_mapping: int = 5

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def log_in_size(self) -> int:
        return int(math.log2(self.in_res))

    @property
    def num_layers(self) -> int:
        return (self.log_size - self.log_in_size) * 2 + 1

    @property
    def n_latent(self) -> int:
        return (self.log_size - self.log_in_size) * 2 + 2

    @property
    def channels(self) -> Dict[int, int]:
        return channel_table(self.channel_multiplier, self.channel_base)

    def block_channels(self) -> List[Tuple[int, int]]:
        """(in, out) for each upsampling block."""
        chans = self.channels
        out = []
        in_ch = chans[self.in_res]
        for i in range(self.log_in_size + 1, self.log_size + 1):
            out.append((in_ch, chans[2**i]))
            in_ch = chans[2**i]
        return out

    def noise_shapes(self) -> List[int]:
        """Spatial resolution of each per-layer noise buffer
        (reference ``sdf_model.py:948-952``)."""
        res = []
        for layer_idx in range(self.num_layers):
            r = (layer_idx + 2 * self.log_in_size + 1) // 2
            res.append(2**r)
        return res


def init_decoder(key: jax.Array, cfg: DecoderConfig) -> Params:
    keys = jax.random.split(key, cfg.n_mapping + 3 + 3 * len(cfg.block_channels()) + 1)
    ki = iter(range(len(keys)))

    # Mapping: PixelNorm + EqualLinear(256->512) + 4x EqualLinear(512->512)
    mapping = [init_equal_linear(keys[next(ki)], cfg.style_dim // 2, cfg.style_dim, lr_mul=cfg.lr_mapping)]
    for _ in range(cfg.n_mapping - 1):
        mapping.append(
            init_equal_linear(keys[next(ki)], cfg.style_dim, cfg.style_dim, lr_mul=cfg.lr_mapping)
        )

    chans = cfg.channels
    base_ch = chans[cfg.in_res]
    conv1 = init_styled_conv(
        keys[next(ki)], ModConvConfig(cfg.in_channels, base_ch, 3, cfg.style_dim)
    )
    to_rgb1 = init_to_rgb(keys[next(ki)], base_ch, cfg.style_dim)

    convs, to_rgbs = [], []
    for in_ch, out_ch in cfg.block_channels():
        convs.append(
            init_styled_conv(
                keys[next(ki)], ModConvConfig(in_ch, out_ch, 3, cfg.style_dim, upsample=True)
            )
        )
        convs.append(
            init_styled_conv(keys[next(ki)], ModConvConfig(out_ch, out_ch, 3, cfg.style_dim))
        )
        to_rgbs.append(init_to_rgb(keys[next(ki)], out_ch, cfg.style_dim))

    noise_key = keys[next(ki)]
    noises = [
        jax.random.normal(k, (1, r, r, 1), dtype=jnp.float32)
        for k, r in zip(jax.random.split(noise_key, cfg.num_layers), cfg.noise_shapes())
    ]
    return {
        "mapping": mapping,
        "conv1": conv1,
        "to_rgb1": to_rgb1,
        "convs": convs,
        "to_rgbs": to_rgbs,
        "noises": noises,
    }


def decoder_map_style(p: Params, cfg: DecoderConfig, z: jnp.ndarray) -> jnp.ndarray:
    """The decoder's 5-layer mapping head (reference ``sdf_model.py:893-910``)."""
    h = pixel_norm(z)
    for layer in p["mapping"]:
        h = apply_equal_linear(layer, h, lr_mul=cfg.lr_mapping, activate=True)
    return h


def decoder_mean_latent(p: Params, cfg: DecoderConfig, renderer_latent: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(decoder_map_style(p, cfg, renderer_latent), axis=0, keepdims=True)


def make_decoder_latent(
    p: Params,
    cfg: DecoderConfig,
    styles: Sequence[jnp.ndarray],
    inject_index: Optional[int] = None,
    truncation: float = 1.0,
    truncation_latent: Optional[jnp.ndarray] = None,
    input_is_latent: bool = False,
) -> jnp.ndarray:
    """Build the [B, n_latent, style_dim] per-layer latent with optional
    truncation and style mixing (reference ``sdf_model.py:981-1022``).

    ``inject_index`` may be a Python int OR a traced jnp scalar (the train
    step draws it inside jit); layers ``< inject_index`` take style 0,
    the rest style 1.
    """
    if not input_is_latent:
        styles = [decoder_map_style(p, cfg, s) for s in styles]
    if truncation < 1.0 and truncation_latent is not None:
        styles = [truncation_latent + truncation * (s - truncation_latent) for s in styles]
    n = cfg.n_latent
    if len(styles) < 2:
        latent = (
            jnp.repeat(styles[0][:, None, :], n, axis=1) if styles[0].ndim < 3 else styles[0]
        )
    else:
        idx = inject_index if inject_index is not None else n - 1
        layer = jnp.arange(n)[None, :, None]
        latent = jnp.where(
            layer < idx, styles[0][:, None, :], styles[1][:, None, :]
        )
    return latent


def apply_decoder(
    p: Params,
    cfg: DecoderConfig,
    features: jnp.ndarray,
    latent: jnp.ndarray,
    rgbd_in: Optional[jnp.ndarray] = None,
    noise: Optional[List[Optional[jnp.ndarray]]] = None,
    noise_key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Run the StyledConv/ToRGB pyramid (reference ``Decoder.forward``,
    ``sdf_model.py:1027-1056``).

    Args:
      features: [B, in_res, in_res, in_channels] NHWC feature map.
      latent: [B, n_latent, style_dim] from :func:`make_decoder_latent`.
      noise: explicit per-layer noise list; None entries fall back to the
        stored buffers unless ``noise_key`` is given (randomize-noise mode).
    Returns [B, size, size, 3].
    """
    chans = cfg.channels
    base_ch = chans[cfg.in_res]
    nlayers = cfg.num_layers
    if noise is None:
        if noise_key is not None:
            nkeys = jax.random.split(noise_key, nlayers)
            noise = [None] * nlayers
            noise_keys: List[Optional[jax.Array]] = list(nkeys)
        else:
            noise = list(p["noises"])
            noise_keys = [None] * nlayers
    else:
        noise_keys = [None] * nlayers

    cfg1 = ModConvConfig(cfg.in_channels, base_ch, 3, cfg.style_dim)
    out = apply_styled_conv(
        p["conv1"], cfg1, features, latent[:, 0], noise=noise[0], noise_key=noise_keys[0]
    )
    skip = apply_to_rgb(
        p["to_rgb1"], base_ch, cfg.style_dim, out, latent[:, 1], skip=rgbd_in, upsample=False
    )

    i = 1
    layer = 1
    for bi, (in_ch, out_ch) in enumerate(cfg.block_channels()):
        c_up = ModConvConfig(in_ch, out_ch, 3, cfg.style_dim, upsample=True)
        c_same = ModConvConfig(out_ch, out_ch, 3, cfg.style_dim)
        out = apply_styled_conv(
            p["convs"][2 * bi], c_up, out, latent[:, i], noise=noise[layer], noise_key=noise_keys[layer]
        )
        out = apply_styled_conv(
            p["convs"][2 * bi + 1],
            c_same,
            out,
            latent[:, i + 1],
            noise=noise[layer + 1],
            noise_key=noise_keys[layer + 1],
        )
        skip = apply_to_rgb(
            p["to_rgbs"][bi], out_ch, cfg.style_dim, out, latent[:, i + 2], skip=skip
        )
        i += 2
        layer += 2
    return skip
