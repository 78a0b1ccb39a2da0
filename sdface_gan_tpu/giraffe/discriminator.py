"""GIRAFFE/gan2d discriminators.

JAX rebuild of ``im2scene/discriminator/conv.py``: the DCGAN-style
discriminator (stride-2 conv pyramid, returns logits + flattened features
for the VAE feature-matching loss) and the GAN-stability ResNet
discriminator.  NHWC.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..models.discriminator import _conv, _torch_conv

Params = Dict[str, Any]


@dataclass(frozen=True)
class DCDiscConfig:
    in_dim: int = 3
    n_feat: int = 512
    img_size: int = 64

    @property
    def n_layers(self) -> int:
        return int(math.log2(self.img_size) - 2)

    def channels(self) -> List[Tuple[int, int]]:
        n = self.n_layers
        chans = [(self.in_dim, self.n_feat // (2 ** (n - 1)))]
        for i in range(1, n):
            chans.append(
                (self.n_feat // (2 ** (n - i)), self.n_feat // (2 ** (n - 1 - i)))
            )
        return chans


def init_dc_discriminator(key: jax.Array, cfg: DCDiscConfig) -> Params:
    chans = cfg.channels()
    keys = jax.random.split(key, len(chans) + 1)
    return {
        "blocks": [
            _torch_conv(k, ic, oc, 4, bias=False)
            for k, (ic, oc) in zip(keys[:-1], chans)
        ],
        "conv_out": _torch_conv(keys[-1], cfg.n_feat, 1, 4, bias=False),
    }


def apply_dc_discriminator(
    p: Params, cfg: DCDiscConfig, x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [B, H, W, 3] -> (logits [B, 1], features [B, n_feat*4*4]).
    Reference ``conv.py:34-48``."""
    b = x.shape[0]
    for block in p["blocks"]:
        x = jax.nn.leaky_relu(_conv(block, x, stride=2, padding=1), 0.2)
    feat = x.reshape(b, -1)
    out = _conv(p["conv_out"], x)  # 4x4 valid conv -> 1x1
    return out.reshape(b, 1), feat


# ---------------------------------------------------------------------------
# GAN-stability ResNet discriminator (reference conv.py:52-97)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ResnetDiscConfig:
    img_size: int = 64
    nfilter: int = 16
    nfilter_max: int = 512
    s0: int = 4

    @property
    def n_layers(self) -> int:
        return int(math.log2(self.img_size / self.s0))

    @property
    def nf0(self) -> int:
        return min(self.nfilter_max, self.nfilter * 2**self.n_layers)

    def block_channels(self) -> List[Tuple[int, int]]:
        nf, nf_max = self.nfilter, self.nfilter_max
        chans = [(nf, nf)]
        for i in range(self.n_layers):
            chans.append((min(nf * 2**i, nf_max), min(nf * 2 ** (i + 1), nf_max)))
        return chans


def _init_resnet_block(key, fin, fout) -> Params:
    fhidden = min(fin, fout)
    k0, k1, k2 = jax.random.split(key, 3)
    p = {
        "conv_0": _torch_conv(k0, fin, fhidden, 3),
        "conv_1": _torch_conv(k1, fhidden, fout, 3),
    }
    if fin != fout:
        p["conv_s"] = _torch_conv(k2, fin, fout, 1, bias=False)
    return p


def _apply_resnet_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """GAN-stability ResnetBlock (reference ``layers.py:53-86``):
    ``x_s + 0.1 * dx`` with leaky-relu pre-activations."""
    dx = _conv(p["conv_0"], jax.nn.leaky_relu(x, 0.2), padding=1)
    dx = _conv(p["conv_1"], jax.nn.leaky_relu(dx, 0.2), padding=1)
    xs = _conv(p["conv_s"], x) if "conv_s" in p else x
    return xs + 0.1 * dx


def init_resnet_discriminator(key: jax.Array, cfg: ResnetDiscConfig) -> Params:
    blocks = cfg.block_channels()
    keys = jax.random.split(key, len(blocks) + 2)
    from ..models.init import uniform

    fc_in = cfg.nf0 * cfg.s0 * cfg.s0
    bound = 1.0 / math.sqrt(fc_in)
    kw, kb = jax.random.split(keys[-1])
    return {
        "conv_img": _torch_conv(keys[0], 3, cfg.nfilter, 3),
        "blocks": [
            _init_resnet_block(k, fin, fout)
            for k, (fin, fout) in zip(keys[1:-1], blocks)
        ],
        "fc": {"w": uniform(kw, (fc_in, 1), bound), "b": uniform(kb, (1,), bound)},
    }


def _avg_pool_3_2_1(x: jnp.ndarray) -> jnp.ndarray:
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0))
    )
    return summed / 9.0


def apply_resnet_discriminator(
    p: Params, cfg: ResnetDiscConfig, x: jnp.ndarray
) -> jnp.ndarray:
    out = _conv(p["conv_img"], x, padding=1)
    out = _apply_resnet_block(p["blocks"][0], out)
    for block in p["blocks"][1:]:
        out = _avg_pool_3_2_1(out)
        out = _apply_resnet_block(block, out)
    out = jax.nn.leaky_relu(out.reshape(x.shape[0], -1), 0.2)
    return out @ p["fc"]["w"] + p["fc"]["b"]
