"""VAE encoder for latent inversion (``--vae 1``).

JAX rebuild of the reference ``Encoder`` (``giraffe/models/autoencoder.py:
48-81``): three stride-2 conv+BN+ReLU blocks, an fc+BN trunk, and mu /
logvar heads.  Batch norm uses batch statistics (training) — the encoder
trains from scratch, so no running-stat import is needed; eval simply
keeps batch stats (deterministic for fixed batches).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.discriminator import _torch_conv, _conv
from ..models.init import uniform

Params = Dict[str, Any]


@dataclass(frozen=True)
class VAEEncoderConfig:
    img_size: int = 64
    channel_in: int = 3
    z_size: int = 512

    @property
    def feat_channels(self):
        return [(self.channel_in, 64), (64, 128), (128, 256)]

    @property
    def fc_in(self) -> int:
        f = self.img_size // 8
        return f * f * 256


def _bn_params(ch: int) -> Params:
    return {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))}


def _batch_norm(p: Params, x: jnp.ndarray, axes=(0, 1, 2)) -> jnp.ndarray:
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]


def _linear(key, in_dim, out_dim, bias=True) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"w": uniform(kw, (in_dim, out_dim), bound)}
    if bias:
        p["b"] = uniform(kb, (out_dim,), bound)
    return p


def init_vae_encoder(key: jax.Array, cfg: VAEEncoderConfig) -> Params:
    keys = jax.random.split(key, 7)
    return {
        "blocks": [
            {"conv": _torch_conv(k, ic, oc, 5, bias=False), "bn": _bn_params(oc)}
            for k, (ic, oc) in zip(keys[:3], cfg.feat_channels)
        ],
        "fc": _linear(keys[3], cfg.fc_in, 1024, bias=False),
        "fc_bn": _bn_params(1024),
        "l_mu": _linear(keys[4], 1024, cfg.z_size),
        "l_var": _linear(keys[5], 1024, cfg.z_size),
    }


def apply_vae_encoder(
    p: Params, cfg: VAEEncoderConfig, x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x [B, H, W, 3] -> (mu [B, z], logvar [B, z])."""
    for block in p["blocks"]:
        x = _conv(block["conv"], x, stride=2, padding=2)
        x = jax.nn.relu(_batch_norm(block["bn"], x))
    h = x.reshape(x.shape[0], -1) @ p["fc"]["w"]
    h = jax.nn.relu(_batch_norm(p["fc_bn"], h, axes=(0,)))
    mu = h @ p["l_mu"]["w"] + p["l_mu"]["b"]
    logvar = h @ p["l_var"]["w"] + p["l_var"]["b"]
    return mu, logvar


@dataclass(frozen=True)
class VAEDecoderConfig:
    z_size: int = 512
    size: int = 256  # base channel width (reference Decoder ``size`` arg)


def init_vae_decoder(key: jax.Array, cfg: VAEDecoderConfig) -> Params:
    """VAE image decoder (reference ``autoencoder.py:86-110``): fc to an
    8x8 map, three transpose-conv+BN+ReLU upsampling blocks, 5x5 conv +
    tanh head."""
    keys = jax.random.split(key, 6)
    s = cfg.size
    chans = [(s, s), (s, s // 2), (s // 2, s // 8)]
    return {
        "fc": _linear(keys[0], cfg.z_size, 8 * 8 * s, bias=False),
        "fc_bn": _bn_params(8 * 8 * s),
        "blocks": [
            {"conv": _torch_conv(k, oc, ic, 5, bias=False), "bn": _bn_params(oc)}
            for k, (ic, oc) in zip(keys[1:4], chans)
        ],
        "head": _torch_conv(keys[4], s // 8, 3, 5),
    }


def apply_vae_decoder(p: Params, cfg: VAEDecoderConfig, z: jnp.ndarray) -> jnp.ndarray:
    """z [B, z_size] -> image [B, 64, 64, 3] in [-1, 1]."""
    import jax.numpy as jnp
    from jax import lax

    h = z @ p["fc"]["w"]
    h = jax.nn.relu(_batch_norm(p["fc_bn"], h, axes=(0,)))
    x = h.reshape(z.shape[0], 8, 8, cfg.size)
    for block in p["blocks"]:
        # ConvTranspose2d(k5, s2, p2, output_padding=1): H -> 2H
        w = block["conv"]["w"]  # stored [k,k,out,in] by _torch_conv(oc, ic)
        x = lax.conv_general_dilated(
            x, jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2),
            window_strides=(1, 1), padding=((2, 3), (2, 3)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jax.nn.relu(_batch_norm(block["bn"], x))
    x = _conv(p["head"], x, padding=2)
    return jnp.tanh(x)


def reparameterize(key: jax.Array, mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """z = mu + eps * std (reference ``training_utils.py:1016-1017``)."""
    std = jnp.exp(0.5 * logvar)
    return mu + std * jax.random.normal(key, mu.shape)


def kl_divergence(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    return -0.5 * jnp.mean(jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=-1))
