"""GAN-stability ResNet generator (2D baseline).

JAX rebuild of ``im2scene/gan2d/models/generator.py``: z -> fc -> 4x4
feature map -> (ResnetBlock + 2x nearest upsample) chain -> final
ResnetBlock -> 3x3 conv -> tanh, output rescaled to [0, 1] by the model
wrapper (``gan2d/models/__init__.py:40-45``).  NHWC.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..giraffe.discriminator import _apply_resnet_block, _init_resnet_block
from ..models.discriminator import _conv, _torch_conv
from ..models.init import uniform

Params = Dict[str, Any]


@dataclass(frozen=True)
class Gan2dGeneratorConfig:
    z_dim: int = 256
    size: int = 64
    nfilter: int = 16
    nfilter_max: int = 512
    s0: int = 4

    @property
    def n_layers(self) -> int:
        return int(math.log2(self.size / self.s0))

    @property
    def nf0(self) -> int:
        return min(self.nfilter_max, self.nfilter * 2**self.n_layers)

    def block_channels(self) -> List[Tuple[int, int]]:
        nf, nf_max, n = self.nfilter, self.nfilter_max, self.n_layers
        chans = []
        for i in range(n):
            chans.append(
                (min(nf * 2 ** (n - i), nf_max), min(nf * 2 ** (n - i - 1), nf_max))
            )
        chans.append((nf, nf))
        return chans


def init_gan2d_generator(key: jax.Array, cfg: Gan2dGeneratorConfig) -> Params:
    blocks = cfg.block_channels()
    keys = jax.random.split(key, len(blocks) + 2)
    fc_in = cfg.z_dim
    fc_out = cfg.nf0 * cfg.s0 * cfg.s0
    bound = 1.0 / math.sqrt(fc_in)
    kw, kb = jax.random.split(keys[0])
    return {
        "fc": {"w": uniform(kw, (fc_in, fc_out), bound), "b": uniform(kb, (fc_out,), bound)},
        "blocks": [
            _init_resnet_block(k, fin, fout) for k, (fin, fout) in zip(keys[1:-1], blocks)
        ],
        "conv_img": _torch_conv(keys[-1], cfg.nfilter, 3, 3),
    }


def apply_gan2d_generator(
    p: Params, cfg: Gan2dGeneratorConfig, z: jnp.ndarray
) -> jnp.ndarray:
    """z [B, z_dim] -> image [B, size, size, 3] in [-1, 1] (tanh)."""
    b = z.shape[0]
    out = (z @ p["fc"]["w"] + p["fc"]["b"]).reshape(b, cfg.s0, cfg.s0, cfg.nf0)
    for i, block in enumerate(p["blocks"][:-1]):
        out = _apply_resnet_block(block, out)
        out = jnp.repeat(jnp.repeat(out, 2, axis=1), 2, axis=2)
    out = _apply_resnet_block(p["blocks"][-1], out)
    out = _conv(p["conv_img"], jax.nn.leaky_relu(out, 0.2), padding=1)
    return jnp.tanh(out)
