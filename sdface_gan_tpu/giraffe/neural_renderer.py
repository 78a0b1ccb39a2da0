"""GIRAFFE 2D neural renderer: 16^2 feature map -> image.

JAX rebuild of ``im2scene/giraffe/models/neural_renderer.py``: upsample
chain (nearest for features, bilinear+blur for RGB) with conv layers and
RGB skip accumulation, sigmoid output.  NHWC layout.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from jax import lax

from ..models.discriminator import _conv, _torch_conv

Params = Dict[str, Any]


@dataclass(frozen=True)
class NeuralRendererConfig:
    n_feat: int = 128
    input_dim: int = 128
    out_dim: int = 3
    final_actvn: bool = True
    min_feat: int = 32
    img_size: int = 64
    use_rgb_skip: bool = True
    upsample_feat: str = "nn"  # 'nn' | 'bilinear'
    upsample_rgb: str = "bilinear"
    use_norm: bool = False

    @property
    def n_blocks(self) -> int:
        import math

        return int(math.log2(self.img_size) - 4)

    def feat_channels(self) -> List[int]:
        chans = [self.n_feat]
        for i in range(self.n_blocks):
            chans.append(max(self.n_feat // (2 ** (i + 1)), self.min_feat))
        return chans


def init_neural_renderer(key: jax.Array, cfg: NeuralRendererConfig) -> Params:
    chans = cfg.feat_channels()
    keys = iter(jax.random.split(key, 2 * len(chans) + 4))
    p: Params = {}
    if cfg.n_feat != cfg.input_dim:
        p["conv_in"] = _torch_conv(next(keys), cfg.input_dim, cfg.n_feat, 1)
    p["conv_layers"] = [
        _torch_conv(next(keys), chans[i], chans[i + 1], 3) for i in range(cfg.n_blocks)
    ]
    if cfg.use_rgb_skip:
        p["conv_rgb"] = [_torch_conv(next(keys), cfg.input_dim, cfg.out_dim, 3)] + [
            _torch_conv(next(keys), chans[i + 1], cfg.out_dim, 3)
            for i in range(cfg.n_blocks)
        ]
    else:
        p["conv_rgb"] = _torch_conv(next(keys), chans[-1], 3, 3)
    return p


def _upsample_nn(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _upsample_bilinear_blur(x: jnp.ndarray) -> jnp.ndarray:
    """bilinear x2 (align_corners=False) + 3x3 [1,2,1] blur (reference
    kornia ``Blur`` in ``im2scene/layers.py:89-103``; kornia ``filter2D``
    pads with its default REFLECT border — golden-pinned by
    ``tests/test_giraffe_golden.py::test_neural_renderer_golden``)."""
    b, h, w, c = x.shape
    up = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")
    up = jnp.pad(up, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    k1 = jnp.array([1.0, 2.0, 1.0])
    k = k1[:, None] * k1[None, :]
    k = k / jnp.sum(k)
    w_k = jnp.broadcast_to(k[:, :, None, None], (3, 3, 1, c)).astype(x.dtype)
    return lax.conv_general_dilated(
        up, w_k, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def apply_neural_renderer(
    p: Params, cfg: NeuralRendererConfig, x: jnp.ndarray
) -> jnp.ndarray:
    """x: [B, 16, 16, input_dim] -> [B, img_size, img_size, 3] in [0, 1]."""
    up_feat = _upsample_nn if cfg.upsample_feat == "nn" else _upsample_bilinear_blur
    up_rgb = _upsample_nn if cfg.upsample_rgb == "nn" else _upsample_bilinear_blur

    net = _conv(p["conv_in"], x) if "conv_in" in p else x
    rgb = None
    if cfg.use_rgb_skip:
        rgb = up_rgb(_conv(p["conv_rgb"][0], x, padding=1))
    for idx, layer in enumerate(p["conv_layers"]):
        net = jax.nn.leaky_relu(_conv(layer, up_feat(net), padding=1), 0.2)
        if cfg.use_rgb_skip:
            rgb = rgb + _conv(p["conv_rgb"][idx + 1], net, padding=1)
            if idx < len(p["conv_layers"]) - 1:
                rgb = up_rgb(rgb)
    if not cfg.use_rgb_skip:
        rgb = _conv(p["conv_rgb"], net, padding=1)
    if cfg.final_actvn:
        rgb = jax.nn.sigmoid(rgb)
    return rgb
