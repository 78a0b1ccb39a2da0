"""LPIPS perceptual loss (AlexNet features).

Rebuild of ``im2scene/encoder/lpips/``: AlexNet conv features at 5 stages,
channel-unit-normalized, squared-difference, 1x1 linear weighting, spatial
mean, summed across stages.  ``import_lpips_state`` maps the torch
pretrained weights (AlexNet features + LPIPS lin layers) onto the tree;
random init keeps the machinery testable offline.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.discriminator import _conv, _torch_conv

Params = Dict[str, Any]

# AlexNet feature config: (out_ch, kernel, stride, pad), with maxpools after
# stages 0 and 1 and before stage 2's convs per torchvision layout.
ALEX_STAGES = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
# ImageNet normalization applied from [-1,1] inputs (LPIPS 'scaling layer')
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


@dataclass(frozen=True)
class LPIPSConfig:
    pass


def init_lpips(key: jax.Array, cfg: LPIPSConfig = LPIPSConfig()) -> Params:
    keys = jax.random.split(key, 10)
    convs = []
    in_ch = 3
    for i, (out_ch, k, s, p) in enumerate(ALEX_STAGES):
        convs.append(_torch_conv(keys[i], in_ch, out_ch, k))
        in_ch = out_ch
    lins = [
        _torch_conv(keys[5 + i], ALEX_STAGES[i][0], 1, 1, bias=False)
        for i in range(5)
    ]
    return {"convs": convs, "lins": lins}


def _max_pool_3_2(x: jnp.ndarray) -> jnp.ndarray:
    from jax import lax

    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _alex_features(p: Params, x: jnp.ndarray) -> List[jnp.ndarray]:
    x = (x - _SHIFT) / _SCALE
    feats = []
    for i, (out_ch, k, s, pad) in enumerate(ALEX_STAGES):
        x = jax.nn.relu(_conv(p["convs"][i], x, stride=s, padding=pad))
        feats.append(x)
        if i in (0, 1):
            x = _max_pool_3_2(x)
    return feats


def _unit_norm(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True) + 1e-10)


def apply_lpips(p: Params, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Perceptual distance between [B, H, W, 3] images in [-1, 1]."""
    fx = _alex_features(p, x)
    fy = _alex_features(p, y)
    total = jnp.zeros(())
    for i in range(len(fx)):
        d = (_unit_norm(fx[i]) - _unit_norm(fy[i])) ** 2
        w = jnp.maximum(p["lins"][i]["w"], 0.0)  # LPIPS lins are non-negative
        weighted = jnp.einsum("bhwc,klco->bhwo", d, w)
        total = total + jnp.mean(weighted)
    return total


def import_lpips_state(
    alex_state: Dict[str, np.ndarray], lin_state: Dict[str, np.ndarray], params: Params
) -> Params:
    """Map torchvision AlexNet ``features.*`` + LPIPS ``lin*.model.1.weight``
    onto the tree (OIHW -> HWIO)."""
    out = jax.tree_util.tree_map(lambda x: x, params)
    conv_ids = [0, 3, 6, 8, 10]
    for i, cid in enumerate(conv_ids):
        w = np.asarray(alex_state[f"features.{cid}.weight"])
        out["convs"][i]["w"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
        out["convs"][i]["b"] = jnp.asarray(alex_state[f"features.{cid}.bias"])
    for i in range(5):
        w = np.asarray(lin_state[f"lin{i}.model.1.weight"])
        out["lins"][i]["w"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    return out
