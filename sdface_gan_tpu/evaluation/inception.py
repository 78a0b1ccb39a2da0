"""InceptionV3 (FID variant) in JAX.

Rebuild of the reference's pytorch-fid port (``im2scene/inception.py``):
the TF-parity InceptionV3 whose pool3 (2048-d) activations define FID.
The FID variant differs from stock InceptionV3 in its pooling layers
(avg-pool with ``count_include_pad=False`` inside InceptionA/C/E, and a
max-pool branch in the final InceptionE block) — both reproduced here.

Functional (params dict, NHWC); ``import_torch_state_dict`` maps a
pytorch-fid checkpoint (``pt_inception-2015-12-05``) onto the tree for
numerical parity with the reference's scorer.  Without weights the
architecture still runs (random init) so the FID *machinery* is testable.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, Any]

POOL3_DIM = 2048


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------

def _init_conv_bn(key, in_ch, out_ch, kh, kw) -> Params:
    fan_in = in_ch * kh * kw
    std = math.sqrt(2.0 / fan_in)
    return {
        "w": std * jax.random.normal(key, (kh, kw, in_ch, out_ch), dtype=jnp.float32),
        "bn_scale": jnp.ones((out_ch,)),
        "bn_bias": jnp.zeros((out_ch,)),
        "bn_mean": jnp.zeros((out_ch,)),
        "bn_var": jnp.ones((out_ch,)),
    }


def _conv_bn(p: Params, x: jnp.ndarray, stride=1, padding=(0, 0)) -> jnp.ndarray:
    """BasicConv2d: conv (no bias) + batchnorm(eps=1e-3) + relu."""
    out = lax.conv_general_dilated(
        x, p["w"], (stride, stride),
        ((padding[0], padding[0]), (padding[1], padding[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    inv = lax.rsqrt(p["bn_var"] + 1e-3)
    out = (out - p["bn_mean"]) * inv * p["bn_scale"] + p["bn_bias"]
    return jax.nn.relu(out)


def _max_pool(x, k=3, s=2, pad=0):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def _avg_pool_no_pad_count(x, k=3, s=1, pad=1):
    """avg_pool3x3 with ``count_include_pad=False`` (the FID fixup)."""
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = lax.reduce_window(
        ones, 0.0, lax.add, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return summed / counts


# ---------------------------------------------------------------------------
# Inception blocks
# ---------------------------------------------------------------------------

def _init_inception_a(key, in_ch, pool_features) -> Params:
    ks = jax.random.split(key, 7)
    return {
        "b1x1": _init_conv_bn(ks[0], in_ch, 64, 1, 1),
        "b5x5_1": _init_conv_bn(ks[1], in_ch, 48, 1, 1),
        "b5x5_2": _init_conv_bn(ks[2], 48, 64, 5, 5),
        "b3x3dbl_1": _init_conv_bn(ks[3], in_ch, 64, 1, 1),
        "b3x3dbl_2": _init_conv_bn(ks[4], 64, 96, 3, 3),
        "b3x3dbl_3": _init_conv_bn(ks[5], 96, 96, 3, 3),
        "bpool": _init_conv_bn(ks[6], in_ch, pool_features, 1, 1),
    }


def _inception_a(p, x):
    b1 = _conv_bn(p["b1x1"], x)
    b5 = _conv_bn(p["b5x5_2"], _conv_bn(p["b5x5_1"], x), padding=(2, 2))
    b3 = _conv_bn(p["b3x3dbl_1"], x)
    b3 = _conv_bn(p["b3x3dbl_2"], b3, padding=(1, 1))
    b3 = _conv_bn(p["b3x3dbl_3"], b3, padding=(1, 1))
    bp = _conv_bn(p["bpool"], _avg_pool_no_pad_count(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _init_inception_b(key, in_ch) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "b3x3": _init_conv_bn(ks[0], in_ch, 384, 3, 3),
        "b3x3dbl_1": _init_conv_bn(ks[1], in_ch, 64, 1, 1),
        "b3x3dbl_2": _init_conv_bn(ks[2], 64, 96, 3, 3),
        "b3x3dbl_3": _init_conv_bn(ks[3], 96, 96, 3, 3),
    }


def _inception_b(p, x):
    b3 = _conv_bn(p["b3x3"], x, stride=2)
    bd = _conv_bn(p["b3x3dbl_1"], x)
    bd = _conv_bn(p["b3x3dbl_2"], bd, padding=(1, 1))
    bd = _conv_bn(p["b3x3dbl_3"], bd, stride=2)
    return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)


def _init_inception_c(key, in_ch, c7) -> Params:
    ks = jax.random.split(key, 10)
    return {
        "b1x1": _init_conv_bn(ks[0], in_ch, 192, 1, 1),
        "b7_1": _init_conv_bn(ks[1], in_ch, c7, 1, 1),
        "b7_2": _init_conv_bn(ks[2], c7, c7, 1, 7),
        "b7_3": _init_conv_bn(ks[3], c7, 192, 7, 1),
        "b7d_1": _init_conv_bn(ks[4], in_ch, c7, 1, 1),
        "b7d_2": _init_conv_bn(ks[5], c7, c7, 7, 1),
        "b7d_3": _init_conv_bn(ks[6], c7, c7, 1, 7),
        "b7d_4": _init_conv_bn(ks[7], c7, c7, 7, 1),
        "b7d_5": _init_conv_bn(ks[8], c7, 192, 1, 7),
        "bpool": _init_conv_bn(ks[9], in_ch, 192, 1, 1),
    }


def _inception_c(p, x):
    b1 = _conv_bn(p["b1x1"], x)
    b7 = _conv_bn(p["b7_1"], x)
    b7 = _conv_bn(p["b7_2"], b7, padding=(0, 3))
    b7 = _conv_bn(p["b7_3"], b7, padding=(3, 0))
    bd = _conv_bn(p["b7d_1"], x)
    bd = _conv_bn(p["b7d_2"], bd, padding=(3, 0))
    bd = _conv_bn(p["b7d_3"], bd, padding=(0, 3))
    bd = _conv_bn(p["b7d_4"], bd, padding=(3, 0))
    bd = _conv_bn(p["b7d_5"], bd, padding=(0, 3))
    bp = _conv_bn(p["bpool"], _avg_pool_no_pad_count(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _init_inception_d(key, in_ch) -> Params:
    ks = jax.random.split(key, 6)
    return {
        "b3_1": _init_conv_bn(ks[0], in_ch, 192, 1, 1),
        "b3_2": _init_conv_bn(ks[1], 192, 320, 3, 3),
        "b7_1": _init_conv_bn(ks[2], in_ch, 192, 1, 1),
        "b7_2": _init_conv_bn(ks[3], 192, 192, 1, 7),
        "b7_3": _init_conv_bn(ks[4], 192, 192, 7, 1),
        "b7_4": _init_conv_bn(ks[5], 192, 192, 3, 3),
    }


def _inception_d(p, x):
    b3 = _conv_bn(p["b3_2"], _conv_bn(p["b3_1"], x), stride=2)
    b7 = _conv_bn(p["b7_1"], x)
    b7 = _conv_bn(p["b7_2"], b7, padding=(0, 3))
    b7 = _conv_bn(p["b7_3"], b7, padding=(3, 0))
    b7 = _conv_bn(p["b7_4"], b7, stride=2)
    return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)


def _init_inception_e(key, in_ch) -> Params:
    ks = jax.random.split(key, 9)
    return {
        "b1x1": _init_conv_bn(ks[0], in_ch, 320, 1, 1),
        "b3_1": _init_conv_bn(ks[1], in_ch, 384, 1, 1),
        "b3_2a": _init_conv_bn(ks[2], 384, 384, 1, 3),
        "b3_2b": _init_conv_bn(ks[3], 384, 384, 3, 1),
        "b3d_1": _init_conv_bn(ks[4], in_ch, 448, 1, 1),
        "b3d_2": _init_conv_bn(ks[5], 448, 384, 3, 3),
        "b3d_3a": _init_conv_bn(ks[6], 384, 384, 1, 3),
        "b3d_3b": _init_conv_bn(ks[7], 384, 384, 3, 1),
        "bpool": _init_conv_bn(ks[8], in_ch, 192, 1, 1),
    }


def _inception_e(p, x, use_max_pool: bool):
    b1 = _conv_bn(p["b1x1"], x)
    b3 = _conv_bn(p["b3_1"], x)
    b3 = jnp.concatenate(
        [_conv_bn(p["b3_2a"], b3, padding=(0, 1)), _conv_bn(p["b3_2b"], b3, padding=(1, 0))],
        axis=-1,
    )
    bd = _conv_bn(p["b3d_1"], x)
    bd = _conv_bn(p["b3d_2"], bd, padding=(1, 1))
    bd = jnp.concatenate(
        [_conv_bn(p["b3d_3a"], bd, padding=(0, 1)), _conv_bn(p["b3d_3b"], bd, padding=(1, 0))],
        axis=-1,
    )
    if use_max_pool:
        # FIDInceptionE_2: max-pool pooling branch (pytorch-fid parity)
        bp = _max_pool(x, k=3, s=1, pad=1)
    else:
        bp = _avg_pool_no_pad_count(x)
    bp = _conv_bn(p["bpool"], bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# ---------------------------------------------------------------------------
# Full network
# ---------------------------------------------------------------------------

def init_inception(key: jax.Array) -> Params:
    ks = jax.random.split(key, 20)
    return {
        "Conv2d_1a_3x3": _init_conv_bn(ks[0], 3, 32, 3, 3),
        "Conv2d_2a_3x3": _init_conv_bn(ks[1], 32, 32, 3, 3),
        "Conv2d_2b_3x3": _init_conv_bn(ks[2], 32, 64, 3, 3),
        "Conv2d_3b_1x1": _init_conv_bn(ks[3], 64, 80, 1, 1),
        "Conv2d_4a_3x3": _init_conv_bn(ks[4], 80, 192, 3, 3),
        "Mixed_5b": _init_inception_a(ks[5], 192, 32),
        "Mixed_5c": _init_inception_a(ks[6], 256, 64),
        "Mixed_5d": _init_inception_a(ks[7], 288, 64),
        "Mixed_6a": _init_inception_b(ks[8], 288),
        "Mixed_6b": _init_inception_c(ks[9], 768, 128),
        "Mixed_6c": _init_inception_c(ks[10], 768, 160),
        "Mixed_6d": _init_inception_c(ks[11], 768, 160),
        "Mixed_6e": _init_inception_c(ks[12], 768, 192),
        "Mixed_7a": _init_inception_d(ks[13], 768),
        "Mixed_7b": _init_inception_e(ks[14], 1280),
        "Mixed_7c": _init_inception_e(ks[15], 2048),
    }


def _resize_bilinear(x: jnp.ndarray, size: int) -> jnp.ndarray:
    return jax.image.resize(
        x, (x.shape[0], size, size, x.shape[3]), method="bilinear"
    )


def inception_pool3(
    params: Params, images: jnp.ndarray, resize_input: bool = True
) -> jnp.ndarray:
    """pool3 activations [B, 2048] of images in [-1, 1] (NHWC).

    Matches the reference pipeline (``inception.py:120-160``): bilinear
    resize to 299, stem convs, inception tower, global average pool.
    """
    x = images
    if resize_input:
        x = _resize_bilinear(x, 299)
    x = _conv_bn(params["Conv2d_1a_3x3"], x, stride=2)
    x = _conv_bn(params["Conv2d_2a_3x3"], x)
    x = _conv_bn(params["Conv2d_2b_3x3"], x, padding=(1, 1))
    x = _max_pool(x)
    x = _conv_bn(params["Conv2d_3b_1x1"], x)
    x = _conv_bn(params["Conv2d_4a_3x3"], x)
    x = _max_pool(x)
    x = _inception_a(params["Mixed_5b"], x)
    x = _inception_a(params["Mixed_5c"], x)
    x = _inception_a(params["Mixed_5d"], x)
    x = _inception_b(params["Mixed_6a"], x)
    x = _inception_c(params["Mixed_6b"], x)
    x = _inception_c(params["Mixed_6c"], x)
    x = _inception_c(params["Mixed_6d"], x)
    x = _inception_c(params["Mixed_6e"], x)
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x, use_max_pool=False)
    x = _inception_e(params["Mixed_7c"], x, use_max_pool=True)
    return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# Torch weight import (pytorch-fid checkpoint -> this tree)
# ---------------------------------------------------------------------------

_BLOCK_BRANCHES = {
    "a": {
        "b1x1": ["branch1x1"],
        "b5x5_1": ["branch5x5_1"], "b5x5_2": ["branch5x5_2"],
        "b3x3dbl_1": ["branch3x3dbl_1"], "b3x3dbl_2": ["branch3x3dbl_2"],
        "b3x3dbl_3": ["branch3x3dbl_3"], "bpool": ["branch_pool"],
    },
    "b": {
        "b3x3": ["branch3x3"],
        "b3x3dbl_1": ["branch3x3dbl_1"], "b3x3dbl_2": ["branch3x3dbl_2"],
        "b3x3dbl_3": ["branch3x3dbl_3"],
    },
    "c": {
        "b1x1": ["branch1x1"],
        "b7_1": ["branch7x7_1"], "b7_2": ["branch7x7_2"], "b7_3": ["branch7x7_3"],
        "b7d_1": ["branch7x7dbl_1"], "b7d_2": ["branch7x7dbl_2"],
        "b7d_3": ["branch7x7dbl_3"], "b7d_4": ["branch7x7dbl_4"],
        "b7d_5": ["branch7x7dbl_5"], "bpool": ["branch_pool"],
    },
    "d": {
        "b3_1": ["branch3x3_1"], "b3_2": ["branch3x3_2"],
        "b7_1": ["branch7x7x3_1"], "b7_2": ["branch7x7x3_2"],
        "b7_3": ["branch7x7x3_3"], "b7_4": ["branch7x7x3_4"],
    },
    "e": {
        "b1x1": ["branch1x1"],
        "b3_1": ["branch3x3_1"], "b3_2a": ["branch3x3_2a"], "b3_2b": ["branch3x3_2b"],
        "b3d_1": ["branch3x3dbl_1"], "b3d_2": ["branch3x3dbl_2"],
        "b3d_3a": ["branch3x3dbl_3a"], "b3d_3b": ["branch3x3dbl_3b"],
        "bpool": ["branch_pool"],
    },
}

_BLOCK_KIND = {
    "Mixed_5b": "a", "Mixed_5c": "a", "Mixed_5d": "a",
    "Mixed_6a": "b",
    "Mixed_6b": "c", "Mixed_6c": "c", "Mixed_6d": "c", "Mixed_6e": "c",
    "Mixed_7a": "d", "Mixed_7b": "e", "Mixed_7c": "e",
}


def import_torch_state_dict(state: Dict[str, np.ndarray]) -> Params:
    """Map a pytorch-fid InceptionV3 ``state_dict`` (numpy-converted) onto
    the JAX parameter tree.  Torch convs are OIHW -> HWIO."""

    def conv_bn(prefix: str) -> Params:
        w = np.asarray(state[f"{prefix}.conv.weight"])
        return {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bn_scale": jnp.asarray(state[f"{prefix}.bn.weight"]),
            "bn_bias": jnp.asarray(state[f"{prefix}.bn.bias"]),
            "bn_mean": jnp.asarray(state[f"{prefix}.bn.running_mean"]),
            "bn_var": jnp.asarray(state[f"{prefix}.bn.running_var"]),
        }

    params: Params = {}
    for stem in (
        "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
        "Conv2d_3b_1x1", "Conv2d_4a_3x3",
    ):
        params[stem] = conv_bn(stem)
    for block, kind in _BLOCK_KIND.items():
        sub: Params = {}
        for ours, (theirs,) in _BLOCK_BRANCHES[kind].items():
            sub[ours] = conv_bn(f"{block}.{theirs}")
        params[block] = sub
    return params


def load_inception(weights_path: Optional[str] = None, key: Optional[jax.Array] = None) -> Params:
    """Load FID inception params from a torch checkpoint path, or random
    init when no weights are available (machinery testing only)."""
    if weights_path is not None:
        import torch

        state = torch.load(weights_path, map_location="cpu", weights_only=False)
        if hasattr(state, "state_dict"):
            state = state.state_dict()
        state = {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}
        return import_torch_state_dict(state)
    return init_inception(key if key is not None else jax.random.PRNGKey(0))
