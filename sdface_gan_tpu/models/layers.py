"""Shared small layers (reference ``im2scene/layers.py``).

``ResnetBlockFC`` — the fully-connected residual block used by
occupancy-style decoders; the conv ``ResnetBlock`` lives in
:mod:`sdface_gan_tpu.giraffe.discriminator` (``_init_resnet_block``), and
the kornia-style ``Blur`` in :mod:`sdface_gan_tpu.giraffe.neural_renderer`.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .init import uniform

Params = Dict[str, Any]


def init_resnet_block_fc(
    key: jax.Array, size_in: int, size_out: Optional[int] = None,
    size_h: Optional[int] = None,
) -> Params:
    """ResnetBlockFC (reference ``layers.py:8-50``): fc->relu->fc residual
    with a zero-initialized second layer and a biasless shortcut when
    dimensions change."""
    size_out = size_out or size_in
    size_h = size_h or min(size_in, size_out)
    k0, k1, k2 = jax.random.split(key, 3)
    b0 = 1.0 / math.sqrt(size_in)
    bh = 1.0 / math.sqrt(size_h)
    p: Params = {
        "fc_0": {"w": uniform(k0, (size_in, size_h), b0), "b": uniform(k0, (size_h,), b0)},
        "fc_1": {"w": jnp.zeros((size_h, size_out)), "b": uniform(k1, (size_out,), bh)},
    }
    if size_in != size_out:
        p["shortcut"] = {"w": uniform(k2, (size_in, size_out), b0)}
    return p


def apply_resnet_block_fc(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.relu(x) @ p["fc_0"]["w"] + p["fc_0"]["b"]
    dx = jax.nn.relu(h) @ p["fc_1"]["w"] + p["fc_1"]["b"]
    xs = x @ p["shortcut"]["w"] if "shortcut" in p else x
    return xs + dx
