"""Exponential moving average of generator params.

Reference ``accumulate`` (``sdf_utils.py:70-75``) with decay
``0.5 ** (32/10000) ~= 0.99778`` (``training_utils.py:271``).  A pure
``tree_map`` so it fuses into the jitted train step.
"""

from __future__ import annotations

from typing import Any

import jax

EMA_DECAY = 0.5 ** (32.0 / 10000.0)


def accumulate(ema_params: Any, params: Any, decay: float = EMA_DECAY) -> Any:
    """``ema = decay * ema + (1 - decay) * params`` over the pytree."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )
