"""Parameter initializers matching the reference's PyTorch inits.

The framework represents models as pure ``init(key) -> params`` /
``apply(params, ...)`` function pairs over nested-dict pytrees — the
idiomatic JAX shape for a codebase whose losses need grad-of-grad
(R1 / eikonal / path-length) at arbitrary nesting.

Weight layout convention: linear kernels are ``[in, out]`` (JAX matmul
order), conv kernels are HWIO.  The reference stores torch ``[out, in]`` /
OIHW; the weight importer transposes.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp


def uniform(key: jax.Array, shape, bound: float) -> jnp.ndarray:
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound, dtype=jnp.float32)


def kaiming_leaky(key: jax.Array, shape, a: float = 0.2, gain_mul: float = 1.0) -> jnp.ndarray:
    """torch ``kaiming_normal_(a, fan_in, leaky_relu)`` for an [in, out] kernel."""
    fan_in = shape[0]
    gain = math.sqrt(2.0 / (1.0 + a * a))
    std = gain / math.sqrt(fan_in) * gain_mul
    return std * jax.random.normal(key, shape, dtype=jnp.float32)


def linear_params(
    key: jax.Array,
    in_dim: int,
    out_dim: int,
    *,
    mode: str = "kaiming",
    bias: bool = True,
) -> Dict[str, jnp.ndarray]:
    """SIREN-family LinearLayer params (reference ``sdf_model.py:23-41``).

    mode: 'first'   -> W ~ U(-1/in, 1/in)
          'freq'    -> W ~ U(-sqrt(6/in)/25, sqrt(6/in)/25)
          'kaiming' -> 0.25 * kaiming_normal(a=0.2)
    Bias is always U(-sqrt(1/in), sqrt(1/in)).
    """
    kw, kb = jax.random.split(key)
    if mode == "first":
        w = uniform(kw, (in_dim, out_dim), 1.0 / in_dim)
    elif mode == "freq":
        w = uniform(kw, (in_dim, out_dim), math.sqrt(6.0 / in_dim) / 25.0)
    elif mode == "kaiming":
        w = kaiming_leaky(kw, (in_dim, out_dim), gain_mul=0.25)
    else:
        raise ValueError(mode)
    p = {"w": w}
    if bias:
        p["b"] = uniform(kb, (out_dim,), math.sqrt(1.0 / in_dim))
    return p


def film_siren_weight(key: jax.Array, in_dim: int, out_dim: int, is_first: bool) -> jnp.ndarray:
    """FiLMSiren kernel init (reference ``sdf_model.py:50-53``)."""
    if is_first:
        return uniform(key, (in_dim, out_dim), 1.0 / 3.0)
    return uniform(key, (in_dim, out_dim), math.sqrt(6.0 / in_dim) / 25.0)


def mapping_linear_params(
    key: jax.Array, in_dim: int, out_dim: int, is_last: bool = False
) -> Dict[str, jnp.ndarray]:
    """MappingLinear params (reference ``sdf_model.py:437-450``)."""
    kw, kb = jax.random.split(key)
    std = 0.25 if is_last else 1.0
    return {
        "w": kaiming_leaky(kw, (in_dim, out_dim), gain_mul=std),
        "b": uniform(kb, (out_dim,), math.sqrt(1.0 / in_dim)),
    }
