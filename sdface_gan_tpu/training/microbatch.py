"""Gradient accumulation / microbatching.

The reference fits an 11 GB GPU by looping ``chunk``-sized microbatches
with ``.backward()`` per chunk before one optimizer step
(``training_utils.py:365-375,682-709``).  The TPU-native equivalent is a
``lax.scan`` over microbatches inside ONE jitted step — gradients
accumulate in registers/HBM with no host round-trips, and the optimizer
update runs once at the end.  Use when a memory envelope requires a
smaller per-device activation batch than the optimization batch.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp


def accumulate_gradients(
    loss_fn: Callable[..., Tuple[jnp.ndarray, Any]],
    params: Any,
    batch: Any,
    n_chunks: int,
) -> Tuple[Any, jnp.ndarray, Any]:
    """Mean gradients of ``loss_fn(params, chunk)`` over ``n_chunks``
    microbatches split along the leading axis of every array in ``batch``.

    ``loss_fn`` must return ``(loss, aux)``.  Returns
    ``(grads, mean_loss, last_aux)``.
    """
    def reshape(x):
        return x.reshape((n_chunks, x.shape[0] // n_chunks) + x.shape[1:])

    chunked = jax.tree_util.tree_map(reshape, batch)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def body(carry, chunk):
        acc, loss_acc = carry
        (loss, aux), grads = grad_fn(params, chunk)
        acc = jax.tree_util.tree_map(lambda a, g: a + g, acc, grads)
        return (acc, loss_acc + loss), aux

    zero = jax.tree_util.tree_map(jnp.zeros_like, params)
    (acc, loss_sum), auxes = jax.lax.scan(body, (zero, jnp.zeros(())), chunked)
    grads = jax.tree_util.tree_map(lambda g: g / n_chunks, acc)
    last_aux = jax.tree_util.tree_map(lambda x: x[-1], auxes)
    return grads, loss_sum / n_chunks, last_aux
