"""Adversarial losses (reference ``im2scene/sdf/models/sdf_losses.py``).

Every grad-of-grad loss (R1, path-length) is expressed as ``jax.grad`` of a
closure; since the whole train step is differentiated once more by optax,
JAX composes the double backprop natively — no ``create_graph`` machinery.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """torch ``F.smooth_l1_loss`` (mean reduction)."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return jnp.mean(loss)


def viewpoints_loss(view_pred: jnp.ndarray, view_target: jnp.ndarray) -> jnp.ndarray:
    """Smooth-L1 between D's viewpoint head and the sampled camera angles
    (reference ``sdf_losses.py:7-10``)."""
    return smooth_l1(view_pred, view_target)


def d_logistic_loss(real_pred: jnp.ndarray, fake_pred: jnp.ndarray) -> jnp.ndarray:
    """Non-saturating logistic D loss (reference ``sdf_losses.py:27-31``)."""
    return jnp.mean(jax.nn.softplus(-real_pred)) + jnp.mean(jax.nn.softplus(fake_pred))


def g_nonsaturating_loss(fake_pred: jnp.ndarray) -> jnp.ndarray:
    """Non-saturating G loss (reference ``sdf_losses.py:43-46``)."""
    return jnp.mean(jax.nn.softplus(-fake_pred))


def g_content_loss(fake_img: jnp.ndarray, fake_img_up: jnp.ndarray) -> jnp.ndarray:
    """L1 between the full-res image and the 4x-upsampled thumb
    (reference ``sdf_losses.py:48-50``)."""
    return jnp.mean(jnp.abs(fake_img_up - fake_img))


def d_r1_loss(
    d_fn: Callable[[jnp.ndarray], jnp.ndarray], real_img: jnp.ndarray
) -> jnp.ndarray:
    """R1 gradient penalty (reference ``sdf_losses.py:34-40``).

    ``d_fn`` maps images -> logits; we differentiate ``sum(logits)`` w.r.t.
    the images and penalize the per-sample squared gradient norm.  The
    result is itself differentiable w.r.t. D's params (double backprop).
    """
    grad = jax.grad(lambda img: jnp.sum(d_fn(img)))(real_img)
    per_sample = jnp.sum(grad.reshape(grad.shape[0], -1) ** 2, axis=1)
    return jnp.mean(per_sample)


def d_logits_and_r1(
    d_fn: Callable[[jnp.ndarray], jnp.ndarray], real_img: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Real logits AND the R1 penalty from ONE discriminator forward.

    ``jax.vjp`` yields the primal logits alongside the pullback, so the D
    forward on real images is not repeated (the reference reuses
    ``real_pred`` the same way via ``autograd.grad``,
    ``training_utils.py:377-387``).  Differentiable w.r.t. D's params.
    """
    logits, pullback = jax.vjp(d_fn, real_img)
    (grad,) = pullback(jnp.ones_like(logits))
    per_sample = jnp.sum(grad.reshape(grad.shape[0], -1) ** 2, axis=1)
    return logits, jnp.mean(per_sample)


def g_path_regularize(
    img_fn: Callable[[jnp.ndarray], jnp.ndarray],
    latents: jnp.ndarray,
    mean_path_length: jnp.ndarray,
    key: jax.Array = None,
    decay: float = 0.01,
    noise: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """StyleGAN2 path-length regularizer (reference ``sdf_losses.py:53-65``).

    ``img_fn`` maps the [B, n_latent, D] decoder latents to images.
    ``noise`` overrides the internally-drawn projection noise (golden
    tests); otherwise it is drawn from ``key``.
    Returns (penalty, new_mean_path_length, path_lengths).
    """
    def proj(lat: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(img_fn(lat) * n)

    if noise is None:
        # shape only — eval_shape avoids paying an extra generator forward
        img_shape = jax.eval_shape(img_fn, latents).shape
        h, w = img_shape[1], img_shape[2]
        noise = jax.random.normal(key, img_shape) / math.sqrt(h * w)
    grad = jax.grad(proj)(latents, noise)
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(grad**2, axis=2), axis=1))
    path_mean = mean_path_length + decay * (jnp.mean(path_lengths) - mean_path_length)
    # the reference detaches the running mean inside the penalty
    # (``sdf_losses.py:63`` ``path_mean.detach()``) — without the stop_
    # gradient a -2*decay*(pl-pm)/B cross-term leaks into d penalty/d pl
    # (caught by tests/test_grad_golden.py)
    penalty = jnp.mean((path_lengths - jax.lax.stop_gradient(path_mean)) ** 2)
    return penalty, jax.lax.stop_gradient(path_mean), path_lengths
