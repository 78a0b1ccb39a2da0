"""GIRAFFE trainer: BCE GAN steps with R1, EMA, eval + visualization.

JAX rebuild of ``im2scene/giraffe/training.py`` + the shared GAN utils of
``im2scene/training.py`` (``toggle_grad``/``compute_grad2``/
``update_average``/``compute_bce``): a jitted D step (BCE(real,1) +
BCE(fake,0) + 10 * R1) and G step (BCE(fake,1)), RMSprop optimizers
(``config.py:178-233``), EMA with beta=0.999.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from .discriminator import DCDiscConfig, apply_dc_discriminator
from .generator import GiraffeConfig, giraffe_forward

Params = Dict[str, Any]


def compute_bce(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    """Binary cross entropy with constant targets (reference
    ``training.py:64-74``)."""
    labels = jnp.full_like(logits, target)
    return jnp.mean(
        optax.sigmoid_binary_cross_entropy(logits, labels)
    )


def compute_grad2(d_fn, x: jnp.ndarray) -> jnp.ndarray:
    """R1 penalty: per-sample squared grad norm of D at x (reference
    ``training.py:49-61``)."""
    grad = jax.grad(lambda img: jnp.sum(d_fn(img)))(x)
    return jnp.mean(jnp.sum(grad.reshape(grad.shape[0], -1) ** 2, axis=1))


@dataclass(frozen=True)
class GiraffeTrainHParams:
    batch_size: int = 32
    lr_g: float = 0.0005
    lr_d: float = 0.0001
    reg_param: float = 10.0
    ema_beta: float = 0.999
    optimizer: str = "RMSprop"


def giraffe_optimizers(
    hp: GiraffeTrainHParams,
) -> Tuple[optax.GradientTransformation, optax.GradientTransformation]:
    """RMSprop (torch defaults: alpha 0.99, eps 1e-8) or Adam, per config
    (reference ``config.py:178-200``)."""
    if hp.optimizer.lower() == "rmsprop":
        make = lambda lr: optax.rmsprop(lr, decay=0.99, eps=1e-8)
    else:
        make = lambda lr: optax.adam(lr)
    return make(hp.lr_g), make(hp.lr_d)


def make_giraffe_d_step(
    gcfg: GiraffeConfig,
    dcfg: DCDiscConfig,
    hp: GiraffeTrainHParams,
    d_tx: optax.GradientTransformation,
):
    """Reference ``train_step_discriminator`` (``giraffe/training.py:266-323``)."""

    def step(g_params, d_params, d_opt_state, key, x_real):
        fake = jax.lax.stop_gradient(
            giraffe_forward(g_params, gcfg, key=key, batch_size=hp.batch_size)
        )

        def loss_fn(dp):
            d_fn = lambda img: apply_dc_discriminator(dp, dcfg, img)[0]
            d_real = d_fn(x_real)
            loss_real = compute_bce(d_real, 1.0)
            reg = hp.reg_param * compute_grad2(d_fn, x_real)
            d_fake = d_fn(fake)
            loss_fake = compute_bce(d_fake, 0.0)
            loss = loss_real + loss_fake + reg
            return loss, {
                "discriminator": loss_real + loss_fake,
                "regularizer": reg,
            }

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(d_params)
        updates, d_opt_state = d_tx.update(grads, d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, updates)
        return d_params, d_opt_state, metrics

    return step


def make_giraffe_encoder_step(
    gcfg: GiraffeConfig,
    dcfg: DCDiscConfig,
    hp: GiraffeTrainHParams,
    e_tx: optax.GradientTransformation,
):
    """VAE-encoder step (reference ``train_step_encoder``,
    ``giraffe/training.py:144-191``): encode real images -> reparameterized
    z -> generator; loss = sum KL + sum 0.5*(D_feat(real) - D_feat(fake))^2
    (discriminator feature matching)."""
    from ..encoder import VAEEncoderConfig, apply_vae_encoder, reparameterize

    ecfg = VAEEncoderConfig(
        img_size=dcfg.img_size, z_size=2 * gcfg.z_dim
    )  # encoder emits [z_shape | z_app] (reference generator.py:101-106)

    def step(e_params, g_params, d_params, e_opt_state, key, x_real):
        def loss_fn(ep):
            kz, kg = jax.random.split(key)
            mu, logvar = apply_vae_encoder(ep, ecfg, x_real)
            z = reparameterize(kz, mu, logvar)
            codes_rand = jax.random.split(kg, 1)[0]
            from .generator import sample_latent_codes

            base = sample_latent_codes(codes_rand, gcfg, x_real.shape[0])
            codes = base._replace(
                z_shape_obj=z[:, None, : gcfg.z_dim],
                z_app_obj=z[:, None, gcfg.z_dim :],
            )
            x_fake = giraffe_forward(
                g_params, gcfg, key=kg, latent_codes=codes, mode="training"
            )
            _, feat_fake = apply_dc_discriminator(d_params, dcfg, x_fake)
            _, feat_real = apply_dc_discriminator(d_params, dcfg, x_real)
            kl = -0.5 * jnp.sum(-jnp.exp(logvar) - mu**2 + logvar + 1.0, axis=1)
            mse = jnp.sum(0.5 * (feat_real - feat_fake) ** 2, axis=1)
            loss = jnp.sum(kl) + jnp.sum(mse)
            return loss, {"encoder": loss, "e_kl": jnp.sum(kl)}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(e_params)
        updates, e_opt_state = e_tx.update(grads, e_opt_state, e_params)
        e_params = optax.apply_updates(e_params, updates)
        return e_params, e_opt_state, metrics

    return step


def make_giraffe_g_step(
    gcfg: GiraffeConfig,
    dcfg: DCDiscConfig,
    hp: GiraffeTrainHParams,
    g_tx: optax.GradientTransformation,
):
    """Reference ``train_step_generator`` (``giraffe/training.py:194-242``),
    including the EMA ``update_average`` with beta=0.999."""

    def step(g_params, d_params, g_opt_state, ema_params, key):
        def loss_fn(gp):
            fake = giraffe_forward(gp, gcfg, key=key, batch_size=hp.batch_size)
            d_fake, _ = apply_dc_discriminator(d_params, dcfg, fake)
            loss = compute_bce(d_fake, 1.0)
            return loss, {"generator": loss}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(g_params)
        updates, g_opt_state = g_tx.update(grads, g_opt_state, g_params)
        g_params = optax.apply_updates(g_params, updates)
        ema_params = jax.tree_util.tree_map(
            lambda e, p: hp.ema_beta * e + (1.0 - hp.ema_beta) * p, ema_params, g_params
        )
        return g_params, g_opt_state, ema_params, metrics

    return step
