"""gan2d trainer: same BCE + R1 loop as GIRAFFE without the encoder
(reference ``im2scene/gan2d/training.py``)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from ..giraffe.discriminator import DCDiscConfig, apply_dc_discriminator
from ..giraffe.trainer import compute_bce, compute_grad2
from .generator import Gan2dGeneratorConfig, apply_gan2d_generator

Params = Dict[str, Any]


@dataclass(frozen=True)
class Gan2dTrainHParams:
    batch_size: int = 32
    lr_g: float = 0.0005
    lr_d: float = 0.0001
    reg_param: float = 10.0
    ema_beta: float = 0.999


def make_gan2d_d_step(gcfg: Gan2dGeneratorConfig, dcfg: DCDiscConfig,
                      hp: Gan2dTrainHParams, d_tx: optax.GradientTransformation):
    def step(g_params, d_params, d_opt_state, key, x_real):
        z = jax.random.normal(key, (hp.batch_size, gcfg.z_dim))
        fake = jax.lax.stop_gradient(apply_gan2d_generator(g_params, gcfg, z))
        fake = fake * 0.5 + 0.5  # [0, 1] like the real batch

        def loss_fn(dp):
            d_fn = lambda img: apply_dc_discriminator(dp, dcfg, img)[0]
            loss_real = compute_bce(d_fn(x_real), 1.0)
            reg = hp.reg_param * compute_grad2(d_fn, x_real)
            loss_fake = compute_bce(d_fn(fake), 0.0)
            return loss_real + loss_fake + reg, {
                "discriminator": loss_real + loss_fake, "regularizer": reg,
            }

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(d_params)
        updates, d_opt_state = d_tx.update(grads, d_opt_state, d_params)
        return optax.apply_updates(d_params, updates), d_opt_state, metrics

    return step


def make_gan2d_g_step(gcfg: Gan2dGeneratorConfig, dcfg: DCDiscConfig,
                      hp: Gan2dTrainHParams, g_tx: optax.GradientTransformation):
    def step(g_params, d_params, g_opt_state, ema_params, key):
        z = jax.random.normal(key, (hp.batch_size, gcfg.z_dim))

        def loss_fn(gp):
            fake = apply_gan2d_generator(gp, gcfg, z) * 0.5 + 0.5
            d_fake, _ = apply_dc_discriminator(d_params, dcfg, fake)
            return compute_bce(d_fake, 1.0), {}

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(g_params)
        updates, g_opt_state = g_tx.update(grads, g_opt_state, g_params)
        g_params = optax.apply_updates(g_params, updates)
        ema_params = jax.tree_util.tree_map(
            lambda e, p: hp.ema_beta * e + (1 - hp.ema_beta) * p, ema_params, g_params
        )
        return g_params, g_opt_state, ema_params, {"generator": loss}

    return step
