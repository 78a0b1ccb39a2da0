"""gan2d training driver (reference ``gan2d/training.py`` + the shared
``train_giraffe`` loop shape): BCE + R1 loop with checkpoint/visualize
cadences."""

from __future__ import annotations

import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.images import ImagesDataset, ImagesLoader
from ..giraffe.discriminator import DCDiscConfig, init_dc_discriminator
from ..utils.checkpoints import CheckpointIO
from ..utils.images import save_image_grid
from ..utils.logging import MetricsLogger
from .generator import Gan2dGeneratorConfig, apply_gan2d_generator, init_gan2d_generator
from .trainer import Gan2dTrainHParams, make_gan2d_d_step, make_gan2d_g_step


def train_gan2d(args: Any, cfg: Any) -> None:
    tr = cfg["training"]
    img_size = cfg["data"].get("img_size", 64)
    gcfg = Gan2dGeneratorConfig(z_dim=cfg.get("model", {}).get("z_dim", 256),
                                size=img_size)
    dcfg = DCDiscConfig(img_size=img_size)
    hp = Gan2dTrainHParams(
        batch_size=tr.get("batch_size", 32),
        lr_g=tr.get("learning_rate", 0.0005),
        lr_d=tr.get("learning_rate_d", 0.0001),
    )
    out_dir = tr.get("out_dir", "out/gan2d")
    os.makedirs(out_dir, exist_ok=True)
    logger = MetricsLogger(out_dir, "gan2d", print_every=tr.get("print_every", 10))

    dataset = ImagesDataset(
        cfg["data"]["path"], size=img_size,
        celebA_center_crop=cfg["data"].get("celebA_center_crop", False),
        random_crop=cfg["data"].get("random_crop", False),
        use_tanh_range=cfg["data"].get("use_tanh_range", False),
    )
    loader = iter(ImagesLoader(dataset, hp.batch_size, seed=getattr(args, "seed", 0)))

    key = jax.random.PRNGKey(getattr(args, "seed", 0))
    kg, kd = jax.random.split(key)
    g = init_gan2d_generator(kg, gcfg)
    d = init_dc_discriminator(kd, dcfg)
    g_ema = jax.tree_util.tree_map(jnp.copy, g)
    make = lambda lr: optax.rmsprop(lr, decay=0.99, eps=1e-8)
    g_tx, d_tx = make(hp.lr_g), make(hp.lr_d)
    g_state, d_state = g_tx.init(g), d_tx.init(d)

    ckpt = CheckpointIO(out_dir)
    it = 0
    if ckpt.exists("model"):
        state = ckpt.load("model", {"g": g, "d": d, "g_ema": g_ema,
                                    "g_opt": g_state, "d_opt": d_state, "it": 0})
        g, d, g_ema = state["g"], state["d"], state["g_ema"]
        g_state, d_state = state["g_opt"], state["d_opt"]
        it = int(state["it"])

    d_step = jax.jit(make_gan2d_d_step(gcfg, dcfg, hp, d_tx))
    g_step = jax.jit(make_gan2d_g_step(gcfg, dcfg, hp, g_tx))

    max_it = tr.get("max_it", 1000000)
    exit_after = getattr(args, "exit_after", -1)
    t0 = time.time()
    while it < max_it:
        it += 1
        x_real = jnp.asarray(next(loader))
        key, k1, k2 = jax.random.split(key, 3)
        d, d_state, dm = d_step(g, d, d_state, k1, x_real)
        g, g_state, g_ema, gm = g_step(g, d, g_state, g_ema, k2)
        if it % tr.get("print_every", 10) == 0:
            logger.log(it, {**dm, **gm})
        if it % tr.get("visualize_every", 1000) == 0:
            z = jax.random.normal(jax.random.PRNGKey(42), (16, gcfg.z_dim))
            imgs = apply_gan2d_generator(g_ema, gcfg, z)
            save_image_grid(np.asarray(imgs), os.path.join(out_dir, f"vis_{it:07d}.png"), nrow=4)
        if it % tr.get("checkpoint_every", 500) == 0:
            ckpt.save("model", g=g, d=d, g_ema=g_ema, g_opt=g_state,
                      d_opt=d_state, it=it)
        if exit_after and exit_after > 0 and time.time() - t0 > exit_after:
            ckpt.save("model", g=g, d=d, g_ema=g_ema, g_opt=g_state,
                      d_opt=d_state, it=it)
            raise SystemExit(3)
