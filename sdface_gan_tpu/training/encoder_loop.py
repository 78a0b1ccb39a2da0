"""Stage C: inversion-encoder training.

Rebuild of the reference ``train_encoder`` (``training_utils.py:884-1172``):
load the frozen ``full_pipeline`` generator, train a VAE encoder (``--vae``)
or pSp encoder (``--psp``) to invert real images into the latent space.
Loss = 0.5 * L(thumbs) + 0.5 * L(full) with the ``LossUtils`` bundle
(ID 0.1 + L2 1.0 + LPIPS 0.8; perceptual terms activate when their
pretrained weights are provided) + KL for the VAE path.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config.build import generator_config
from ..config.sdf_options import get_vol_render_opt
from ..data import DataLoader, MultiResolutionDataset
from ..encoder import (
    LossUtils,
    VAEEncoderConfig,
    apply_vae_encoder,
    init_vae_encoder,
    reparameterize,
)
from ..encoder.vae import kl_divergence
from ..models.generator import generator_forward, init_generator
from ..utils.checkpoints import load_checkpoint, save_checkpoint
from ..utils.logging import MetricsLogger
from .optim import encoder_optimizer


def make_encoder_step(gcfg, ecfg: VAEEncoderConfig, tx, loss_utils: LossUtils,
                      kl_weight: float = 0.005):
    res = gcfg.renderer.out_im_res

    def step(e_params, g_params, e_opt_state, key, real_imgs, real_thumbs,
             cam_extrinsics, focal, near, far):
        def loss_fn(ep):
            kz, kr = jax.random.split(key)
            mu, logvar = apply_vae_encoder(ep, ecfg, real_imgs)
            z = reparameterize(kz, mu, logvar)
            out = generator_forward(
                g_params, gcfg, [z], cam_extrinsics, focal, near, far, key=kr,
            )
            thumb_losses = loss_utils(out.thumb_rgb, real_thumbs)
            full_losses = loss_utils(out.rgb, real_imgs)
            kl = kl_divergence(mu, logvar)
            loss = 0.5 * thumb_losses["loss"] + 0.5 * full_losses["loss"] + kl_weight * kl
            return loss, {"e_loss": loss, "e_kl": kl,
                          "e_l2_thumb": thumb_losses["l2"],
                          "e_l2_full": full_losses["l2"]}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(e_params)
        updates, e_opt_state = tx.update(grads, e_opt_state, e_params)
        e_params = optax.apply_updates(e_params, updates)
        return e_params, e_opt_state, metrics

    return step


def train_encoder_stage(args: Any, cfg: Any, out_base: str,
                        iters: int = 100000, log_every: int = 100,
                        save_every: int = 10000) -> None:
    from ..geometry.cameras import generate_camera_params

    expname = cfg["training"]["out_dir"].split("/")[1]
    img_size = cfg["data"].get("img_size", 256)
    opt = get_vol_render_opt(expname, False, ngp=bool(getattr(args, "ngp", 0)),
                             fc=bool(getattr(args, "fc", 0)), size=img_size,
                             batch=getattr(args, "batch", 8))
    gcfg = generator_config(opt, stage_a=False)

    template = init_generator(jax.random.PRNGKey(0), gcfg)
    ck = load_checkpoint(out_base, "full_pipeline", {"g_ema": template})
    g_ema = ck["g_ema"]

    ecfg = VAEEncoderConfig(img_size=img_size, z_size=gcfg.style_dim)
    key = jax.random.PRNGKey(getattr(args, "seed", 0))
    e_params = init_vae_encoder(key, ecfg)
    tx = encoder_optimizer(vae=bool(getattr(args, "vae", 1)))
    e_state = tx.init(e_params)

    enc_dir = os.path.join(out_base, "encoder")
    os.makedirs(enc_dir, exist_ok=True)
    logger = MetricsLogger(enc_dir, "encoder", print_every=log_every)

    data_path = getattr(args, "dataset_path", None) or os.path.dirname(cfg["data"]["path"])
    ds = MultiResolutionDataset(data_path, resolution=img_size,
                                nerf_resolution=gcfg.renderer.out_im_res)
    loader = iter(DataLoader(ds, batch_size=getattr(args, "batch", 8),
                             host_id=jax.process_index(),
                             num_hosts=jax.process_count()))

    loss_utils = LossUtils()  # perceptual weights attach when provided
    # Same mesh treatment as stages A/B (training/loop.py): the global
    # batch is sharded over the mesh and GSPMD reduces the gradients, so
    # multi-host runs stay replica-consistent with the host-sliced loader.
    from ..parallel import data_parallel_jit, shard_batch
    from .loop import _training_mesh
    from .steps import TrainHParams as _HP

    mesh = _training_mesh(_HP(batch=getattr(args, "batch", 8)))
    step = data_parallel_jit(
        make_encoder_step(gcfg, ecfg, tx, loss_utils), mesh,
        batch_argnums=(4, 5),
    )
    res = gcfg.renderer.out_im_res

    for i in range(iters):
        imgs, thumbs = next(loader)
        key, kc, ks = jax.random.split(key, 3)
        cams = generate_camera_params(res, kc, batch=getattr(args, "batch", 8))
        e_params, e_state, m = step(
            e_params, g_ema, e_state, ks,
            shard_batch(np.asarray(imgs), mesh),
            shard_batch(np.asarray(thumbs), mesh),
            cams.extrinsics, cams.focal, cams.near, cams.far,
        )
        if i % log_every == 0:
            logger.log(i, m)
        if save_every and i and i % save_every == 0:
            save_checkpoint(enc_dir, f"models_{i:07d}", {"e": e_params})
    save_checkpoint(enc_dir, "encoder", {"e": e_params})
    logger.close()
