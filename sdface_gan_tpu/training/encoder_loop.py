"""Stage C: inversion-encoder training.

Rebuild of the reference ``train_encoder`` (``training_utils.py:884-1172``)
to the same standard as stages A/B (:mod:`loop`):

* ``--vae``: VAE encoder -> z space, loss = 0.5 L(thumb) + 0.5 L(full) + KL
  (the reference's operative path, ``training_utils.py:1016-1017``);
* ``--psp``: GradualStyleEncoder -> W+ stack driving the decoder with
  ``input_is_latent`` plus a learned renderer-style projection
  (:mod:`..encoder.psp`; repairs the reference's dimension-inconsistent
  commented path, ``training_utils.py:1013-1015``), optionally warm-started
  from ``model_ir_se50`` like the reference (``training_utils.py:938-940``);
* ``LossUtils`` ID/L2/LPIPS bundle on full-res images with pretrained
  perceptual weights loaded via ``--irse_weights`` / ``--lpips_weights``
  (thumbs score L2 only — the reference runs its 256^2-crop ID loss on
  64^2 thumbs too, where the crop is out-of-frame by construction);
* auto-resume from ``models_{it:07d}``, ``exit_after`` -> checkpoint +
  ``SystemExit(3)``, periodic reconstruction grids (8-view sweep per
  identity, reference cadence ``training_utils.py:1080-1120``), and a final
  ``{e, g_ema}`` artifact pairing the encoder with its frozen generator.

``train_encoder`` is the pure loop (tiny-shape testable, mirrors
``train_volume_renderer``); ``train_encoder_stage`` is the production
assembly that ``train.py`` calls.
"""

from __future__ import annotations

import os
import time
from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..encoder import (
    LossUtils,
    PSPConfig,
    VAEEncoderConfig,
    apply_psp_encoder,
    apply_vae_encoder,
    init_psp_encoder,
    init_vae_encoder,
    reparameterize,
)
from ..encoder.vae import kl_divergence
from ..models.generator import GeneratorConfig, generator_forward, mean_latent
from ..utils.checkpoints import (
    latest_checkpoint_step,
    load_checkpoint,
    save_checkpoint,
)
from ..utils.images import save_image_grid
from ..utils.logging import MetricsLogger
from .optim import encoder_optimizer

EncoderConfig = Union[VAEEncoderConfig, PSPConfig]

THUMB_LOSS = LossUtils()  # L2 only: perceptual nets assume full-res crops


def make_encoder_step(gcfg: GeneratorConfig, ecfg: EncoderConfig, tx,
                      loss_utils: LossUtils, kl_weight: float = 0.005,
                      latent_avg=None):
    """``latent_avg``: (renderer_mean [1, style_dim], decoder_mean [1, 512])
    from :func:`mean_latent` — with ``PSPConfig.start_from_avg`` the pSp
    encoder predicts offsets from these (recomputable at inference from the
    saved ``g_ema`` with ``mean_latent(..., PRNGKey(2))``)."""
    psp = isinstance(ecfg, PSPConfig)

    def step(e_params, g_params, e_opt_state, key, real_imgs, real_thumbs,
             cam_extrinsics, focal, near, far):
        def loss_fn(ep):
            kz, kr = jax.random.split(key)
            if psp:
                rend_latent, wplus = apply_psp_encoder(ep, ecfg, real_imgs)
                if latent_avg is not None:
                    rend_latent = rend_latent + latent_avg[0]
                    wplus = wplus + latent_avg[1]
                out = generator_forward(
                    g_params, gcfg, [wplus], cam_extrinsics, focal, near, far,
                    key=kr, input_is_latent=True, renderer_latent=rend_latent,
                )
                kl = jnp.zeros(())
            else:
                mu, logvar = apply_vae_encoder(ep, ecfg, real_imgs)
                z = reparameterize(kz, mu, logvar)
                out = generator_forward(
                    g_params, gcfg, [z], cam_extrinsics, focal, near, far,
                    key=kr,
                )
                kl = kl_divergence(mu, logvar)
            thumb_losses = THUMB_LOSS(out.thumb_rgb, real_thumbs)
            full_img = out.rgb if out.rgb is not None else out.thumb_rgb
            full_losses = loss_utils(full_img, real_imgs)
            loss = (0.5 * thumb_losses["loss"] + 0.5 * full_losses["loss"]
                    + kl_weight * kl)
            metrics = {"e_loss": loss, "e_kl": kl,
                       "e_l2_thumb": thumb_losses["l2"],
                       "e_l2_full": full_losses["l2"]}
            for name in ("id", "lpips"):
                if name in full_losses:
                    metrics[f"e_{name}"] = full_losses[name]
            return loss, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(e_params)
        updates, e_opt_state = tx.update(grads, e_opt_state, e_params)
        e_params = optax.apply_updates(e_params, updates)
        return e_params, e_opt_state, metrics

    return step


def _make_recon_fn(gcfg: GeneratorConfig, ecfg: EncoderConfig):
    """Jitted one-identity -> 8-sweep-view reconstruction (viz cadence)."""
    psp = isinstance(ecfg, PSPConfig)

    @jax.jit
    def recon_fn(ep, gp, img1, extr, focal, near, far, trunc):
        if psp:
            rend, wplus = apply_psp_encoder(ep, ecfg, img1)
            if ecfg.start_from_avg:
                rend = rend + trunc[0]
                wplus = wplus + trunc[1]
            out = generator_forward(
                gp, gcfg, [jnp.repeat(wplus, 8, axis=0)], extr, focal, near,
                far, input_is_latent=True,
                renderer_latent=jnp.repeat(rend, 8, axis=0),
                randomize_noise=False,
            )
        else:
            mu, _ = apply_vae_encoder(ep, ecfg, img1)
            out = generator_forward(
                gp, gcfg, [jnp.repeat(mu, 8, axis=0)], extr, focal, near, far,
                truncation=0.5, truncation_latent=trunc,
                randomize_noise=False,
            )
        return out.rgb if out.rgb is not None else out.thumb_rgb

    return recon_fn


def train_encoder(
    loader,
    gcfg: GeneratorConfig,
    g_ema,
    ecfg: EncoderConfig,
    out_dir: str,
    loss_utils: Optional[LossUtils] = None,
    e_init=None,
    iters: int = 100000,
    log_every: int = 100,
    save_every: int = 10000,
    sample_every: int = 1000,
    exit_after: Optional[float] = None,
    val_n_sample: int = 4,
    seed: int = 0,
    mesh=None,
):
    """Train an inversion encoder against a frozen generator.

    ``loader`` yields (imgs [B, S, S, 3], thumbs [B, r, r, 3]) in [-1, 1];
    ``g_ema`` are frozen ``full_pipeline`` generator params.  Runs
    data-parallel over ``mesh`` like stages A/B.  Returns encoder params;
    writes the final ``encoder`` artifact ``{e, g_ema}``.
    """
    from ..geometry.cameras import generate_camera_params
    from ..parallel import data_parallel_jit, replicate, shard_batch
    from .loop import _training_mesh
    from .steps import TrainHParams as _HP

    psp = isinstance(ecfg, PSPConfig)
    if psp and gcfg.full_pipeline and gcfg.decoder.style_dim != 512:
        raise ValueError(
            "pSp W+ styles are 512-d (GradualStyleEncoder output); the "
            f"decoder style_dim is {gcfg.decoder.style_dim} — pSp requires "
            "style_dim=256 generators (decoder style 512)"
        )
    os.makedirs(out_dir, exist_ok=True)
    logger = MetricsLogger(out_dir, "encoder", print_every=log_every)

    key = jax.random.PRNGKey(seed)
    if e_init is not None:
        e_params = e_init
    elif psp:
        e_params = init_psp_encoder(key, ecfg)
    else:
        e_params = init_vae_encoder(key, ecfg)
    tx = encoder_optimizer(vae=not psp)
    e_state = tx.init(e_params)

    start_iter = 0
    latest = latest_checkpoint_step(out_dir)
    if latest is not None:
        ck = load_checkpoint(
            out_dir, f"models_{latest:07d}",
            {"e": e_params, "e_opt": e_state, "step": 0},
        )
        e_params, e_state = ck["e"], ck["e_opt"]
        start_iter = int(ck["step"]) + 1  # saved AFTER step i -> resume at i+1
        print(f"resumed encoder at step {start_iter}")

    loss_utils = loss_utils or LossUtils()
    data = iter(loader)

    # Fixed eval identities for the periodic reconstruction grid (the
    # reference loads data/ffhq/eval.npy, training_utils.py:972; here the
    # first loader batch is frozen and saved once as the target strip).
    first_imgs, _ = next(data)
    batch = int(np.asarray(first_imgs).shape[0])
    val_n_sample = min(val_n_sample, batch)
    eval_imgs = np.asarray(first_imgs)[:val_n_sample]
    if start_iter == 0 and sample_every:
        save_image_grid(eval_imgs, os.path.join(out_dir, "eval.png"), nrow=1)

    mesh = _training_mesh(_HP(batch=batch), mesh)
    e_params, g_ema_r, e_state = replicate((e_params, g_ema, e_state), mesh)
    res = gcfg.renderer.out_im_res
    trunc = jax.jit(mean_latent, static_argnums=1)(
        g_ema_r, gcfg, jax.random.PRNGKey(2)
    )
    latent_avg = trunc if (psp and ecfg.start_from_avg) else None
    step = data_parallel_jit(
        make_encoder_step(gcfg, ecfg, tx, loss_utils, latent_avg=latent_avg),
        mesh, batch_argnums=(4, 5), donate_argnums=(0, 2),
    )
    recon_fn = _make_recon_fn(gcfg, ecfg)

    def viz(i):
        cams = generate_camera_params(res, jax.random.PRNGKey(1),
                                      batch=val_n_sample, sweep=True)
        rows = []
        for n in range(val_n_sample):
            sl = slice(8 * n, 8 * (n + 1))
            rows.append(np.asarray(recon_fn(
                e_params, g_ema_r, jnp.asarray(eval_imgs[n : n + 1]),
                cams.extrinsics[sl], cams.focal[sl], cams.near[sl],
                cams.far[sl], trunc,
            )))
        save_image_grid(np.concatenate(rows, axis=0),
                        os.path.join(out_dir, f"samples_{i:07d}.png"), nrow=8)

    adv_key = jax.random.fold_in(jax.random.PRNGKey(seed), 3)
    t_start = time.time()
    for i in range(start_iter, iters):
        imgs, thumbs = next(data)
        kc, ks = jax.random.split(jax.random.fold_in(adv_key, i))
        cams = generate_camera_params(res, kc, batch=imgs.shape[0])
        e_params, e_state, m = step(
            e_params, g_ema_r, e_state, ks,
            shard_batch(np.asarray(imgs), mesh),
            shard_batch(np.asarray(thumbs), mesh),
            cams.extrinsics, cams.focal, cams.near, cams.far,
        )
        if i % log_every == 0:
            logger.log(i, m)
        if sample_every and i % sample_every == 0:
            viz(i)
        if save_every and i and i % save_every == 0:
            save_checkpoint(out_dir, f"models_{i:07d}",
                            {"e": e_params, "e_opt": e_state, "step": i})
        if exit_after is not None and time.time() - t_start > exit_after:
            save_checkpoint(out_dir, f"models_{i:07d}",
                            {"e": e_params, "e_opt": e_state, "step": i})
            print("time budget reached; checkpoint saved (exit code 3 contract)")
            raise SystemExit(3)
    # Final artifact bundles the (frozen) generator with the encoder so a
    # consumer has the matched pair (reference saves {e,g,d,g_ema},
    # training_utils.py:1152-1170; g == g_ema here since G never trains).
    save_checkpoint(out_dir, "encoder", {"e": e_params, "g_ema": g_ema})
    logger.close()
    return e_params


def load_perceptual_params(args: Any) -> LossUtils:
    """Build the stage-C loss bundle, importing ArcFace/LPIPS torch weights
    when paths are supplied (reference constructs ``LossUtils(device)`` with
    both nets pretrained, ``psp_encoders.py:195-208``)."""
    irse_params = lpips_params = None
    irse_path = getattr(args, "irse_weights", None)
    if irse_path:
        import torch

        from ..encoder import IRSEConfig, init_irse_backbone
        from ..encoder.irse import import_irse_state

        state = torch.load(irse_path, map_location="cpu", weights_only=False)
        state = {k: np.asarray(v) for k, v in state.items()}
        template = init_irse_backbone(jax.random.PRNGKey(0), IRSEConfig())
        irse_params = import_irse_state(state, template)
        print(f"loaded ArcFace ID-loss weights from {irse_path}")
    lpips_path = getattr(args, "lpips_weights", None)
    if lpips_path:
        import torch

        from ..encoder import LPIPSConfig, init_lpips
        from ..encoder.lpips import import_lpips_state

        bundle = torch.load(lpips_path, map_location="cpu", weights_only=False)
        # one archive holding both state dicts: {"alex": ..., "lin": ...}
        alex = {k: np.asarray(v) for k, v in bundle["alex"].items()}
        lin = {k: np.asarray(v) for k, v in bundle["lin"].items()}
        template = init_lpips(jax.random.PRNGKey(0), LPIPSConfig())
        lpips_params = import_lpips_state(alex, lin, template)
        print(f"loaded LPIPS weights from {lpips_path}")
    return LossUtils(irse_params=irse_params, lpips_params=lpips_params)


def train_encoder_stage(args: Any, cfg: Any, out_base: str,
                        iters: int = 100000, **kwargs) -> Any:
    """Production stage-C assembly (mirrors ``train.py``'s stage A/B blocks):
    build configs from the yaml/CLI, load the frozen ``full_pipeline``
    generator, open the record-store loader, and run :func:`train_encoder`."""
    from ..config.build import generator_config
    from ..config.sdf_options import get_vol_render_opt, rendering_overrides
    from ..data import DataLoader, MultiResolutionDataset
    from ..models.generator import init_generator

    expname = cfg["training"]["out_dir"].split("/")[1]
    img_size = cfg["data"].get("img_size", 256)
    batch = getattr(args, "batch", 8)
    psp = bool(getattr(args, "psp", 0))
    # rendering_overrides keeps the frozen generator's config identical to
    # how stages A/B trained it (TPU-tuned NGP grid, bg_mode,
    # view_independent, ...) — without it the encoder would train against
    # a generator assembled from reference defaults.
    opt = get_vol_render_opt(expname, False, ngp=bool(getattr(args, "ngp", 0)),
                             fc=bool(getattr(args, "fc", 0)), psp=psp,
                             size=img_size, batch=batch,
                             extra_argv=rendering_overrides(cfg))
    gcfg = generator_config(opt, stage_a=False)

    template = init_generator(jax.random.PRNGKey(0), gcfg)
    ck = load_checkpoint(out_base, "full_pipeline", {"g_ema": template})
    g_ema = ck["g_ema"]

    e_init = None
    if psp:
        ecfg: EncoderConfig = PSPConfig(
            img_size=img_size, style_count=gcfg.decoder.n_latent,
            renderer_style_dim=gcfg.style_dim,
        )
        irse_path = getattr(args, "irse_weights", None)
        if irse_path:
            # warm-start the FPN backbone from ArcFace (reference
            # strict=False load, training_utils.py:938-940)
            import torch

            from ..encoder.irse import import_irse_state

            e_init = init_psp_encoder(
                jax.random.PRNGKey(getattr(args, "seed", 0)), ecfg
            )
            state = torch.load(irse_path, map_location="cpu", weights_only=False)
            state = {k: np.asarray(v) for k, v in state.items()}
            e_init["gse"]["backbone"] = import_irse_state(
                state, e_init["gse"]["backbone"]
            )
            print("pSp backbone warm-started from ir_se50 weights")
    else:
        ecfg = VAEEncoderConfig(img_size=img_size, z_size=gcfg.style_dim)

    from ..data import resolve_record_dir

    data_path = (getattr(args, "dataset_path", None)
                 or resolve_record_dir(cfg["data"]["path"]))
    ds = MultiResolutionDataset(data_path, resolution=img_size,
                                nerf_resolution=gcfg.renderer.out_im_res)
    try:
        with DataLoader(ds, batch_size=batch, host_id=jax.process_index(),
                        num_hosts=jax.process_count()) as loader:
            # distinct per-type directories: auto-resume must never load a
            # VAE checkpoint into a pSp tree (or vice versa)
            return train_encoder(
                loader, gcfg, g_ema, ecfg,
                os.path.join(out_base, "encoder_psp" if psp else "encoder"),
                loss_utils=load_perceptual_params(args),
                e_init=e_init, iters=iters,
                seed=getattr(args, "seed", 0), **kwargs,
            )
    finally:
        ds.close()
