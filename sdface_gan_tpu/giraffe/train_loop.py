"""GIRAFFE training driver.

Rebuild of ``im2scene/training_utils.py:26-140`` (``train_giraffe``) +
``giraffe/training.py``: iteration loop with the yaml cadences
(print/visualize/checkpoint/backup/validate), CheckpointIO resume,
best-FID model tracking, and the ``--exit-after`` save-and-exit(3)
contract.
"""

from __future__ import annotations

import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.images import ImagesDataset, ImagesLoader
from ..utils.checkpoints import CheckpointIO
from ..utils.images import save_image_grid
from ..utils.logging import MetricsLogger
from .config import dc_disc_config_from_yaml, giraffe_config_from_yaml
from .discriminator import init_dc_discriminator
from .generator import (
    fixed_camera,
    giraffe_forward,
    init_giraffe,
    sample_latent_codes,
)
from .bbox import fixed_transformations
from .trainer import (
    GiraffeTrainHParams,
    giraffe_optimizers,
    make_giraffe_d_step,
    make_giraffe_g_step,
)


def evaluate_fid(
    g_ema, gcfg, n_images: int, batch_size: int, fid_file: Optional[str], key
) -> Optional[float]:
    """FID of generated images vs precomputed stats (reference
    ``eval_step``, ``giraffe/training.py:115-142``)."""
    if not fid_file or not os.path.exists(fid_file):
        return None
    from ..evaluation import (
        calculate_activation_statistics,
        calculate_frechet_distance,
        compute_activations,
        load_inception,
        load_stats_npz,
    )

    inc = load_inception()
    fn = jax.jit(
        lambda p, k: giraffe_forward(p, gcfg, key=k, batch_size=batch_size, mode="eval")
    )

    def batches():
        nonlocal key
        done = 0
        while done < n_images:
            key, sub = jax.random.split(key)
            imgs = np.asarray(fn(g_ema, sub))  # [0, 1]
            yield imgs * 2.0 - 1.0
            done += batch_size

    acts = compute_activations(inc, batches(), batch_size=batch_size)[:n_images]
    mu, sigma = calculate_activation_statistics(acts)
    mu_r, s_r = load_stats_npz(fid_file)
    return calculate_frechet_distance(mu, sigma, mu_r, s_r)


def visualize(g_ema, gcfg, path: str, n: int = 16, key=None) -> None:
    """Fixed-camera sample grid (reference ``visualize``,
    ``giraffe/training.py:325-345``)."""
    key = key if key is not None else jax.random.PRNGKey(42)
    codes = sample_latent_codes(key, gcfg, n, tmp=0.65)
    cams = fixed_camera(gcfg, n)
    trans = fixed_transformations(gcfg.bbox, n)
    imgs = giraffe_forward(
        g_ema, gcfg, latent_codes=codes, camera_matrices=cams,
        transformations=trans, mode="eval",
    )
    save_image_grid(np.asarray(imgs) * 2.0 - 1.0, path, nrow=4)


def train_giraffe(args: Any, cfg: Any) -> None:
    gcfg = giraffe_config_from_yaml(cfg, args)
    dcfg = dc_disc_config_from_yaml(cfg)
    tr = cfg["training"]
    hp = GiraffeTrainHParams(
        batch_size=tr.get("batch_size", 32),
        lr_g=tr.get("learning_rate", 0.0005),
        lr_d=tr.get("learning_rate_d", 0.0001),
        optimizer=tr.get("optimizer", "RMSprop"),
    )
    out_dir = tr.get("out_dir", "out/giraffe")
    os.makedirs(out_dir, exist_ok=True)
    logger = MetricsLogger(out_dir, "giraffe", print_every=tr.get("print_every", 10))

    dataset = ImagesDataset(
        cfg["data"]["path"],
        size=cfg["data"].get("img_size", 64),
        celebA_center_crop=cfg["data"].get("celebA_center_crop", False),
        random_crop=cfg["data"].get("random_crop", False),
        use_tanh_range=cfg["data"].get("use_tanh_range", False),
    )
    loader = iter(ImagesLoader(dataset, hp.batch_size, seed=getattr(args, "seed", 0)))

    key = jax.random.PRNGKey(getattr(args, "seed", 0))
    kg, kd = jax.random.split(key)
    g = init_giraffe(kg, gcfg)
    d = init_dc_discriminator(kd, dcfg)
    g_ema = jax.tree_util.tree_map(jnp.copy, g)
    g_tx, d_tx = giraffe_optimizers(hp)
    g_state, d_state = g_tx.init(g), d_tx.init(d)

    ckpt = CheckpointIO(out_dir)
    it = 0
    fid_best = float("inf")
    if ckpt.exists("model"):
        state = ckpt.load(
            "model",
            {"g": g, "d": d, "g_ema": g_ema, "g_opt": g_state, "d_opt": d_state,
             "it": 0, "fid_best": jnp.asarray(float("inf"))},
        )
        g, d, g_ema = state["g"], state["d"], state["g_ema"]
        g_state, d_state = state["g_opt"], state["d_opt"]
        it = int(state["it"])
        fid_best = float(state["fid_best"])
        print(f"resumed GIRAFFE from iteration {it}")

    # Data-parallel over the mesh like the SDF stages (training/loop.py):
    # params replicated, the real batch sharded on its leading dim, gradient
    # reduction a GSPMD psum over ICI.
    from ..parallel import data_parallel_jit, replicate, shard_batch
    from ..training.loop import _training_mesh
    from ..training.steps import TrainHParams as _HP

    mesh = _training_mesh(_HP(batch=hp.batch_size))
    g, d, g_ema, g_state, d_state = replicate((g, d, g_ema, g_state, d_state), mesh)
    d_step = data_parallel_jit(make_giraffe_d_step(gcfg, dcfg, hp, d_tx), mesh,
                               batch_argnums=(4,), donate_argnums=(1, 2))
    g_step = data_parallel_jit(make_giraffe_g_step(gcfg, dcfg, hp, g_tx), mesh,
                               donate_argnums=(0, 2, 3))

    use_vae = bool(getattr(args, "vae", 0))
    if use_vae:
        import optax

        from ..encoder import VAEEncoderConfig, init_vae_encoder
        from .trainer import make_giraffe_encoder_step

        ecfg = VAEEncoderConfig(img_size=dcfg.img_size, z_size=2 * gcfg.z_dim)
        key, ke = jax.random.split(key)
        e = init_vae_encoder(ke, ecfg)
        e_tx = optax.adam(5e-4)
        e_state = e_tx.init(e)
        # the encoder is its own named artifact (render.py --vae loads it)
        if ckpt.exists("encoder"):
            est = ckpt.load("encoder", {"e": e, "e_opt": e_state})
            e, e_state = est["e"], est["e_opt"]
            print("resumed VAE encoder")
        e, e_state = replicate((e, e_state), mesh)
        e_step = data_parallel_jit(make_giraffe_encoder_step(gcfg, dcfg, hp, e_tx),
                                   mesh, batch_argnums=(5,), donate_argnums=(0, 3))

    max_it = tr.get("max_it", 1000000)
    exit_after = getattr(args, "exit_after", -1)
    t0 = time.time()
    while it < max_it:
        it += 1
        batch = next(loader)  # [B, H, W, 3] in [0,1] (or [-1,1] tanh)
        x_real = shard_batch(np.asarray(batch), mesh)
        key, k1, k2, k3 = jax.random.split(key, 4)
        d, d_state, dm = d_step(g, d, d_state, k1, x_real)
        g, g_state, g_ema, gm = g_step(g, d, g_state, g_ema, k2)
        if use_vae:
            e, e_state, em = e_step(e, g, d, e_state, k3, x_real)
            gm = {**gm, **em}

        if it % tr.get("print_every", 10) == 0:
            logger.log(it, {**dm, **gm})
        if it % tr.get("visualize_every", 1000) == 0:
            visualize(g_ema, gcfg, os.path.join(out_dir, f"vis_{it:07d}.png"))
        if it % tr.get("checkpoint_every", 500) == 0:
            ckpt.save("model", g=g, d=d, g_ema=g_ema, g_opt=g_state, d_opt=d_state,
                      it=it, fid_best=jnp.asarray(fid_best))
            if use_vae:
                ckpt.save("encoder", e=e, e_opt=e_state)
        if it % tr.get("backup_every", 1000000) == 0:
            ckpt.save(f"model_{it:07d}", g=g, d=d, g_ema=g_ema, it=it)
        if it % tr.get("validate_every", 10000) == 0:
            key, sub = jax.random.split(key)
            fid = evaluate_fid(
                g_ema, gcfg, tr.get("n_eval_images", 10000), hp.batch_size,
                cfg["data"].get("fid_file"), sub,
            )
            if fid is not None:
                logger.log(it, {"fid_score": fid})
                if fid < fid_best:
                    fid_best = fid
                    ckpt.save("model_best", g=g, d=d, g_ema=g_ema, it=it,
                              fid_best=jnp.asarray(fid_best))
        if exit_after and exit_after > 0 and time.time() - t0 > exit_after:
            ckpt.save("model", g=g, d=d, g_ema=g_ema, g_opt=g_state, d_opt=d_state,
                      it=it, fid_best=jnp.asarray(fid_best))
            if use_vae:
                ckpt.save("encoder", e=e, e_opt=e_state)
            print("time budget reached; checkpoint saved")
            raise SystemExit(3)
