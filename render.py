#!/usr/bin/env python
"""GIRAFFE render-program driver (reference ``render.py``): load a trained
model and run the yaml's ``rendering.render_program`` list.

``--vae 1`` reproduces the reference's real-image conditioning
(``render.py:25-52``): encode real images with the trained VAE encoder,
reparameterize, split the latent into [z_shape | z_app] halves, and run
the render programs with those object codes instead of samples.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Render a GIRAFFE model.")
    p.add_argument("--config", type=str, default="configs/256res/ffhq_256.yaml")
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--n_steps", type=int, default=16)
    p.add_argument("--vae", type=int, default=0,
                   help="condition render programs on VAE-encoded real images")
    p.add_argument("--vae_images", type=str, default=None,
                   help="image dir/glob for --vae (default: the yaml data path)")
    p.add_argument("--export_meshes", type=int, default=0,
                   help="write per-identity .ply meshes during object_rotation")
    p.add_argument("--mesh_res", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    from sdface_gan_tpu.config import load_config
    from sdface_gan_tpu.config.yaml_config import default_config_path
    from sdface_gan_tpu.giraffe.config import giraffe_config_from_yaml
    from sdface_gan_tpu.giraffe.generator import init_giraffe
    from sdface_gan_tpu.giraffe.rendering import render_program
    from sdface_gan_tpu.utils.checkpoints import CheckpointIO

    cfg = load_config(args.config, default_config_path())
    gcfg = giraffe_config_from_yaml(cfg)
    out_dir = cfg["training"]["out_dir"]
    render_dir = os.path.join(out_dir, cfg["rendering"].get("render_dir", "rendering"))

    template = init_giraffe(jax.random.PRNGKey(0), gcfg)
    ckpt = CheckpointIO(out_dir)
    name = "model_best" if ckpt.exists("model_best") else "model"
    state = ckpt.load(name, {"g_ema": template})
    g = state["g_ema"]

    codes = None
    if args.vae:
        codes = _encode_real_images(args, cfg, gcfg, ckpt)

    for program in cfg["rendering"].get("render_program", ["object_rotation"]):
        print(f"rendering program: {program}")
        render_program(
            g, gcfg, program, render_dir,
            n_samples=args.n_samples, n_steps=args.n_steps, codes=codes,
            key=jax.random.PRNGKey(args.seed),
            export_meshes=bool(args.export_meshes) and program == "object_rotation",
            mesh_resolution=args.mesh_res,
        )


def _encode_real_images(args, cfg, gcfg, ckpt):
    """VAE-encode ``n_samples`` real images into object latent codes
    (reference ``render.py:25-52`` + ``generator.py:100-106``: the 2*z_dim
    latent splits into [z_shape | z_app]; background codes stay sampled)."""
    import jax
    import jax.numpy as jnp
    import numpy as np


    from sdface_gan_tpu.encoder import (
        VAEEncoderConfig,
        apply_vae_encoder,
        init_vae_encoder,
        reparameterize,
    )
    from sdface_gan_tpu.giraffe.generator import LatentCodes

    img_size = cfg["data"].get("img_size", 64)
    ecfg = VAEEncoderConfig(img_size=img_size, z_size=2 * gcfg.z_dim)
    template = init_vae_encoder(jax.random.PRNGKey(1), ecfg)
    if not ckpt.exists("encoder"):
        raise SystemExit(
            "--vae requires a trained encoder checkpoint "
            "(train with --vae 1 first)"
        )
    e = ckpt.load("encoder", {"e": template})["e"]

    pattern = args.vae_images or cfg["data"]["path"]
    if os.path.isdir(pattern):
        pattern = os.path.join(pattern, "*")
    # Preprocess exactly as the encoder was trained (giraffe train loop):
    # celebA center crop / random-crop / tanh range come from the SAME
    # config keys — a bare resize would feed the VAE out-of-distribution
    # inputs (aspect-squashed, uncropped, wrong range).
    from sdface_gan_tpu.data.images import ImagesDataset

    dataset = ImagesDataset(
        pattern,
        size=img_size,
        celebA_center_crop=cfg["data"].get("celebA_center_crop", False),
        random_crop=cfg["data"].get("random_crop", False),
        use_tanh_range=cfg["data"].get("use_tanh_range", False),
        hflip=False,  # deterministic conditioning
    )
    n_cond = min(args.n_samples, len(dataset))
    if n_cond == 0:
        raise SystemExit(f"--vae: no images found at {pattern}")
    imgs = np.stack([dataset[i] for i in range(n_cond)])
    print(f"conditioning on {n_cond} real images from {pattern}")

    key = jax.random.PRNGKey(args.seed)
    k_rep, k_bg1, k_bg2 = jax.random.split(key, 3)
    mu, logvar = apply_vae_encoder(e, ecfg, jnp.asarray(imgs))
    z = reparameterize(k_rep, mu, logvar)
    n = z.shape[0]
    z_shape = jnp.tile(z[:, None, : gcfg.z_dim], (1, gcfg.n_boxes, 1))
    z_app = jnp.tile(z[:, None, gcfg.z_dim :], (1, gcfg.n_boxes, 1))
    return LatentCodes(
        z_shape, z_app,
        0.65 * jax.random.normal(k_bg1, (n, gcfg.z_dim_bg)),
        0.65 * jax.random.normal(k_bg2, (n, gcfg.z_dim_bg)),
    )


if __name__ == "__main__":
    main()
