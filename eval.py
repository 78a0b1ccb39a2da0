#!/usr/bin/env python
"""Evaluation CLI — the reference ``eval.py`` protocol, with the FID tail
actually working.

Protocol (reference ``eval.py:87-167`` + ``README.md:44-53``): load the
``full_pipeline`` EMA generator, sample N identities (one random camera
each) at truncation 1, dump PNGs to ``out/<exp>/eval/``, then score FID
(and KID) in-process against either a precomputed stats ``.npz`` or a
directory/record-store of real images.
"""

from __future__ import annotations

import argparse
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate an SDFace-GAN TPU model.")
    p.add_argument("--config", type=str, default="configs/256res/ffhq_256_sdf.yaml")
    p.add_argument("--sdf", type=int, default=1)
    p.add_argument("--ngp", type=int, default=0)
    p.add_argument("--fc", type=int, default=0)
    p.add_argument("--n_images", type=int, default=5000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--fid_file", type=str, default=None,
                   help=".npz with precomputed (mu, sigma) real stats")
    p.add_argument("--real_dir", type=str, default=None,
                   help="directory of real images to score against")
    p.add_argument("--inception_weights", type=str, default=None,
                   help="pytorch-fid inception checkpoint for exact parity")
    p.add_argument("--no_fid", action="store_true")
    p.add_argument("--g_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="generation precision: bfloat16 casts the EMA "
                        "weights like the serving path (MXU-native; the "
                        "renderer pins compositing to f32 internally) — "
                        "~2x the protocol throughput, FID delta measured "
                        "in docs/TRAINING_RUN.md")
    p.add_argument("--no_dump", action="store_true",
                   help="skip the PNG dump and fuse generation + inception "
                        "into one on-device program — only 2048-d "
                        "activations cross the host link (fast FID-only "
                        "scoring; the reference protocol dumps images for "
                        "the external torch-fidelity CLI)")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)

    from sdface_gan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdface_gan_tpu.config import load_config
    from sdface_gan_tpu.config.build import generator_config
    from sdface_gan_tpu.config.sdf_options import (
        get_vol_render_opt,
        rendering_overrides,
        resolve_renderer_type,
    )
    from sdface_gan_tpu.config.yaml_config import default_config_path
    from sdface_gan_tpu.geometry import generate_camera_params
    from sdface_gan_tpu.models.generator import generator_forward, init_generator
    from sdface_gan_tpu.utils.checkpoints import load_checkpoint
    from sdface_gan_tpu.utils.images import save_image

    cfg = load_config(args.config, default_config_path())
    expname = cfg["training"]["out_dir"].split("/")[1]
    out_base = os.path.join("./out", expname)
    eval_dir = os.path.join(out_base, "eval")
    os.makedirs(eval_dir, exist_ok=True)

    img_size = cfg["data"].get("img_size", 256)
    opt = get_vol_render_opt(expname, False, ngp=resolve_renderer_type(cfg, bool(args.ngp)), fc=bool(args.fc),
                             size=img_size, batch=args.batch,
                             extra_argv=rendering_overrides(cfg))
    gcfg = generator_config(opt, stage_a=False)

    template = init_generator(jax.random.PRNGKey(0), gcfg)
    ck = load_checkpoint(out_base, "full_pipeline", {"g_ema": template})
    g_ema = ck["g_ema"]
    if args.g_dtype != "float32":
        # the serving-path cast (serving/bench): bf16 weights, f32 SDF
        # compositing (pinned inside the renderer)
        cast_dt = jnp.dtype(args.g_dtype)
        g_ema = jax.tree_util.tree_map(
            lambda x: x.astype(cast_dt) if x.dtype == jnp.float32 else x,
            g_ema,
        )

    # NGP + yaml `rendering: pack_mb`: corner-packed inference tables
    # (one-time repack at load; docs/PERFORMANCE.md)
    from sdface_gan_tpu.models.generator import pack_generator_for_inference

    g_ema = pack_generator_for_inference(g_ema, gcfg)

    # Resolve the real-stats source up front: with --no_dump and no FID
    # source the whole generation pass would produce nothing (no PNGs, no
    # score) — fail before spending the compute, not after.
    fid_file = args.fid_file or cfg["data"].get("fid_file")
    if fid_file and not os.path.exists(fid_file):
        print(f"fid_file {fid_file!r} not found; falling back to --real_dir")
        fid_file = None
    if args.no_dump and not args.no_fid and not fid_file and not args.real_dir:
        raise SystemExit(
            "--no_dump produces no PNGs, and no real-stats source is "
            "available to score against — pass --fid_file or --real_dir "
            "(or drop --no_dump to keep the image dump)"
        )

    res = gcfg.renderer.out_im_res

    # Data-parallel generation: the 5000-image protocol is embarrassingly
    # parallel, so the batch (z + cameras) shards over every device that
    # divides it; params replicate; one chip degenerates to plain jit.
    from sdface_gan_tpu.parallel import data_parallel_jit, make_mesh, replicate

    devices = jax.devices()
    n_dev = len(devices)
    while args.batch % n_dev:
        n_dev -= 1
    mesh = make_mesh(devices[:n_dev])
    if n_dev > 1:
        print(f"eval sampling data-parallel over {n_dev} devices")
    g_ema = replicate(g_ema, mesh)

    def _sample(params, z, extr, focal, near, far, key):
        out = generator_forward(params, gcfg, [z], extr, focal, near, far, key=key)
        # images leave the program f32 regardless of --g_dtype (PNG encode
        # and inception scoring both expect it)
        return out.rgb.astype(jnp.float32)

    sample = data_parallel_jit(_sample, mesh, batch_argnums=(1, 2, 3, 4, 5))

    stats = {"n": 0, "dt": 0.0}

    def generated_batches():
        """Generate + dump PNGs, yielding each batch for streaming FID
        activation computation — no 5000-image host buffer."""
        key = jax.random.PRNGKey(0)
        t0 = time.time()
        n_done = 0
        while n_done < args.n_images:
            b = min(args.batch, args.n_images - n_done)
            key, kz, kc, kr = jax.random.split(key, 4)
            z = jax.random.normal(kz, (args.batch, gcfg.style_dim))
            cams = generate_camera_params(res, kc, batch=args.batch)
            imgs = np.asarray(
                sample(g_ema, z, cams.extrinsics, cams.focal, cams.near,
                       cams.far, kr)
            )[:b]
            if not args.no_dump:  # honor --no_dump on the --no_fid path too
                for i in range(b):
                    save_image(imgs[i], os.path.join(eval_dir, f"{n_done + i:07d}.png"))
            n_done += b
            stats["n"], stats["dt"] = n_done, time.time() - t0
            yield imgs

    if args.no_fid:
        for _ in generated_batches():
            pass
        print(f"generated {stats['n']} images in {stats['dt']:.1f}s "
              f"({stats['dt'] / max(stats['n'], 1):.3f} s/image)")
        return

    from sdface_gan_tpu.evaluation import (
        calculate_activation_statistics,
        calculate_frechet_distance,
        calculate_kid,
        compute_activations,
        load_inception,
        load_stats_npz,
    )

    inc = load_inception(args.inception_weights)
    if args.no_dump:
        # Fused scoring: one XLA program generates the batch AND computes
        # its pool3 activations, so each image never leaves the device —
        # only [batch, 2048] activations cross the (tunneled) host link
        # instead of two full-image transfers plus a PNG encode.
        from sdface_gan_tpu.evaluation import inception_pool3

        inc_dev = replicate(inc, mesh)

        def _sample_acts(params, incp, z, extr, focal, near, far, key):
            out = generator_forward(params, gcfg, [z], extr, focal, near,
                                    far, key=key)
            return inception_pool3(incp, out.rgb.astype(jnp.float32))

        sample_acts = data_parallel_jit(_sample_acts, mesh,
                                        batch_argnums=(2, 3, 4, 5, 6))
        key = jax.random.PRNGKey(0)
        t0, n_done, acts = time.time(), 0, []
        while n_done < args.n_images:
            b = min(args.batch, args.n_images - n_done)
            key, kz, kc, kr = jax.random.split(key, 4)
            z = jax.random.normal(kz, (args.batch, gcfg.style_dim))
            cams = generate_camera_params(res, kc, batch=args.batch)
            acts.append(np.asarray(
                sample_acts(g_ema, inc_dev, z, cams.extrinsics, cams.focal,
                            cams.near, cams.far, kr)
            )[:b])
            n_done += b
            stats["n"], stats["dt"] = n_done, time.time() - t0
        fake_acts = np.concatenate(acts, axis=0)
        print(f"scored {stats['n']} images in {stats['dt']:.1f}s "
              f"({stats['dt'] / max(stats['n'], 1):.3f} s/image, "
              f"on-device fused generation + inception, no image dump)")
    else:
        # streaming: each generated batch feeds inception immediately; host
        # memory stays flat in image count (only 2048-d activations persist)
        fake_acts = compute_activations(inc, generated_batches(),
                                        batch_size=args.batch)
        print(f"generated {stats['n']} images in {stats['dt']:.1f}s "
              f"({stats['dt'] / max(stats['n'], 1):.3f} s/image, "
              f"incl. streaming FID)")
    mu_f, s_f = calculate_activation_statistics(fake_acts)

    if fid_file:
        mu_r, s_r = load_stats_npz(fid_file, expect_img_size=img_size)
        fid = calculate_frechet_distance(mu_f, s_f, mu_r, s_r)
        print(f"FID: {fid:.4f}")
    elif args.real_dir:
        from PIL import Image

        # accept the store dir itself or a parent holding records/ (the
        # prepare_data default layout), mirroring train.py's resolution
        if os.path.exists(os.path.join(args.real_dir, "records", "index.bin")):
            args.real_dir = os.path.join(args.real_dir, "records")
        if os.path.exists(os.path.join(args.real_dir, "index.bin")):
            # a prepare_data record store (the artifact a real-image user
            # already has) scores directly — no PNG re-export needed
            from sdface_gan_tpu.data import MultiResolutionDataset

            def real_iter():
                ds = MultiResolutionDataset(args.real_dir, resolution=img_size,
                                            hflip=False)
                try:
                    for i in range(min(len(ds), args.n_images)):
                        yield ds[i][0][None]
                finally:
                    ds.close()
        else:
            def real_iter():
                names = sorted(os.listdir(args.real_dir))[: args.n_images]
                for name in names:
                    img = Image.open(os.path.join(args.real_dir, name)).convert("RGB")
                    img = img.resize((img_size, img_size), Image.LANCZOS)
                    arr = np.asarray(img, np.float32) / 127.5 - 1.0
                    yield arr[None]

        real_acts = compute_activations(inc, real_iter(), batch_size=args.batch)
        mu_r, s_r = calculate_activation_statistics(real_acts)
        fid = calculate_frechet_distance(mu_f, s_f, mu_r, s_r)
        kid_mean, kid_std = calculate_kid(fake_acts, real_acts)
        print(f"FID: {fid:.4f}  KID: {kid_mean:.6f} +- {kid_std:.6f}")
    else:
        # unreachable with --no_dump (the up-front source check fails fast)
        print("no real stats available (pass --fid_file or --real_dir); "
              "images dumped for external scoring")


if __name__ == "__main__":
    main()
