#!/usr/bin/env python
"""Train CLI — same surface as the reference ``train.py``.

Examples (reference README):
  python train.py --config configs/256res/ffhq_256_sdf.yaml --sdf 1
  python train.py --config configs/256res/ffhq_256_sdf_ngp.yaml --sdf 1 --ngp 1
  python train.py --config configs/256res/ffhq_256.yaml            # GIRAFFE

Stage flow for ``--sdf 1`` (reference ``train.py:70-145``): stage A
(volume renderer) runs unless ``out/<exp>/vol_renderer`` exists; stage B
(full pipeline) runs unless ``out/<exp>/full_pipeline`` exists; ``--wod``
skips stage A.
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train an SDFace-GAN TPU model.")
    p.add_argument("--config", type=str, default="configs/256res/ffhq_256_sdf.yaml")
    p.add_argument("--sdf", type=int, default=0)
    p.add_argument("--ngp", type=int, default=0)
    p.add_argument("--fc", type=int, default=0)
    p.add_argument("--wod", type=int, default=0)
    p.add_argument("--vae", type=int, default=0)
    p.add_argument("--psp", type=int, default=0)
    p.add_argument("--small_net", type=int, default=0)
    p.add_argument("--i_embed", type=int, default=0)
    p.add_argument("--i_embed_views", type=int, default=0)
    p.add_argument("--finest_res", type=int, default=512)
    p.add_argument("--log2_hashmap_size", type=int, default=19)
    p.add_argument("--exit-after", dest="exit_after", type=int, default=-1)
    p.add_argument("--dataset_path", type=str, default=None,
                   help="record-store dir (overrides the yaml data path)")
    p.add_argument("--iters", type=int, default=None,
                   help="override per-stage iteration count (for smoke runs)")
    p.add_argument("--sphere_init_iters", type=int, default=10000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_every", type=int, default=10000)
    p.add_argument("--sample_every", type=int, default=1000)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--irse_weights", type=str, default=None,
                   help="model_ir_se50.pth for the stage-C ID loss + pSp warm start")
    p.add_argument("--lpips_weights", type=str, default=None,
                   help="torch archive {'alex': ..., 'lin': ...} for stage-C LPIPS")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)

    from sdface_gan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from sdface_gan_tpu.config import load_config
    from sdface_gan_tpu.config.yaml_config import default_config_path

    cfg = load_config(args.config, default_config_path())

    if args.sdf == 1:
        train_sdf(args, cfg)
    else:
        train_giraffe_family(args, cfg)


def train_sdf(args, cfg) -> None:
    from sdface_gan_tpu.config.build import (
        discriminator_configs,
        generator_config,
        train_hparams,
    )
    from sdface_gan_tpu.config.sdf_options import (
        get_vol_render_opt,
        rendering_overrides,
        resolve_renderer_type,
    )
    from sdface_gan_tpu.data import (
        DataLoader,
        MultiResolutionDataset,
        resolve_record_dir,
    )
    from sdface_gan_tpu.training.loop import train_full_pipeline, train_volume_renderer
    from sdface_gan_tpu.utils.checkpoints import checkpoint_exists

    import jax

    expname = cfg["training"]["out_dir"].split("/")[1]
    out_base = os.path.join("./out", expname)
    # Stage A keeps its periodic models_* in its own subdir (reference
    # layout <exp>/volume_renderer/models_*.pt, training_utils.py:318-327):
    # sharing out_base would make stage B's auto-resume scan pick up
    # stage-A checkpoints with an incompatible (decoder-less) tree.
    vr_dir = os.path.join(out_base, "volume_renderer")
    need_a = not checkpoint_exists(vr_dir, "vol_renderer")
    need_b = not checkpoint_exists(out_base, "full_pipeline")
    if args.wod:
        need_a, need_b = False, True

    exit_after = args.exit_after if args.exit_after > 0 else None
    data_path = args.dataset_path or resolve_record_dir(cfg["data"]["path"])
    img_size = cfg["data"].get("img_size", 256)

    if need_a:
        opt = get_vol_render_opt(expname, True, ngp=resolve_renderer_type(cfg, bool(args.ngp)), fc=bool(args.fc),
                                 wod=bool(args.wod), size=img_size, batch=args.batch,
                                 extra_argv=rendering_overrides(cfg))
        gcfg = generator_config(opt, stage_a=True)
        vrd_cfg, _ = discriminator_configs(opt)
        hp = train_hparams(opt)
        ds = MultiResolutionDataset(data_path, resolution=img_size,
                                    nerf_resolution=gcfg.renderer.out_im_res)
        try:
            with DataLoader(ds, batch_size=hp.batch, seed=args.seed,
                            host_id=jax.process_index(),
                            num_hosts=jax.process_count()) as loader:
                train_volume_renderer(
                    loader, gcfg, vrd_cfg, hp, vr_dir,
                    iters=args.iters or 200001,
                    sphere_init_iters=args.sphere_init_iters,
                    seed=args.seed, exit_after=exit_after,
                    save_every=args.save_every, sample_every=args.sample_every,
                    log_every=args.log_every,
                )
        finally:
            ds.close()

    if need_b:
        opt = get_vol_render_opt(expname, False, ngp=resolve_renderer_type(cfg, bool(args.ngp)), fc=bool(args.fc),
                                 wod=bool(args.wod), size=img_size, batch=args.batch,
                                 extra_argv=rendering_overrides(cfg))
        gcfg = generator_config(opt, stage_a=False)
        _, sd_cfg = discriminator_configs(opt)
        hp = train_hparams(opt)
        ds = MultiResolutionDataset(data_path, resolution=img_size,
                                    nerf_resolution=gcfg.renderer.out_im_res)
        try:
            with DataLoader(ds, batch_size=hp.batch, seed=args.seed,
                            host_id=jax.process_index(),
                            num_hosts=jax.process_count()) as loader:
                train_full_pipeline(
                    loader, gcfg, sd_cfg, hp, out_base,
                    vol_renderer_dir=vr_dir,
                    init_from="sdf_init_models" if args.wod else "vol_renderer",
                    iters=args.iters or 300000, seed=args.seed,
                    exit_after=exit_after,
                    save_every=args.save_every, sample_every=args.sample_every,
                    log_every=args.log_every,
                )
        finally:
            ds.close()

    if args.vae or args.psp:
        from sdface_gan_tpu.training.encoder_loop import train_encoder_stage

        train_encoder_stage(
            args, cfg, out_base, iters=args.iters or 100000,
            exit_after=exit_after, save_every=args.save_every,
            sample_every=args.sample_every, log_every=args.log_every,
        )


def train_giraffe_family(args, cfg) -> None:
    method = cfg.get("method", "giraffe")
    if method == "gan2d":
        from sdface_gan_tpu.gan2d.train_loop import train_gan2d

        train_gan2d(args, cfg)
    else:
        from sdface_gan_tpu.giraffe.train_loop import train_giraffe

        train_giraffe(args, cfg)


if __name__ == "__main__":
    main()
