#!/usr/bin/env python
"""Geometry health check for trained SDF checkpoints.

Not a reference CLI: added after two measured degenerate regimes in which
stage-A training keeps rendering convincing images while the SDF carries no
surface (docs/TRAINING_RUN.md):

* **billboard** — SDF positive everywhere, all compositing weight on the
  far-plane background sample (reference bg formulation); fg_mass -> 0.
* **fog** — SDF negative everywhere, a uniform low-density field that
  self-paints the background from inside the frustum; fg_mass -> 1.

Neither is visible in the loss curves, and fg_mass alone cannot separate
fog from geometry.  This CLI probes a frontal SDF volume per identity and
reports the numbers that do separate them: zero-crossing fraction, SDF
range, mean occupancy sigmoid(-sdf/beta), per-pixel background weight, and
(optionally) marching-cubes vertex counts.  The probe rig matches
``sdf_mesh.py``'s surface generator (reference ``sdf_mesh.py:243-261``).
"""

from __future__ import annotations

import argparse
import os
from dataclasses import replace


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Probe SDF geometry health.")
    p.add_argument("--config", type=str, default="configs/256res/ffhq_256_sdf.yaml")
    p.add_argument("--sdf", type=int, default=1)
    p.add_argument("--ngp", type=int, default=0)
    p.add_argument("--fc", type=int, default=0)
    p.add_argument("--stage", choices=["a", "b"], default="a",
                   help="a: volume_renderer checkpoints; b: full_pipeline")
    p.add_argument("--ckpt", type=str, default=None,
                   help="checkpoint name (default: final artifact, falling "
                        "back to the latest models_*)")
    p.add_argument("--which", type=str, default="g_ema", choices=["g", "g_ema"])
    p.add_argument("--identities", type=int, default=4)
    p.add_argument("--res", type=int, default=64,
                   help="probe volume resolution (res^2 rays x res samples)")
    p.add_argument("--size", type=int, default=None,
                   help="decoder output resolution (default: the config's "
                        "data.img_size) — must match the checkpoint for "
                        "stage-b probes")
    p.add_argument("--mesh", action="store_true",
                   help="also run marching cubes and report vert/face counts")
    p.add_argument("--out", type=str, default=None,
                   help="experiment dir override (default ./out/<expname> "
                        "from the config)")
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
    from sdface_gan_tpu.geometry.mesh import (
        align_volume,
        extract_mesh_with_marching_cubes,
    )
    from sdface_gan_tpu.models.generator import init_generator, map_style
    from sdface_gan_tpu.models.renderer import render
    from sdface_gan_tpu.training.loop import copy_matching
    from sdface_gan_tpu.utils.checkpoints import (
        latest_checkpoint_step,
        load_checkpoint,
    )

    cfg = load_config(args.config, default_config_path())
    expname = cfg["training"]["out_dir"].split("/")[1]
    out_base = args.out or os.path.join("./out", expname)
    if args.size is None:
        args.size = int(cfg["data"]["img_size"])

    stage_a = args.stage == "a"
    opt = get_vol_render_opt(expname, stage_a, ngp=resolve_renderer_type(cfg, bool(args.ngp)),
                             fc=bool(args.fc), size=args.size,
                             extra_argv=rendering_overrides(cfg))
    gcfg = generator_config(opt, stage_a=stage_a)
    rcfg = replace(
        gcfg.renderer,
        out_im_res=args.res,
        n_samples=args.res,
        return_sdf=True,
        return_xyz=True,
        perturb=0.0,
        static_viewdirs=True,
    )

    ckpt_dir = out_base if not stage_a else os.path.join(out_base, "volume_renderer")
    name = args.ckpt
    if name is None:
        final = "vol_renderer" if stage_a else "full_pipeline"
        if os.path.isdir(os.path.join(ckpt_dir, final)):
            name = final
        else:
            step = latest_checkpoint_step(ckpt_dir)
            if step is None:
                raise SystemExit(f"no checkpoint found under {ckpt_dir}")
            name = f"models_{step:07d}"
    print(f"probing {ckpt_dir}/{name} [{args.which}] at {args.res}^3")

    template = init_generator(jax.random.PRNGKey(0), gcfg)
    ck = load_checkpoint(ckpt_dir, name, {args.which: template})
    params = ck[args.which]
    if not stage_a:
        # weight-sharing surface prober (renderer subtree only)
        surf_cfg = replace(gcfg, full_pipeline=False, renderer=rcfg)
        params = copy_matching(init_generator(jax.random.PRNGKey(0), surf_cfg), params)

    beta = float(np.asarray(params["renderer"]["sigmoid_beta"]).ravel()[0])
    front = generate_camera_params(args.res, None, batch=1,
                                   locations=jnp.zeros((1, 2)))

    @jax.jit
    def probe(p, z):
        style = map_style(p, z)
        return render(p["renderer"], rcfg, front.focal, front.extrinsics,
                      front.near, front.far, style)

    verdicts = []
    for ident in range(args.identities):
        z = jax.random.normal(jax.random.PRNGKey(100 + ident), (1, gcfg.style_dim))
        out = probe(params, z)
        s = np.asarray(out.sdf)
        mask = np.asarray(out.mask)  # per-pixel background weight
        crossing = float(np.mean((s.min(axis=-2) < 0) & (s.max(axis=-2) > 0)))
        occ = float(np.mean(1.0 / (1.0 + np.exp(np.clip(s / beta, -30, 30)))))
        line = (f"id{ident}: sdf[{s.min():+.4f},{s.max():+.4f}] "
                f"ray-crossing {crossing:.3f} occupancy {occ:.3f} "
                f"bg-weight mean {mask.mean():.3f} [{mask.min():.3f},{mask.max():.3f}]")
        if args.mesh:
            aligned = np.asarray(align_volume(out.sdf))
            try:
                m = extract_mesh_with_marching_cubes(aligned)
                line += f" mesh {len(m.verts)}v/{len(m.faces)}f"
            except ValueError:
                line += " mesh EMPTY"
        print(line)
        if s.min() > 0:
            verdicts.append("BILLBOARD (sdf positive everywhere: no surface, "
                            "images live on the background sample)")
        elif s.max() < 0:
            verdicts.append("FOG (sdf negative everywhere: background "
                            "self-painted by density; meshes are the frustum shell)")
        elif crossing < 0.01:
            verdicts.append("WEAK (zero crossing on <1% of rays)")
        else:
            verdicts.append("GEOMETRY (zero-level set present)")

    print(f"beta {beta:.4f}")
    print("verdict:", max(set(verdicts), key=verdicts.count))


if __name__ == "__main__":
    main()
