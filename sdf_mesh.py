#!/usr/bin/env python
"""Multi-view rendering + marching-cubes mesh export.

Rebuild of the reference ``sdf_mesh.py``: per identity, render an 8-view
camera sweep at truncation 0.5 from the 256^2 full-pipeline generator, and
probe a 128^3 SDF volume with a second, weight-sharing surface generator
(``renderer_spatial_output_dim=128, N_samples=128, full_pipeline=False``,
``sdf_mesh.py:243-261``); frustum-align the volume and export a .obj via
the native marching cubes.  Test-mode rendering options follow
``sdf_mesh.py:211-214``: static viewdirs, forced background, no perturb.
"""

from __future__ import annotations

import argparse
import os
from dataclasses import replace


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Render views + extract meshes.")
    p.add_argument("--config", type=str, default="configs/256res/ffhq_256_sdf.yaml")
    p.add_argument("--sdf", type=int, default=1)
    p.add_argument("--ngp", type=int, default=0)
    p.add_argument("--fc", type=int, default=0)
    p.add_argument("--identities", type=int, default=8)
    p.add_argument("--size", type=int, default=None,
                   help="decoder output resolution (default: the config's "
                        "data.img_size) — must match the checkpoint")
    p.add_argument("--truncation_ratio", type=float, default=0.5)
    p.add_argument("--surface_res", type=int, default=128)
    p.add_argument("--no_surface_renderings", action="store_true")
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
    from sdface_gan_tpu.geometry.mesh import align_volume, extract_mesh_with_marching_cubes
    from sdface_gan_tpu.models.generator import (
        generator_forward,
        init_generator,
        mean_latent,
    )
    from sdface_gan_tpu.training.loop import copy_matching
    from sdface_gan_tpu.utils.checkpoints import load_checkpoint
    from sdface_gan_tpu.utils.images import save_image

    cfg = load_config(args.config, default_config_path())
    expname = cfg["training"]["out_dir"].split("/")[1]
    out_base = os.path.join("./out", expname)
    if args.size is None:
        args.size = int(cfg["data"].get("img_size", 256))
    render_dir = os.path.join(out_base, "renders")
    mesh_dir = os.path.join(out_base, "meshes")
    os.makedirs(render_dir, exist_ok=True)
    os.makedirs(mesh_dir, exist_ok=True)

    opt = get_vol_render_opt(expname, False, ngp=resolve_renderer_type(cfg, bool(args.ngp)), fc=bool(args.fc),
                             size=args.size,
                             extra_argv=rendering_overrides(cfg))
    # test-mode rendering overrides (reference sdf_mesh.py:211-214)
    gcfg = generator_config(opt, stage_a=False)
    gcfg = replace(
        gcfg,
        renderer=replace(
            gcfg.renderer, static_viewdirs=True, force_background=True, perturb=0.0
        ),
    )
    # surface prober: 128^2 rays x 128 samples, renderer only
    surf_cfg = replace(
        gcfg,
        full_pipeline=False,
        renderer=replace(
            gcfg.renderer,
            out_im_res=args.surface_res,
            n_samples=args.surface_res,
            return_sdf=True,
            return_xyz=True,
        ),
    )

    template = init_generator(jax.random.PRNGKey(0), gcfg)
    ck = load_checkpoint(out_base, "full_pipeline", {"g_ema": template})
    g_ema = ck["g_ema"]
    surf_params = copy_matching(init_generator(jax.random.PRNGKey(0), surf_cfg), g_ema)

    # NGP + yaml `rendering: pack_mb`: corner-packed inference tables for
    # both the view sweep and the surface probe (docs/PERFORMANCE.md)
    from sdface_gan_tpu.models.generator import pack_generator_for_inference

    g_ema = pack_generator_for_inference(g_ema, gcfg)
    surf_params = pack_generator_for_inference(surf_params, surf_cfg)

    # Mesh over every device that divides BOTH the 8-view sweep batch and
    # the probe's ray rows (surface_res % n == 0); a v5e-8 renders each
    # view / each 16-row band on its own chip, one chip degenerates to jit.
    from sdface_gan_tpu.models.generator import map_style
    from sdface_gan_tpu.parallel import data_parallel_jit, make_mesh, replicate
    from sdface_gan_tpu.parallel.rays import render_ray_sharded

    devices = jax.devices()
    n_dev = len(devices)
    while 8 % n_dev or args.surface_res % n_dev:
        n_dev -= 1
    mesh = make_mesh(devices[:n_dev])
    if n_dev > 1:
        print(f"rendering data-parallel over {n_dev} devices")
    g_ema, surf_params = replicate((g_ema, surf_params), mesh)

    trunc = mean_latent(g_ema, gcfg, jax.random.PRNGKey(1))

    def _render_views(params, z, extr, focal, near, far):
        out = generator_forward(
            params, gcfg, [z], extr, focal, near, far,
            truncation=args.truncation_ratio, truncation_latent=trunc,
            randomize_noise=False,
        )
        return out.rgb, out.thumb_rgb

    # 8 sweep views batch-sharded over the mesh
    render_views = data_parallel_jit(_render_views, mesh,
                                     batch_argnums=(1, 2, 3, 4, 5))

    @jax.jit
    def probe_surface(params, z, extr, focal, near, far):
        """128^2 x 128-sample SDF probe with ray ROWS sharded over the mesh
        (replaces the reference's host-side chunk loop, sdf_mesh.py:128-157)."""
        style = map_style(params, z)
        style = trunc[0] + args.truncation_ratio * (style - trunc[0])
        out = render_ray_sharded(
            params["renderer"], surf_cfg.renderer, focal, extr, near, far,
            style, mesh=mesh,
        )
        return out.sdf

    key = jax.random.PRNGKey(0)
    res = gcfg.renderer.out_im_res
    for ident in range(args.identities):
        key, kz, kc = jax.random.split(key, 3)
        z = jax.random.normal(kz, (1, gcfg.style_dim))
        z8 = jnp.repeat(z, 8, axis=0)
        cams = generate_camera_params(res, kc, batch=1, sweep=True)
        rgb, thumb = render_views(
            g_ema, z8, cams.extrinsics, cams.focal, cams.near, cams.far
        )
        for v in range(8):
            save_image(np.asarray(rgb[v]),
                       os.path.join(render_dir, f"id{ident:03d}_view{v}.png"))
            save_image(np.asarray(thumb[v]),
                       os.path.join(render_dir, f"id{ident:03d}_view{v}_thumb.png"))

        if args.no_surface_renderings:
            continue
        # frontal camera for the surface probe (azim=elev=0)
        front = generate_camera_params(
            args.surface_res, None, batch=1,
            locations=jnp.zeros((1, 2)),
        )
        sdf = probe_surface(
            surf_params, z, front.extrinsics, front.focal, front.near, front.far
        )  # [1, R, R, S, 1]
        s = np.asarray(sdf)
        if s.min() > 0 or s.max() < 0:
            # marching cubes would still emit the frustum shell (all-negative)
            # or nothing (all-positive) — neither is a surface
            print(f"id{ident}: WARNING sdf has no zero crossing "
                  f"[{s.min():+.4f},{s.max():+.4f}] — degenerate geometry; "
                  "diagnose with probe_geometry.py (docs/TRAINING_RUN.md)")
        aligned = np.asarray(align_volume(sdf))
        try:
            mesh = extract_mesh_with_marching_cubes(aligned)
        except ValueError as e:
            print(f"id{ident}: marching cubes failed ({e}); "
                  "the SDF may not cross zero — train longer or check init")
            continue
        mesh.export_obj(os.path.join(mesh_dir, f"id{ident:03d}.obj"))
        print(f"id{ident}: {len(mesh.verts)} verts, {len(mesh.faces)} faces")


if __name__ == "__main__":
    main()
