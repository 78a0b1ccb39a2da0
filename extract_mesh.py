#!/usr/bin/env python
"""GIRAFFE mesh extraction CLI (reference ``extract_mesh.py``): dense
density grid over the object bbox -> alpha -> marching cubes -> .ply."""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Extract GIRAFFE meshes.")
    p.add_argument("--config", type=str, default="configs/256res/ffhq_256.yaml")
    p.add_argument("--n_meshes", type=int, default=4)
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--level", type=float, default=0.005)
    args = p.parse_args(argv)

    import jax

    from sdface_gan_tpu.config import load_config
    from sdface_gan_tpu.config.yaml_config import default_config_path
    from sdface_gan_tpu.giraffe.config import giraffe_config_from_yaml
    from sdface_gan_tpu.giraffe.generator import init_giraffe, sample_latent_codes
    from sdface_gan_tpu.giraffe.rendering import extract_giraffe_mesh
    from sdface_gan_tpu.utils.checkpoints import CheckpointIO

    cfg = load_config(args.config, default_config_path())
    gcfg = giraffe_config_from_yaml(cfg)
    out_dir = cfg["training"]["out_dir"]
    mesh_dir = os.path.join(out_dir, "meshes")
    os.makedirs(mesh_dir, exist_ok=True)

    template = init_giraffe(jax.random.PRNGKey(0), gcfg)
    ckpt = CheckpointIO(out_dir)
    name = "model_best" if ckpt.exists("model_best") else "model"
    g = ckpt.load(name, {"g_ema": template})["g_ema"]

    key = jax.random.PRNGKey(0)
    for i in range(args.n_meshes):
        key, sub = jax.random.split(key)
        codes = sample_latent_codes(sub, gcfg, 1, tmp=0.65)
        mesh = extract_giraffe_mesh(
            g, gcfg, codes, resolution=args.resolution, level=args.level
        )
        path = os.path.join(mesh_dir, f"mesh_{i:03d}.ply")
        mesh.export_ply(path)
        print(f"{path}: {len(mesh.verts)} verts, {len(mesh.faces)} faces")


if __name__ == "__main__":
    main()
