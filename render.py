#!/usr/bin/env python
"""GIRAFFE render-program driver (reference ``render.py``): load a trained
model and run the yaml's ``rendering.render_program`` list."""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Render a GIRAFFE model.")
    p.add_argument("--config", type=str, default="configs/256res/ffhq_256.yaml")
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--n_steps", type=int, default=16)
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

    for program in cfg["rendering"].get("render_program", ["object_rotation"]):
        print(f"rendering program: {program}")
        render_program(g, gcfg, program, render_dir,
                       n_samples=args.n_samples, n_steps=args.n_steps)


if __name__ == "__main__":
    main()
