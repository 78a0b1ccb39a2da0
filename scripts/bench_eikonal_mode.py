#!/usr/bin/env python
"""Measure the stage-A G step with reverse- vs forward-mode eikonal.

VERDICT r2 task 5: today's eikonal is a jax.vjp pullback nested under
jax.grad (reverse-over-reverse), which forces renderer remat.  The
gradient d sdf/d pts is only 3-dimensional, so three jvp tangents compute
it forward-mode with O(1) activation memory, making the outer pass
reverse-over-forward — potentially dropping remat and a chunk of the
355 ms G step.  This script measures all viable combinations at production
stage-A shapes (64^2 x 24 samples, width 256, depth 8, batch 8) on the
real chip and prints one JSON line per config.
"""

from __future__ import annotations

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdface_gan_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from sdface_gan_tpu.models.discriminator import (
    VolumeRenderDiscConfig,
    init_volume_render_discriminator,
)
from sdface_gan_tpu.models.generator import GeneratorConfig, init_generator
from sdface_gan_tpu.models.renderer import RendererConfig
from sdface_gan_tpu.training.optim import stage_a_optimizers
from sdface_gan_tpu.training.steps import TrainHParams, make_stage_a_g_step


def measure(eikonal_mode: str, remat: bool, iters: int = 20, batch: int = 8):
    gcfg = GeneratorConfig(
        size=256, style_dim=256, full_pipeline=False,
        renderer=RendererConfig(
            type="sdf", out_im_res=64, n_samples=24, style_dim=256,
            width=256, depth=8, eikonal_mode=eikonal_mode, remat=remat,
        ),
    )
    dcfg = VolumeRenderDiscConfig(in_res=64)
    hp = TrainHParams(batch=batch, style_dim=256)
    g_tx, _ = stage_a_optimizers()

    key = jax.random.PRNGKey(0)
    kg, kd = jax.random.split(key)
    g = init_generator(kg, gcfg)
    d = init_volume_render_discriminator(kd, dcfg)
    g_state = g_tx.init(g)
    step = jax.jit(make_stage_a_g_step(gcfg, dcfg, hp, g_tx))
    g_ema = jax.tree_util.tree_map(jnp.copy, g)

    try:
        # warmup/compile
        g1, gs1, ge1, m = step(g, d, g_state, g_ema, jax.random.PRNGKey(1))
        float(m["g"])  # sync (block_until_ready is a no-op on tunneled arrays)
        t0 = time.time()
        for i in range(iters):
            g1, gs1, ge1, m = step(g1, d, gs1, ge1, jax.random.fold_in(key, i))
        v = float(m["g"])
        dt = (time.time() - t0) / iters
        print(json.dumps({
            "eikonal_mode": eikonal_mode, "remat": remat, "batch": batch,
            "g_step_ms": round(dt * 1000, 1), "it_per_s": round(1 / dt, 3),
            "g_loss": round(v, 4),
        }), flush=True)
        return dt
    except Exception as e:  # OOM configs report and continue
        print(json.dumps({
            "eikonal_mode": eikonal_mode, "remat": remat, "batch": batch,
            "error": f"{type(e).__name__}: {str(e)[:160]}",
        }), flush=True)
        return None


if __name__ == "__main__":
    for mode, remat in [("vjp", True), ("jvp", True), ("jvp", False)]:
        measure(mode, remat)
