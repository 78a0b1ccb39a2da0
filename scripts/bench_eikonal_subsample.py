#!/usr/bin/env python
"""Measure the stage-A G step with the subsampled eikonal term.

The G step is bound by the eikonal reverse-over-reverse spanning the FULL
B*64*64*24-point field graph (docs/PERFORMANCE.md; jvp rewrite measured
negative, bf16 measured 2.07x).  ``RendererConfig.eikonal_subsample = M``
detaches the second-order pass from the render graph entirely: the main
render becomes a plain forward+backward and ||grad sdf||-1 is penalized at
M fresh frustum points (VolSDF/IGR practice).  Second-order cost drops
B*98304 -> B*M.

With the double-backprop gone, remat may be pure waste (bf16 already fits
no-remat), so the sweep crosses M with remat.  Same seeds per row.

Run on the real chip: ``python scripts/bench_eikonal_subsample.py``.
Reference anchor for the semantics being relaxed:
``/root/reference/im2scene/training_utils.py:410-424``.
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


def measure(subsample: int, remat: bool, dtype: str = "bfloat16",
            iters: int = 20, batch: int = 8):
    gcfg = GeneratorConfig(
        size=256, style_dim=256, full_pipeline=False,
        renderer=RendererConfig(
            type="sdf", out_im_res=64, n_samples=24, style_dim=256,
            width=256, depth=8, remat=remat, eikonal_subsample=subsample,
        ),
    )
    dcfg = VolumeRenderDiscConfig(in_res=64)
    hp = TrainHParams(batch=batch, style_dim=256, g_param_dtype=dtype)
    g_tx, _ = stage_a_optimizers()

    key = jax.random.PRNGKey(0)
    kg, kd = jax.random.split(key)
    g = init_generator(kg, gcfg)
    d = init_volume_render_discriminator(kd, dcfg)
    g_state = g_tx.init(g)
    step = jax.jit(make_stage_a_g_step(gcfg, dcfg, hp, g_tx))
    g_ema = jax.tree_util.tree_map(jnp.copy, g)

    try:
        g1, gs1, ge1, m = step(g, d, g_state, g_ema, jax.random.PRNGKey(1))
        first = {k: round(float(v), 4) for k, v in m.items()}
        t0 = time.time()
        for i in range(iters):
            g1, gs1, ge1, m = step(g1, d, gs1, ge1, jax.random.fold_in(key, i))
        v = float(m["g"])  # sync by fetching (block_until_ready no-op here)
        dt = (time.time() - t0) / iters
        print(json.dumps({
            "eikonal_subsample": subsample, "remat": remat, "dtype": dtype,
            "batch": batch, "g_step_ms": round(dt * 1000, 1),
            "it_per_s": round(1 / dt, 3), "first_step_metrics": first,
            "g_loss_final": round(v, 4),
        }), flush=True)
        return dt
    except Exception as e:
        print(json.dumps({
            "eikonal_subsample": subsample, "remat": remat, "dtype": dtype,
            "batch": batch, "error": f"{type(e).__name__}: {str(e)[:200]}",
        }), flush=True)
        return None


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    measure(0, True, batch=batch)          # production baseline (bf16+remat)
    measure(8192, True, batch=batch)       # 1/12 of the rendered points
    measure(8192, False, batch=batch)      # no double-backprop: drop remat?
    measure(4096, False, batch=batch)
    measure(0, True, dtype="float32", batch=batch)   # f32 context row
    measure(8192, False, dtype="float32", batch=batch)
