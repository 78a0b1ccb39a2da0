#!/usr/bin/env python
"""Measure the stage-A G step with a bf16-cast field (mixed precision).

The 355 ms stage-A G step is bound by the eikonal reverse-over-reverse
under remat: the [B*64*64*24, 256] per-layer activations cost ~21 GB to
store at batch 8 in f32, forcing recompute (docs/PERFORMANCE.md).  The
forward-mode rewrite was measured and rejected (it re-saves residuals per
tangent).  The remaining untried lever is PRECISION: casting the master
params to bf16 inside the loss closure (``TrainHParams.g_param_dtype``)
halves both the activation bytes and the residual bytes — potentially
(a) speeding up the remat path directly and (b) letting the no-remat
graph fit in 15.75 GB HBM, eliminating recompute altogether.

Grads flow back through the cast and arrive f32; optimizer/EMA state stays
full precision (standard mixed-precision training).  The same PRNG seeds
are used for every config, so ``g_loss``/metric deltas across rows measure
the numerical effect of bf16 on an identical step.

Run on the real chip: ``python scripts/bench_stageA_bf16.py``.
Reference anchor for the step being measured:
``/root/reference/im2scene/training_utils.py:399-454``.
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


def measure(g_param_dtype: str, remat: bool, iters: int = 20, batch: int = 8):
    gcfg = GeneratorConfig(
        size=256, style_dim=256, full_pipeline=False,
        renderer=RendererConfig(
            type="sdf", out_im_res=64, n_samples=24, style_dim=256,
            width=256, depth=8, remat=remat,
        ),
    )
    dcfg = VolumeRenderDiscConfig(in_res=64)
    hp = TrainHParams(batch=batch, style_dim=256, g_param_dtype=g_param_dtype)
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
            "g_param_dtype": g_param_dtype, "remat": remat, "batch": batch,
            "g_step_ms": round(dt * 1000, 1), "it_per_s": round(1 / dt, 3),
            "first_step_metrics": first, "g_loss_final": round(v, 4),
        }), flush=True)
        return dt
    except Exception as e:  # OOM configs report and continue
        print(json.dumps({
            "g_param_dtype": g_param_dtype, "remat": remat, "batch": batch,
            "error": f"{type(e).__name__}: {str(e)[:200]}",
        }), flush=True)
        return None


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    measure("float32", True, batch=batch)   # production baseline
    measure("bfloat16", True, batch=batch)  # mixed precision, remat kept
    measure("bfloat16", False, batch=batch)  # the hypothesis: fits w/o remat
