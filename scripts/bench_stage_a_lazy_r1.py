#!/usr/bin/env python
"""Measure the stage-A lazy-R1 knob (``TrainHParams.a_d_reg_every``).

The reference penalizes R1 on EVERY stage-A D step
(``training_utils.py:345-397``); R1 is a double backward through the
64^2 CoordConv D, so it is pure overhead on the steps it could be
skipped on.  ``a_d_reg_every > 1`` applies the StyleGAN2 lazy-reg
convention (penalty scaled by the interval, optimizer lr/betas
ratio-adjusted) that stage B already uses for its D.

Rows, batch 8, bf16 G forward (the production TPU arm):

* stage A D step WITH R1 (the ``i % k == 0`` variant)
* stage A D step WITHOUT R1 (the other k-1 of every k steps)

The saving at interval k is (with - without) * (k-1)/k per D step.

Run on the real chip: ``python scripts/bench_stage_a_lazy_r1.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdface_gan_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax

from sdface_gan_tpu.models.discriminator import (
    VolumeRenderDiscConfig,
    init_volume_render_discriminator,
)
from sdface_gan_tpu.models.generator import GeneratorConfig, init_generator
from sdface_gan_tpu.models.renderer import RendererConfig
from sdface_gan_tpu.training.optim import stage_a_optimizers
from sdface_gan_tpu.training.steps import TrainHParams, make_stage_a_d_step

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8

A_GCFG = GeneratorConfig(
    size=256, style_dim=256, full_pipeline=False,
    renderer=RendererConfig(type="sdf", out_im_res=64, n_samples=24,
                            style_dim=256, width=256, depth=8),
)
A_DCFG = VolumeRenderDiscConfig(in_res=64)


def _time(step_fn, args, iters=20):
    out = step_fn(*args)
    float(jax.tree_util.tree_leaves(out[-1])[0])  # sync warmup + compile
    t0 = time.time()
    state = list(args)
    for _ in range(iters):
        out = step_fn(*state)
        state[1] = out[0]
    float(jax.tree_util.tree_leaves(out[-1])[0])
    dt = (time.time() - t0) / iters
    return dt, {k: round(float(v), 4) for k, v in out[-1].items()}


def main():
    kg, kd, kr = jax.random.split(jax.random.PRNGKey(0), 3)
    g = init_generator(kg, A_GCFG)
    d = init_volume_render_discriminator(kd, A_DCFG)
    _, d_tx = stage_a_optimizers()
    real = jax.random.uniform(kr, (BATCH, 64, 64, 3)) * 2 - 1
    hp = TrainHParams(batch=BATCH, style_dim=256, g_param_dtype="bfloat16")

    rows = {}
    for with_r1 in (True, False):
        step = jax.jit(make_stage_a_d_step(A_GCFG, A_DCFG, hp, d_tx, with_r1))
        ms, m = _time(step, (g, d, d_tx.init(d), jax.random.PRNGKey(1), real))
        rows[with_r1] = ms * 1000
        print(json.dumps({"step": "stageA_D", "with_r1": with_r1,
                          "batch": BATCH, "ms": round(ms * 1000, 1),
                          "metrics": m}), flush=True)

    for k in (4, 16):
        avg = (rows[True] + (k - 1) * rows[False]) / k
        print(json.dumps({"a_d_reg_every": k, "avg_d_step_ms": round(avg, 1),
                          "vs_every_step": round(rows[True] / avg, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
