#!/usr/bin/env python
"""Measure the D steps and the stage-B G step with the bf16 G forward.

``TrainHParams.g_param_dtype`` originally reached only the stage-A G-step
loss closure; the detached fake generation inside BOTH D steps and the
stage-B G-step closure still ran the generator in f32.  The fake forward
is pure inference (stop_gradient) and stage B's renderer half is frozen,
so casting them is precision-only — this script measures what that buys
at production shapes on the real chip.

Rows (same PRNG seeds across dtypes, so metric deltas are the numerical
effect of bf16 on an identical step):

* stage A D step, batch 8, 64^2 x 24 SIREN field  (reference
  ``training_utils.py:345-397`` — the fake G forward dominates)
* stage B D step (R1 variant), batch 8, 256^2 decoder on the frozen
  renderer (``training_utils.py:660-717``)
* stage B G step (nonsat + content), same shapes
  (``training_utils.py:721-745``)

Run on the real chip: ``python scripts/bench_mixed_precision_steps.py``.
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
import jax.numpy as jnp

from sdface_gan_tpu.models.discriminator import (
    StyleDiscConfig,
    VolumeRenderDiscConfig,
    init_style_discriminator,
    init_volume_render_discriminator,
)
from sdface_gan_tpu.models.generator import GeneratorConfig, init_generator
from sdface_gan_tpu.models.renderer import RendererConfig
from sdface_gan_tpu.training.optim import (
    decoder_only,
    stage_a_optimizers,
    stage_b_optimizers,
)
from sdface_gan_tpu.training.steps import (
    TrainHParams,
    make_stage_a_d_step,
    make_stage_b_d_step,
    make_stage_b_g_step,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8

A_GCFG = GeneratorConfig(
    size=256, style_dim=256, full_pipeline=False,
    renderer=RendererConfig(type="sdf", out_im_res=64, n_samples=24,
                            style_dim=256, width=256, depth=8),
)
B_GCFG = GeneratorConfig(
    size=256, style_dim=256, full_pipeline=True, freeze_renderer=True,
    renderer=RendererConfig(type="sdf", out_im_res=64, n_samples=24,
                            style_dim=256, width=256, depth=8),
)
A_DCFG = VolumeRenderDiscConfig(in_res=64)
B_DCFG = StyleDiscConfig(size=256)


def _time(step_fn, args, iters=20, chain_slot=0):
    """Warm up once, then time; sync by fetching a metric scalar.

    The warmup MUST be synced before the timer starts: the axon tunnel
    dispatches asynchronously and the remote compile (minutes for the big
    steps) would otherwise land inside the timed window."""
    out = step_fn(*args)
    float(jax.tree_util.tree_leaves(out[-1])[0])  # sync warmup + compile
    t0 = time.time()
    state = list(args)
    for i in range(iters):
        out = step_fn(*state)
        state[chain_slot] = out[0]  # chain a data dependency
    float(jax.tree_util.tree_leaves(out[-1])[0])  # sync
    dt = (time.time() - t0) / iters
    metrics = {k: round(float(v), 4) for k, v in out[-1].items()}
    return dt, metrics


def main():
    key = jax.random.PRNGKey(0)
    kg, kd, kd2, kr = jax.random.split(key, 4)
    ga = init_generator(kg, A_GCFG)
    da = init_volume_render_discriminator(kd, A_DCFG)
    gb = init_generator(kg, B_GCFG)
    db = init_style_discriminator(kd2, B_DCFG)
    g_tx_a, d_tx_a = stage_a_optimizers()
    g_tx_b, d_tx_b = stage_b_optimizers()
    g_tx_b = decoder_only(g_tx_b, gb)
    real_a = jax.random.uniform(kr, (BATCH, 64, 64, 3)) * 2 - 1
    real_b = jax.random.uniform(kr, (BATCH, 256, 256, 3)) * 2 - 1

    for dt_name in ("float32", "bfloat16"):
        hp = TrainHParams(batch=BATCH, style_dim=256, g_param_dtype=dt_name)

        step = jax.jit(make_stage_a_d_step(A_GCFG, A_DCFG, hp, d_tx_a))
        ms, m = _time(step, (ga, da, d_tx_a.init(da), jax.random.PRNGKey(1), real_a),
                      chain_slot=1)
        print(json.dumps({"step": "stageA_D", "g_param_dtype": dt_name,
                          "batch": BATCH, "ms": round(ms * 1000, 1),
                          "metrics": m}), flush=True)

        step = jax.jit(make_stage_b_d_step(B_GCFG, B_DCFG, hp, d_tx_b, True))
        ms, m = _time(step, (gb, db, d_tx_b.init(db), jax.random.PRNGKey(2), real_b),
                      chain_slot=1)
        print(json.dumps({"step": "stageB_D_r1", "g_param_dtype": dt_name,
                          "batch": BATCH, "ms": round(ms * 1000, 1),
                          "metrics": m}), flush=True)

        step = jax.jit(make_stage_b_g_step(B_GCFG, B_DCFG, hp, g_tx_b))
        ms, m = _time(step, (gb, db, g_tx_b.init(gb), jax.random.PRNGKey(3)),
                      chain_slot=0)
        print(json.dumps({"step": "stageB_G", "g_param_dtype": dt_name,
                          "batch": BATCH, "ms": round(ms * 1000, 1),
                          "metrics": m}), flush=True)


if __name__ == "__main__":
    main()
