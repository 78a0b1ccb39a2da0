#!/usr/bin/env python
"""Sweep NGP hash-grid geometry for a TPU-tuned stage-A training config.

VERDICT r2 task 4: the reference's NGP defaults (16 levels, 2^19 table,
finest res 4096 — ``sdf_model.py:1534-1545``) train at 0.159 it/s on TPU
because the path is gather/scatter latency-bound: lookups scale with
``n_points * num_levels * 8 corners`` and the table gradient doubles the
traffic (docs/PERFORMANCE.md).  ``num_levels`` is therefore the primary
throughput knob, table size second (smaller tables collide more but
gather hotter).  This script measures the full stage-A D+G step at
production shapes (batch 4, 64^2 rays x 24 samples) across grid configs
on the real chip and prints one JSON line each; the winner ships as
``configs/256res/ffhq_256_sdf_ngp_tpu.yaml``.
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
from sdface_gan_tpu.training.steps import (
    TrainHParams,
    make_stage_a_d_step,
    make_stage_a_g_step,
)


def sync(x) -> float:
    import jax.numpy as jnp

    return float(jnp.asarray(x).reshape(-1)[0])


def measure(num_levels: int, log2_hashmap_size: int, finest_res: int,
            level_dim: int = 2, batch: int = 4, iters: int = 5):
    gcfg = GeneratorConfig(
        size=64, style_dim=256, full_pipeline=False,
        renderer=RendererConfig(
            type="ngp", out_im_res=64, n_samples=24, style_dim=256, remat=True,
            ngp_num_levels=num_levels, ngp_log2_hashmap_size=log2_hashmap_size,
            ngp_finest_res=finest_res, ngp_level_dim=level_dim,
        ),
    )
    dcfg = VolumeRenderDiscConfig(in_res=64)
    hp = TrainHParams(batch=batch, style_dim=256)
    kg, kd, kk = jax.random.split(jax.random.PRNGKey(0), 3)
    g = init_generator(kg, gcfg)
    d = init_volume_render_discriminator(kd, dcfg)
    g_tx, d_tx = stage_a_optimizers()
    g_state, d_state = g_tx.init(g), d_tx.init(d)
    reals = jax.random.uniform(kk, (batch, 64, 64, 3), minval=-1, maxval=1)

    d_step = jax.jit(make_stage_a_d_step(gcfg, dcfg, hp, d_tx))
    g_step = jax.jit(make_stage_a_g_step(gcfg, dcfg, hp, g_tx))

    def one_iter(g, d, g_state, d_state, key):
        k1, k2 = jax.random.split(key)
        d, d_state, _ = d_step(g, d, d_state, k1, reals)
        g, g_state, g_ema, gm = g_step(g, d, g_state, g, k2)
        return g, d, g_state, d_state, gm["g"]

    try:
        key = jax.random.PRNGKey(7)
        state = (g, d, g_state, d_state)
        for _ in range(2):
            *state, loss = one_iter(*state, key)
        sync(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            *state, loss = one_iter(*state, key)
        sync(loss)
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "num_levels": num_levels, "log2_T": log2_hashmap_size,
            "finest_res": finest_res, "level_dim": level_dim, "it_per_s": round(1.0 / dt, 3),
            "step_ms": round(dt * 1000, 1),
        }), flush=True)
    except Exception as e:
        print(json.dumps({
            "num_levels": num_levels, "log2_T": log2_hashmap_size,
            "finest_res": finest_res, "level_dim": level_dim,
            "error": f"{type(e).__name__}: {str(e)[:160]}",
        }), flush=True)


if __name__ == "__main__":
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    # reference default first (regression anchor), then the sweep
    for nl, t, fr in [
        (16, 19, 4096),   # reference default — 0.159 it/s measured r2
        (8, 19, 1024),    # halve levels, coarser finest
        (8, 17, 1024),    # + smaller table (hotter gathers)
        (6, 17, 512),
        (4, 16, 256),     # aggressive: 4 levels, 64K table
        (4, 15, 256),
    ]:
        measure(nl, t, fr)
