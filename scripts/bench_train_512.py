#!/usr/bin/env python
"""512^2 stage-B training-step reality check (VERDICT r4 task 4).

The reference ships 512/1024 data prep (prepare_data.py:82) and a channel
table to 1024 (sdf_model.py:913-923) but no >256^2 training evidence.
This bench measures the three stage-B steps (D with R1 double-backprop,
G nonsat+content, path-reg) at 512^2 production widths over a batch
sweep, reporting ms/step, derived it/s, peak HBM when the backend exposes
it, and HBM fit per batch.

Configs come from `configs/512res/ffhq_512_sdf_tpu.yaml` through the
production loader (generator_config / discriminator_configs /
train_hparams), so the bench measures exactly what `train.py --config
configs/512res/ffhq_512_sdf_tpu.yaml --sdf 1` would run — including the
yaml's `g_param_dtype: bfloat16`.

Run on the real chip: ``python scripts/bench_train_512.py [batches...]``.
"""

from __future__ import annotations

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIG = "configs/512res/ffhq_512_sdf_tpu.yaml"


def _is_oom(e: Exception) -> bool:
    msg = str(e)
    return "RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower()


def _peak_hbm_gb():
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        return round(peak / 2**30, 2) if peak else None
    except Exception:  # backend without memory_stats (axon tunnel)
        return None


def main() -> None:
    import jax

    from sdface_gan_tpu.config import load_config
    from sdface_gan_tpu.config.build import (
        discriminator_configs,
        generator_config,
        train_hparams,
    )
    from sdface_gan_tpu.config.sdf_options import (
        get_vol_render_opt,
        rendering_overrides,
        resolve_renderer_type,
    )
    from sdface_gan_tpu.config.yaml_config import default_config_path
    from sdface_gan_tpu.models.discriminator import init_style_discriminator
    from sdface_gan_tpu.models.generator import init_generator
    from sdface_gan_tpu.training.optim import decoder_only, stage_b_optimizers
    from sdface_gan_tpu.training.steps import (
        make_stage_b_d_step,
        make_stage_b_g_step,
        make_stage_b_path_step,
    )
    from sdface_gan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    yml = load_config(CONFIG, default_config_path())
    img_size = int(yml["data"]["img_size"])
    opt = get_vol_render_opt(
        yml["training"]["out_dir"].split("/")[1], False,
        ngp=resolve_renderer_type(yml, False), size=img_size,
        extra_argv=rendering_overrides(yml),
    )
    gcfg = generator_config(opt, stage_a=False)
    _, dcfg = discriminator_configs(opt)
    hp0 = train_hparams(opt)
    assert gcfg.size == 512 and hp0.g_param_dtype == "bfloat16", (
        gcfg.size, hp0.g_param_dtype,
    )

    key = jax.random.PRNGKey(0)
    kg, kd, kr = jax.random.split(key, 3)
    g = init_generator(kg, gcfg)
    d = init_style_discriminator(kd, dcfg)
    g_tx, d_tx = stage_b_optimizers()
    g_tx = decoder_only(g_tx, g)

    def timed(step_fn, args, iters=10, chain_slot=0):
        out = step_fn(*args)
        float(jax.tree_util.tree_leaves(out[-1])[0])  # sync compile+warmup
        state = list(args)
        t0 = time.time()
        for _ in range(iters):
            out = step_fn(*state)
            state[chain_slot] = out[0]
        float(jax.tree_util.tree_leaves(out[-1])[0])
        return (time.time() - t0) / iters

    batches = [int(b) for b in sys.argv[1:]] or [2, 4, 8]
    for batch in batches:
        hp = replace(hp0, batch=batch)
        real = jax.random.uniform(kr, (batch, img_size, img_size, 3)) * 2 - 1
        row = {"bench": "512x512 stage-B steps", "batch": batch,
               "g_param_dtype": hp.g_param_dtype}
        try:
            step = jax.jit(make_stage_b_d_step(gcfg, dcfg, hp, d_tx, True))
            row["d_r1_ms"] = round(1e3 * timed(
                step, (g, d, d_tx.init(d), jax.random.PRNGKey(1), real),
                chain_slot=1), 1)
            step = jax.jit(make_stage_b_g_step(gcfg, dcfg, hp, g_tx))
            row["g_ms"] = round(1e3 * timed(
                step, (g, d, g_tx.init(g), jax.random.PRNGKey(2))), 1)
            step = jax.jit(make_stage_b_path_step(gcfg, hp, g_tx))
            row["path_ms"] = round(1e3 * timed(
                step, (g, g_tx.init(g), jax.numpy.zeros(()),
                       jax.random.PRNGKey(3))), 1)
            # production cadence: D+G every iter, lazy R1 is the D variant
            # measured, path-reg every g_reg_every iters
            row["it_per_s_combined"] = round(1e3 / (
                row["d_r1_ms"] + row["g_ms"]
                + row["path_ms"] / hp.g_reg_every), 2)
            row["fits_hbm"] = True
            row["peak_hbm_gb"] = _peak_hbm_gb()
        except Exception as e:  # noqa: BLE001
            if not _is_oom(e):
                raise
            row["fits_hbm"] = False
            row["error"] = str(e).splitlines()[0][:200]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
