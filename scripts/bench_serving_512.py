#!/usr/bin/env python
"""512^2 serving throughput + HBM fit (VERDICT r03 task 7).

The reference contemplates 512/1024 outputs (prepare_data.py:82 sizes;
channel_table to 1024, sdf_model.py:913-923) but ships no config above
256^2; `configs/512res/ffhq_512_sdf_tpu.yaml` supplies one.  This bench
measures the serving forward (mapping -> 64^2 SIREN renderer -> 8-layer
decoder pyramid to 512^2, bf16 weights / f32 compositing — the bench.py
protocol) at full production widths over a batch sweep, reporting img/s
and whether the program fits HBM at each batch.

Run on the real chip: ``python scripts/bench_serving_512.py [batches...]``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sdface_gan_tpu.geometry import generate_camera_params
    from sdface_gan_tpu.models.generator import (
        GeneratorConfig,
        generator_forward,
        init_generator,
    )
    from sdface_gan_tpu.models.renderer import RendererConfig
    from sdface_gan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = GeneratorConfig(
        size=512,
        style_dim=256,
        full_pipeline=True,
        renderer=RendererConfig(
            type="sdf", out_im_res=64, n_samples=24, style_dim=256, width=256, depth=8
        ),
    )
    params = init_generator(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        params,
    )

    def chained(params, z, extr, focal, near, far, key, feedback):
        out = generator_forward(
            params, cfg, [z + 0.0 * feedback], extr, focal, near, far, key=key
        )
        return out.rgb, jnp.mean(out.rgb)

    jfn = jax.jit(chained)
    batches = [int(b) for b in sys.argv[1:]] or [4, 8, 16, 32]
    for batch in batches:
        cams = generate_camera_params(64, jax.random.PRNGKey(1), batch=batch)
        z = jax.random.normal(jax.random.PRNGKey(2), (batch, cfg.style_dim))
        key = jax.random.PRNGKey(3)
        fb = jnp.zeros(())
        try:
            for _ in range(3):
                rgb, fb = jfn(
                    params, z, cams.extrinsics, cams.focal, cams.near, cams.far,
                    key, fb,
                )
            float(fb)  # sync (block_until_ready is a no-op on tunneled arrays)
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                rgb, fb = jfn(
                    params, z, cams.extrinsics, cams.focal, cams.near, cams.far,
                    key, fb,
                )
            float(fb)
            dt = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "bench": "512x512 serving forward",
                        "batch": batch,
                        "img_per_s": round(batch * iters / dt, 1),
                        "ms_per_batch": round(1e3 * dt / iters, 1),
                        "fits_hbm": True,
                    }
                ),
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — record the OOM, keep sweeping
            msg = str(e).splitlines()[0][:200]
            print(
                json.dumps(
                    {
                        "bench": "512x512 serving forward",
                        "batch": batch,
                        "fits_hbm": False,
                        "error": msg,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
