#!/usr/bin/env python
"""512^2 serving throughput + HBM fit (VERDICT r03 task 7).

The reference contemplates 512/1024 outputs (prepare_data.py:82 sizes;
channel_table to 1024, sdf_model.py:913-923) but ships no config above
256^2; `configs/512res/ffhq_512_sdf_tpu.yaml` supplies one.  This bench
measures the serving forward (mapping -> 64^2 SIREN renderer -> 7-layer
decoder pyramid, in_res 64 -> 512, bf16 weights / f32 compositing — the
bench.py protocol) at full production widths over a batch sweep,
reporting img/s and whether the program fits HBM at each batch.

The GeneratorConfig comes from the yaml through the production config
loader (``generator_config``), so the bench always measures exactly what
the shipped config trains/serves (ADVICE r4: a hardcoded parallel config
would silently diverge from yaml edits).

Run on the real chip: ``python scripts/bench_serving_512.py [batches...]``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIG = "configs/512res/ffhq_512_sdf_tpu.yaml"


def _is_oom(e: Exception) -> bool:
    msg = str(e)
    return "RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower()


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sdface_gan_tpu.config import load_config
    from sdface_gan_tpu.config.build import generator_config
    from sdface_gan_tpu.config.sdf_options import (
        get_vol_render_opt,
        rendering_overrides,
        resolve_renderer_type,
    )
    from sdface_gan_tpu.config.yaml_config import default_config_path
    from sdface_gan_tpu.geometry import generate_camera_params
    from sdface_gan_tpu.models.generator import generator_forward, init_generator
    from sdface_gan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    yml = load_config(CONFIG, default_config_path())
    img_size = int(yml["data"]["img_size"])
    opt = get_vol_render_opt(
        yml["training"]["out_dir"].split("/")[1], False,
        ngp=resolve_renderer_type(yml, False), size=img_size,
        extra_argv=rendering_overrides(yml),
    )
    cfg = generator_config(opt, stage_a=False)
    assert cfg.size == 512, cfg.size

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
    render_res = cfg.renderer.out_im_res
    for batch in batches:
        cams = generate_camera_params(render_res, jax.random.PRNGKey(1), batch=batch)
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
        except Exception as e:  # noqa: BLE001
            if not _is_oom(e):
                # A compile-helper timeout or backend error is NOT an HBM
                # miss (ADVICE r4) — surface it instead of mislabeling.
                raise
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
