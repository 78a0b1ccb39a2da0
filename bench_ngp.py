"""NGP training-path benchmark (VERDICT r01 #6).

Measures, on the real chip:

1. ``hash_encode`` forward lookups/s — the measured TPU gather ceiling
   (~1.2-1.7e8 lookups/s, see ``ops/hash_encoder.py:19-26``).
2. The table gradient (scatter-add backward) lookups/s — XLA's
   deterministic scatter expansion vs the reference's ``atomicAdd``
   (``gridencoder.cu:249-336``).
3. A sort+segment-sum backward prototype (unique-index scatter after a
   key sort), the TPU-native alternative SURVEY §7 hard-part #2 sketches.
4. The full stage-A NGP G+D train step at production shapes (batch 4,
   64^2 rays x 24 samples).

Prints one JSON line per measurement.  Run: ``python bench_ngp.py``.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def sync(x) -> float:
    """Fetch a scalar: block_until_ready is a no-op on tunneled arrays."""
    return float(jnp.asarray(x).reshape(-1)[0])


def timeit(fn, *args, iters: int = 5, warmup: int = 2) -> float:
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def bench_hash_fwd_bwd(n_points: int = 393216) -> None:
    from sdface_gan_tpu.ops.hash_encoder import (
        HashGridSpec,
        hash_encode,
        hash_encode_vjp_sorted,
        init_hash_table,
    )

    spec = HashGridSpec.create(desired_resolution=4096)
    table = init_hash_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n_points, 3), minval=-1, maxval=1)
    lookups = n_points * spec.num_levels * (2**spec.input_dim)

    fwd = jax.jit(lambda t, x: hash_encode(x, t, spec))
    dt = timeit(fwd, table, x)
    print(json.dumps({
        "metric": "ngp hash_encode forward (16 levels x 8 corners)",
        "value": round(lookups / dt / 1e6, 1), "unit": "Mlookups/sec",
        "points_per_sec": round(n_points / dt / 1e6, 2),
    }))

    # Backward (table grad): XLA scatter-add from autodiff of the gather.
    bwd = jax.jit(jax.grad(lambda t, x: jnp.sum(hash_encode(x, t, spec) ** 2)))
    dt_b = timeit(bwd, table, x)
    print(json.dumps({
        "metric": "ngp table-grad backward, XLA scatter-add",
        "value": round(lookups / dt_b / 1e6, 1), "unit": "Mlookups/sec",
        "vs_forward": round(dt_b / dt, 2),
    }))

    # Sorted segment-sum backward prototype (unique-index accumulation).
    g = fwd(table, x)  # cotangent of matching shape
    bwd_s = jax.jit(lambda t, x, g: hash_encode_vjp_sorted(x, t, spec, g))
    dt_s = timeit(bwd_s, table, x, g)
    print(json.dumps({
        "metric": "ngp table-grad backward, sort+segment-sum prototype",
        "value": round(lookups / dt_s / 1e6, 1), "unit": "Mlookups/sec",
        "vs_scatter": round(dt_b / dt_s, 2),
    }))


def bench_stage_a_ngp(batch: int = 4) -> None:
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

    gcfg = GeneratorConfig(
        size=64, style_dim=256, full_pipeline=False,
        renderer=RendererConfig(type="ngp", out_im_res=64, n_samples=24,
                                style_dim=256, remat=True),
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

    key = jax.random.PRNGKey(7)
    state = (g, d, g_state, d_state)
    for _ in range(2):
        *state, loss = one_iter(*state, key)
    sync(loss)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        *state, loss = one_iter(*state, key)
    sync(loss)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": f"stage-A NGP train step (D+G, batch {batch}, 64^2x24)",
        "value": round(1.0 / dt, 3), "unit": "it/sec",
    }))


def bench_ngp_serving(batch: int = 8) -> None:
    """256² full-pipeline synthesis throughput on the NGP renderer, for the
    reference hash grid vs the TPU-tuned one
    (``configs/256res/ffhq_256_sdf_ngp_tpu.yaml``) — the serving-side
    counterpart of the training sweep in docs/PERFORMANCE.md.  Same
    serving precision as ``bench.py``: bf16 weights, f32 compositing.

    Batch 8, not bench.py's 32: the gathered corner features are
    ``[8·N_pts, level_dim]`` and level_dim < 128 lanes pads 16x (dim 8),
    so the tuned grid's gather intermediate alone is 12 GB at batch 32
    (measured OOM, 18.19 G > 15.75 G HBM) — the hash path is
    latency-bound anyway, so throughput saturates well before 32."""
    from sdface_gan_tpu.geometry import generate_camera_params
    from sdface_gan_tpu.models.generator import (
        GeneratorConfig,
        generator_forward,
        init_generator,
    )
    from sdface_gan_tpu.models.renderer import RendererConfig

    from sdface_gan_tpu.models.generator import pack_generator_for_inference

    grids = {
        "reference 16xdim2 T=2^19 finest4096": dict(
            ngp_num_levels=16, ngp_level_dim=2, ngp_finest_res=4096,
            ngp_log2_hashmap_size=19),
        "tuned 4xdim8 T=2^15 finest256": dict(
            ngp_num_levels=4, ngp_level_dim=8, ngp_finest_res=256,
            ngp_log2_hashmap_size=15),
        # the production serving arm: tuned grid + corner-packed tables at
        # the measured-optimal 64 MB budget (scripts/bench_packed_gather.py)
        "tuned 4xdim8 + packed 64MB": dict(
            ngp_num_levels=4, ngp_level_dim=8, ngp_finest_res=256,
            ngp_log2_hashmap_size=15, ngp_pack_mb=64),
    }
    for name, grid in grids.items():
        gcfg = GeneratorConfig(
            size=256, style_dim=256, full_pipeline=True,
            renderer=RendererConfig(type="ngp", out_im_res=64, n_samples=24,
                                    style_dim=256, **grid),
        )
        kp, kz, kc, kr = jax.random.split(jax.random.PRNGKey(0), 4)
        params = init_generator(kp, gcfg)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            params,
        )
        params = pack_generator_for_inference(params, gcfg)
        z = jax.random.normal(kz, (batch, gcfg.style_dim))
        cams = generate_camera_params(gcfg.renderer.out_im_res, kc, batch=batch)

        fwd = jax.jit(lambda p, z: generator_forward(
            p, gcfg, [z], cams.extrinsics, cams.focal, cams.near, cams.far,
            key=kr).rgb)
        dt = timeit(fwd, params, z)
        print(json.dumps({
            "metric": f"ngp serving 256^2 full pipeline, {name}",
            "batch": batch, "value": round(batch / dt, 1), "unit": "images/sec",
        }))


def main() -> None:
    from sdface_gan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    bench_hash_fwd_bwd()
    bench_stage_a_ngp()
    bench_ngp_serving()


if __name__ == "__main__":
    main()
