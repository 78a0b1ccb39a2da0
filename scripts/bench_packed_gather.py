#!/usr/bin/env python
"""Measure the NGP gather wall attacks (VERDICT r03 task 3).

Three measurements, one JSON line each:

1. Premise check: XLA gather throughput (rows/s) vs gathered row WIDTH.
   The packed-corner design (ops/hash_encoder.py PackPlan) only wins if
   the gather is lookup-count-bound, i.e. the rate stays ~flat as rows
   widen from C=2..8 floats to 2^D*C.
2. hash_encode vs hash_encode_packed at production point counts on the
   TPU-tuned grid (4 x dim8, finest 256) and the reference grid
   (16 x dim2, finest 4096).
3. A Pallas lowering probe for the VMEM-resident-table kernel the VERDICT
   sketched: expected to fail — Mosaic's only vector-gather lowering
   (jax 0.9, jax/_src/pallas/mosaic/lowering.py:2482-2524) requires
   table.shape == indices.shape (a same-shape take_along_axis), which
   cannot express a [T, C] table lookup — recorded either way.

Run on the real chip: ``python scripts/bench_packed_gather.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x) -> float:
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


def bench_gather_width(n_rows: int = 2**19, n_lookups: int = 4 * 2**20) -> None:
    """Gather rate vs row width, corner-major [K, N] index layout."""
    for dtype in (jnp.float32, jnp.bfloat16):
        for width in (2, 8, 16, 32, 64, 128):
            table = jnp.zeros((n_rows, width), dtype=dtype)
            idx = jax.random.randint(
                jax.random.PRNGKey(0), (8, n_lookups // 8), 0, n_rows, dtype=jnp.int32
            )
            f = jax.jit(lambda t, i: jnp.sum(t[i], axis=-1))
            dt = timeit(f, table, idx)
            print(json.dumps({
                "metric": f"gather rate, rows [{n_rows}, {width}] {jnp.dtype(dtype).name}",
                "value": round(n_lookups / dt / 1e6, 1), "unit": "Mrows/sec",
                "GBps": round(n_lookups * width * jnp.dtype(dtype).itemsize / dt / 1e9, 2),
            }), flush=True)


def bench_encode_packed(n_points: int = 393216) -> None:
    from sdface_gan_tpu.ops.hash_encoder import (
        HashGridSpec,
        hash_encode,
        hash_encode_packed,
        init_hash_table,
        pack_hash_table,
        plan_packing,
    )

    grids = {
        "tuned 4xdim8 T=2^15 finest256": HashGridSpec.create(
            num_levels=4, level_dim=8, desired_resolution=256, log2_hashmap_size=15
        ),
        "reference 16xdim2 T=2^19 finest4096": HashGridSpec.create(
            desired_resolution=4096
        ),
    }
    x = jax.random.uniform(jax.random.PRNGKey(1), (n_points, 3), minval=-1, maxval=1)
    for name, spec in grids.items():
        table = init_hash_table(jax.random.PRNGKey(0), spec)
        base = jax.jit(lambda t, x: hash_encode(x, t, spec))
        dt0 = timeit(base, table, x)
        lookups = n_points * spec.num_levels * 8
        print(json.dumps({
            "metric": f"hash_encode standard, {name}",
            "value": round(dt0 * 1e3, 2), "unit": "ms",
            "Mlookups_per_s": round(lookups / dt0 / 1e6, 1),
        }), flush=True)
        for budget_mb in (64, 512, 4096):
            plan = plan_packing(spec, max_bytes=budget_mb << 20, bytes_per_el=2)
            if not plan.packed_levels:
                continue
            packed = pack_hash_table(table, plan, dtype=jnp.bfloat16)
            f = jax.jit(lambda t, p, x: hash_encode_packed(x, t, p, plan))
            dt = timeit(f, table, packed, x)
            eff_lookups = n_points * (
                len(plan.packed_levels)
                + (spec.num_levels - len(plan.packed_levels)) * 8
            )
            print(json.dumps({
                "metric": (
                    f"hash_encode packed<=" f"{budget_mb}MB "
                    f"(levels {list(plan.packed_levels)}), {name}"
                ),
                "value": round(dt * 1e3, 2), "unit": "ms",
                "speedup_vs_standard": round(dt0 / dt, 2),
                "packed_rows": plan.total_rows,
                "eff_Mlookups_per_s": round(eff_lookups / dt / 1e6, 1),
            }), flush=True)


def probe_pallas_gather() -> None:
    """Attempt the VMEM-resident-table Pallas gather; record the outcome."""
    import jax.experimental.pallas as pl

    table = jnp.arange(512 * 128, dtype=jnp.float32).reshape(512, 128)
    idx = jax.random.randint(jax.random.PRNGKey(0), (8, 128), 0, 512, jnp.int32)

    def kernel(t_ref, i_ref, o_ref):
        # the natural formulation: per-element vector gather from a VMEM
        # table larger than the index array
        o_ref[...] = t_ref[...][i_ref[...], :][..., 0]

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(table, idx)
        ok = bool(np.isfinite(np.asarray(out)).all())
        print(json.dumps({
            "metric": "pallas large-table vector gather lowering",
            "value": 1 if ok else 0, "unit": "lowered_ok",
        }), flush=True)
    except Exception as e:  # noqa: BLE001 — recording the lowering verdict
        print(json.dumps({
            "metric": "pallas large-table vector gather lowering",
            "value": 0, "unit": "lowered_ok",
            "error": f"{type(e).__name__}: {str(e)[:300]}",
        }), flush=True)


def main() -> None:
    from sdface_gan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    bench_gather_width()
    bench_encode_packed()
    probe_pallas_gather()


if __name__ == "__main__":
    main()
