"""Multiresolution hash-grid encoding (Instant-NGP).

TPU-native equivalent of the reference CUDA extension
(``im2scene/sdf/models/gridencoder/src/gridencoder.cu``, python wrapper
``gridencoder/grid.py:96-185``).  Design notes:

* Forward: per level a vectorized 8-corner gather + d-linear interpolation.
  Level geometry (resolution, table slice, dense-vs-hash) is STATIC, so the
  16-level loop unrolls at trace time into 16 gathers that XLA pipelines.
* Backward: autodiff of the gather is a deterministic XLA scatter-add —
  this replaces the reference's ``atomicAdd`` race-prone scatter
  (``gridencoder.cu:323-336``) with a reproducible reduction.
* Input gradients (needed by the eikonal term) also fall out of autodiff:
  ``d out / d x`` flows through the interpolation weights exactly like the
  hand-written ``kernel_input_backward`` (``gridencoder.cu:344``).
* Out-of-bound inputs (outside [0,1]) produce zeros, matching
  ``gridencoder.cu:110-135``.

Performance note (measured, v5e, ``bench_ngp.py``): TPU random-gather
throughput tops out at ~2.2e8 lookups/s in the corner-major [K, N]
layout (~1.3-1.7e8 in earlier layouts) regardless of table size, so the
16-level x 8-corner encoding of 393k points (50M lookups) costs ~230 ms
— the XLA gather primitive, not this formulation, is the bound (a fused
single-gather variant measured the same).  The hash table's random access
pattern is fundamentally GPU-cache-shaped; on TPU prefer the pure-SDF
SIREN renderer (no gather) for throughput-critical paths, or lower
``num_levels``/``desired_resolution``.

Training backward (measured, v5e): the table gradient runs at
~21 Mlookups/s through XLA's deterministic scatter-add — ~10x the
forward's cost per lookup.  The sort + sorted-segment-sum alternative
(:func:`hash_encode_vjp_sorted`, the SURVEY §7 hard-part-#2 design) was
built and measured at 0.53x the scatter (11 Mlookups/s): the 50M-key
``lax.sort`` costs more than the scatter's own duplicate handling, so
the autodiff scatter-add IS the production backward.  Random-access
scatter on TPU is latency-bound, not bandwidth-bound — no layout makes
it match the gather ceiling.

The hash function is the reference's prime-XOR
(``gridencoder.cu:51-64``): ``idx = (x*1 ^ y*2654435761 ^ z*805459861)``
in wrapping uint32 arithmetic, modulo the level's (8-rounded) table size.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# First three of the reference's seven hash primes (D=3 uses three).
_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)


@dataclass(frozen=True)
class HashGridSpec:
    """Static geometry of a multires hash grid (reference ``grid.py:96-136``)."""

    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    per_level_scale: float = 2.0
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    align_corners: bool = False
    interpolation: str = "linear"  # 'linear' | 'smoothstep'
    offsets: Tuple[int, ...] = field(default=())

    @staticmethod
    def create(
        input_dim: int = 3,
        num_levels: int = 16,
        level_dim: int = 2,
        per_level_scale: float = 2.0,
        base_resolution: int = 16,
        log2_hashmap_size: int = 19,
        desired_resolution: int | None = None,
        align_corners: bool = False,
        interpolation: str = "linear",
    ) -> "HashGridSpec":
        if desired_resolution is not None:
            per_level_scale = 2.0 ** (
                math.log2(desired_resolution / base_resolution) / (num_levels - 1)
            )
        offsets: List[int] = []
        offset = 0
        max_params = 2**log2_hashmap_size
        for lvl in range(num_levels):
            resolution = int(np.ceil(base_resolution * per_level_scale**lvl))
            side = resolution if align_corners else resolution + 1
            params_in_level = min(max_params, side**input_dim)
            params_in_level = int(np.ceil(params_in_level / 8) * 8)  # 8-align
            offsets.append(offset)
            offset += params_in_level
        offsets.append(offset)
        return HashGridSpec(
            input_dim=input_dim,
            num_levels=num_levels,
            level_dim=level_dim,
            per_level_scale=per_level_scale,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            align_corners=align_corners,
            interpolation=interpolation,
            offsets=tuple(offsets),
        )

    @property
    def table_size(self) -> int:
        return self.offsets[-1]

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    def level_scale(self, level: int) -> float:
        # scale = exp2(level * log2(per_level_scale)) * H - 1 (gridencoder.cu:137)
        return float(2.0 ** (level * math.log2(self.per_level_scale)) * self.base_resolution - 1.0)

    def level_resolution(self, level: int) -> int:
        return int(np.ceil(self.level_scale(level))) + 1

    def level_table_size(self, level: int) -> int:
        return self.offsets[level + 1] - self.offsets[level]

    def level_uses_hash(self, level: int) -> bool:
        """Static replication of the CUDA stride-overflow check (gridencoder.cu:66-86)."""
        res = self.level_resolution(level)
        side = res if self.align_corners else res + 1
        return side**self.input_dim > self.level_table_size(level)


def init_hash_table(key: jax.Array, spec: HashGridSpec, std: float = 1e-4) -> jnp.ndarray:
    """U(-1e-4, 1e-4) init, matching ``grid.py:138-140``."""
    return jax.random.uniform(
        key, (spec.table_size, spec.level_dim), minval=-std, maxval=std, dtype=jnp.float32
    )


def _corner_offsets(dim: int) -> np.ndarray:
    """All 2^dim corner bit patterns, shape [2^dim, dim]."""
    return np.array(
        [[(c >> d) & 1 for d in range(dim)] for c in range(2**dim)], dtype=np.uint32
    )


def _level_index_weight(
    x01f: jnp.ndarray, spec: HashGridSpec, lvl: int, corners: np.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global table row indices and interpolation weights for one level
    (the corner loop of ``gridencoder.cu:110-160``), both ``[2^D, N]``.

    Layout note (measured, v5e): corner-major ``[K, N]`` keeps every
    weight temporary unpadded in TPU tiled layout (K=8 sublanes x N
    lanes), and the weight product is a STATIC unrolled multiply of [N]
    column slices — no ``select``.  The previous ``[N, K, D]``
    ``prod(where(...))`` formulation padded its double-backprop
    temporaries 16x ([.., 8]-minor) and OOMed the stage-A NGP train step
    (25.3G > 15.75G HBM at batch 4); this one fits.
    """
    scale = spec.level_scale(lvl)
    size = spec.level_table_size(lvl)
    res = spec.level_resolution(lvl)
    side = res if spec.align_corners else res + 1
    use_hash = spec.level_uses_hash(lvl)

    pos = x01f * scale + (0.0 if spec.align_corners else 0.5)
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    if spec.interpolation == "smoothstep":
        frac = frac * frac * (3.0 - 2.0 * frac)  # gridencoder.cu:40-46
    pgT = pos_grid.astype(jnp.uint32).T  # [D, N]

    # cg[k, d, n] = pos_grid[n, d] + corner_bit[k, d]
    cg = pgT[None, :, :] + jnp.asarray(corners)[:, :, None]  # [K, D, N]
    if use_hash:
        idx = jnp.zeros((corners.shape[0],) + pgT.shape[1:], dtype=jnp.uint32)
        for d in range(spec.input_dim):
            idx = idx ^ (cg[:, d, :] * jnp.uint32(_PRIMES[d]))
    else:
        # Dense level: row-major linear index with stride side**d
        # (gridencoder.cu:66-75); fits because side**D <= size here.
        idx = jnp.zeros((corners.shape[0],) + pgT.shape[1:], dtype=jnp.uint32)
        stride = 1
        for d in range(spec.input_dim):
            idx = idx + cg[:, d, :] * jnp.uint32(stride)
            stride *= side
    idx = (idx % jnp.uint32(size)).astype(jnp.int32) + spec.offsets[lvl]  # [K, N]

    one_minus = 1.0 - frac
    factors = []
    for k in range(corners.shape[0]):
        f = None
        for d in range(spec.input_dim):
            fd = frac[:, d] if corners[k, d] == 1 else one_minus[:, d]
            f = fd if f is None else f * fd
        factors.append(f)
    w = jnp.stack(factors, axis=0)  # [K, N]
    return idx, w


def hash_encode(
    x: jnp.ndarray,
    table: jnp.ndarray,
    spec: HashGridSpec,
    bound: float = 1.0,
) -> jnp.ndarray:
    """Encode positions with the multires hash grid.

    Args:
      x: [..., input_dim] positions in [-bound, bound] (mapped to [0,1]
         internally, matching ``grid.py:145-149``).
      table: [table_size, level_dim] embedding table.
      spec: static grid geometry.

    Returns:
      [..., num_levels * level_dim] encodings (level-major channel order,
      matching the reference's [B, L*C] layout).
    """
    if x.shape[-1] != spec.input_dim:
        raise ValueError(f"expected last dim {spec.input_dim}, got {x.shape}")
    prefix = x.shape[:-1]
    x01 = (x.reshape(-1, spec.input_dim) + bound) / (2.0 * bound)

    # OOB points output zero at every level (gridencoder.cu:110-135).
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1, keepdims=True)
    x01f = jnp.clip(x01.astype(jnp.float32), 0.0, 1.0)

    corners = _corner_offsets(spec.input_dim)  # [K, D] static numpy
    level_outs = []
    for lvl in range(spec.num_levels):
        idx, w = _level_index_weight(x01f, spec, lvl, corners)  # [K, N] each
        gathered = table[idx]  # [K, N, C]
        out = jnp.einsum("kn,knc->nc", w, gathered.astype(w.dtype))
        level_outs.append(out)

    out = jnp.concatenate(level_outs, axis=-1)
    out = jnp.where(oob, 0.0, out)
    return out.reshape(prefix + (spec.output_dim,)).astype(table.dtype)


def hash_encode_vjp_sorted(
    x: jnp.ndarray,
    table: jnp.ndarray,
    spec: HashGridSpec,
    cotangent: jnp.ndarray,
    bound: float = 1.0,
) -> jnp.ndarray:
    """Table gradient via sort + sorted segment-sum — the TPU-native
    alternative to the autodiff scatter-add (SURVEY §7 hard-part #2;
    reference scatters with ``atomicAdd``, ``gridencoder.cu:249-336``).

    Rationale: XLA's scatter with *unsorted, duplicate* indices has a slow
    deterministic expansion on TPU.  Here the (row, value) update pairs of
    all levels are key-sorted once (``lax.sort``, payload = the level_dim
    value columns), then reduced with a sorted-indices segment sum, which
    XLA can lower without the duplicate-handling serialization.

    Returns d loss / d table, shape ``[table_size, level_dim]``.  Used by
    the benchmark (``bench_ngp.py``) to decide the production backward;
    numerically equal to ``jax.grad`` of :func:`hash_encode` w.r.t.
    ``table`` (tested in ``tests/test_ops.py``).
    """
    n = int(np.prod(x.shape[:-1]))
    x01 = (x.reshape(-1, spec.input_dim) + bound) / (2.0 * bound)
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1, keepdims=True)
    x01f = jnp.clip(x01.astype(jnp.float32), 0.0, 1.0)
    cot = cotangent.reshape(n, spec.num_levels, spec.level_dim).astype(jnp.float32)
    cot = jnp.where(oob[:, :, None], 0.0, cot)  # OOB points contribute nothing

    corners = _corner_offsets(spec.input_dim)
    idx_parts, val_parts = [], []
    for lvl in range(spec.num_levels):
        idx, w = _level_index_weight(x01f, spec, lvl, corners)  # [K,N] each
        val = w[:, :, None] * cot[None, :, lvl, :]  # [K, N, C]
        idx_parts.append(idx.reshape(-1))
        val_parts.append(val.reshape(-1, spec.level_dim))
    keys = jnp.concatenate(idx_parts)  # [M]
    vals = jnp.concatenate(val_parts)  # [M, C]

    operands = (keys,) + tuple(vals[:, c] for c in range(spec.level_dim))
    sorted_ops = jax.lax.sort(operands, num_keys=1)
    skeys = sorted_ops[0]
    svals = jnp.stack(sorted_ops[1:], axis=-1)
    grad = jax.ops.segment_sum(
        svals, skeys, num_segments=table.shape[0], indices_are_sorted=True
    )
    return grad.astype(table.dtype)


# ---------------------------------------------------------------------------
# Packed-corner inference tables: one gather per (level, point) instead of 8
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PackPlan:
    """Static plan for corner-packed inference tables.

    Attack on the measured gather wall (module docstring: XLA's TPU gather
    is LOOKUP-COUNT-bound at ~2.2e8 rows/s regardless of row width): store,
    for every grid CELL, all 2^D corner feature rows contiguously, so the
    encode needs ONE gather of a [2^D * C]-wide row per (level, point)
    instead of 2^D gathers of C-wide rows.  The packed table is a pure
    post-training repack of the standard table — packing cell (i,j,k) copies
    the exact rows (including hash collisions) the standard encode would
    fetch — so packed inference is BIT-EXACT vs :func:`hash_encode`; the
    price is memory (res^D rows per level, 2^D x the feature bytes), so only
    levels that fit ``max_bytes`` are packed and the rest fall back to the
    standard 8-corner gather.  Training keeps the standard layout (the
    scatter-add backward needs corner sharing).

    Wide rows also fix the lane-padding tax: the standard gather's minor dim
    is C (< 128 lanes pads 16x at C=8, ``bench_ngp.py:139-150``); packed rows
    are 2^D * C wide.

    The per-level ``row_offsets`` place every packed level in ONE
    concatenated [total_rows, 2^D * C] array so all packed levels resolve in
    a single gather op.  (A Pallas kernel holding dense levels in VMEM was
    the other candidate design; it is not expressible in jax 0.9 — Mosaic's
    only vector-gather lowering requires table.shape == indices.shape,
    ``jax/_src/pallas/mosaic/lowering.py:2482-2524`` — see
    docs/PERFORMANCE.md.)
    """

    spec: HashGridSpec
    packed_levels: Tuple[int, ...]
    row_offsets: Tuple[int, ...]  # start row per packed level, + total

    @property
    def total_rows(self) -> int:
        return self.row_offsets[-1]

    @property
    def row_width(self) -> int:
        return (2**self.spec.input_dim) * self.spec.level_dim

    def level_rows(self, lvl: int) -> int:
        return self.spec.level_resolution(lvl) ** self.spec.input_dim


def plan_packing(
    spec: HashGridSpec, max_bytes: int = 1 << 30, bytes_per_el: int = 2
) -> PackPlan:
    """Choose which levels to corner-pack under a memory budget.

    Greedy cheapest-first (low levels have the fewest cells), since every
    packed level saves the same 2^D - 1 lookups per point regardless of its
    size.  ``bytes_per_el`` should match the dtype the packed table will be
    stored in (2 for the bf16 serving path).
    """
    row_bytes = (2**spec.input_dim) * spec.level_dim * bytes_per_el
    packed: List[int] = []
    offsets: List[int] = []
    total = 0
    for lvl in sorted(
        range(spec.num_levels), key=lambda l: spec.level_resolution(l)
    ):
        rows = spec.level_resolution(lvl) ** spec.input_dim
        if total + rows * row_bytes > max_bytes:
            break
        packed.append(lvl)
        total += rows * row_bytes
    packed.sort()
    offset = 0
    for lvl in packed:
        offsets.append(offset)
        offset += spec.level_resolution(lvl) ** spec.input_dim
    offsets.append(offset)
    return PackPlan(spec=spec, packed_levels=tuple(packed), row_offsets=tuple(offsets))


def pack_hash_table(
    table: jnp.ndarray | np.ndarray,
    plan: PackPlan,
    dtype=jnp.bfloat16,
    chunk_cells: int = 1 << 21,
) -> jnp.ndarray:
    """Build the packed-corner table (host-side, chunked to bound RAM).

    For each packed level and each cell base coordinate, copies the 2^D
    corner rows the standard encode would gather (same hash / dense
    indexing, same corner order as :func:`_corner_offsets`).
    """
    spec = plan.spec
    np_table = np.asarray(table, dtype=np.float32)
    corners = _corner_offsets(spec.input_dim)  # [K, D]
    out = np.empty((plan.total_rows, plan.row_width), dtype=np.float32)
    for li, lvl in enumerate(plan.packed_levels):
        res = spec.level_resolution(lvl)
        size = spec.level_table_size(lvl)
        side = res if spec.align_corners else res + 1
        use_hash = spec.level_uses_hash(lvl)
        n_cells = res**spec.input_dim
        base = plan.row_offsets[li]
        for start in range(0, n_cells, chunk_cells):
            stop = min(start + chunk_cells, n_cells)
            lin = np.arange(start, stop, dtype=np.uint32)
            # cell coords, axis-0-minor to match the encode's linear index
            coords = np.empty((stop - start, spec.input_dim), dtype=np.uint32)
            rem = lin
            for d in range(spec.input_dim):
                coords[:, d] = rem % res
                rem = rem // res
            for k in range(corners.shape[0]):
                cg = coords + corners[k][None, :]  # [n, D]
                if use_hash:
                    idx = np.zeros(cg.shape[0], dtype=np.uint32)
                    for d in range(spec.input_dim):
                        idx ^= cg[:, d] * np.uint32(_PRIMES[d])
                else:
                    idx = np.zeros(cg.shape[0], dtype=np.uint32)
                    stride = 1
                    for d in range(spec.input_dim):
                        idx += cg[:, d] * np.uint32(stride)
                        stride *= side
                rows = (idx % np.uint32(size)).astype(np.int64) + spec.offsets[lvl]
                out[base + start : base + stop,
                    k * spec.level_dim : (k + 1) * spec.level_dim] = np_table[rows]
    return jnp.asarray(out.astype(jnp.dtype(dtype) if dtype is not None else out.dtype))


def hash_encode_packed(
    x: jnp.ndarray,
    table: jnp.ndarray,
    packed: jnp.ndarray,
    plan: PackPlan,
    bound: float = 1.0,
) -> jnp.ndarray:
    """:func:`hash_encode` with corner-packed levels: one [2^D * C]-wide
    gather per packed (level, point); unpacked levels use the standard
    8-corner path.  Bit-exact vs :func:`hash_encode` up to the packed
    table's dtype (tested in ``tests/test_ops.py``)."""
    spec = plan.spec
    if x.shape[-1] != spec.input_dim:
        raise ValueError(f"expected last dim {spec.input_dim}, got {x.shape}")
    prefix = x.shape[:-1]
    x01 = (x.reshape(-1, spec.input_dim) + bound) / (2.0 * bound)
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1, keepdims=True)
    x01f = jnp.clip(x01.astype(jnp.float32), 0.0, 1.0)

    corners = _corner_offsets(spec.input_dim)
    K = corners.shape[0]
    packed_set = set(plan.packed_levels)

    # One fused gather for ALL packed levels: level-major [Lp, N] indices.
    idx_rows, w_rows = [], []
    for li, lvl in enumerate(plan.packed_levels):
        scale = spec.level_scale(lvl)
        res = spec.level_resolution(lvl)
        pos = x01f * scale + (0.0 if spec.align_corners else 0.5)
        pos_grid = jnp.floor(pos)
        frac = pos - pos_grid
        if spec.interpolation == "smoothstep":
            frac = frac * frac * (3.0 - 2.0 * frac)
        pg = pos_grid.astype(jnp.int32)  # [N, D], in [0, res-1]
        lin = jnp.zeros(pg.shape[0], dtype=jnp.int32)
        stride = 1
        for d in range(spec.input_dim):
            lin = lin + pg[:, d] * stride
            stride *= res
        idx_rows.append(lin + plan.row_offsets[li])
        one_minus = 1.0 - frac
        factors = []
        for k in range(K):
            f = None
            for d in range(spec.input_dim):
                fd = frac[:, d] if corners[k, d] == 1 else one_minus[:, d]
                f = fd if f is None else f * fd
            factors.append(f)
        w_rows.append(jnp.stack(factors, axis=0))  # [K, N]

    packed_outs = {}
    if plan.packed_levels:
        idx = jnp.stack(idx_rows, axis=0)  # [Lp, N]
        gathered = packed[idx]  # [Lp, N, K*C]
        w = jnp.stack(w_rows, axis=0)  # [Lp, K, N] f32
        g = gathered.reshape(gathered.shape[0], gathered.shape[1], K, spec.level_dim)
        out_p = jnp.einsum("lkn,lnkc->lnc", w, g.astype(w.dtype))  # [Lp, N, C]
        for li, lvl in enumerate(plan.packed_levels):
            packed_outs[lvl] = out_p[li]

    level_outs = []
    for lvl in range(spec.num_levels):
        if lvl in packed_set:
            level_outs.append(packed_outs[lvl])
            continue
        idx, w = _level_index_weight(x01f, spec, lvl, corners)
        gathered = table[idx]
        level_outs.append(jnp.einsum("kn,knc->nc", w, gathered.astype(w.dtype)))

    out = jnp.concatenate([o.astype(jnp.float32) for o in level_outs], axis=-1)
    out = jnp.where(oob, 0.0, out)
    return out.reshape(prefix + (spec.output_dim,)).astype(table.dtype)


def hash_table_total_variation(
    table: jnp.ndarray,
    spec: HashGridSpec,
    x: jnp.ndarray,
    bound: float = 1.0,
) -> jnp.ndarray:
    """TV regularizer over grid embeddings at sampled locations.

    Differentiable analog of the reference's in-place TV-gradient kernel
    (``kernel_grad_tv``, ``gridencoder.cu:507``): penalizes squared
    differences between each sampled cell and its +1 neighbors along each
    axis.  Taking ``jax.grad`` of this w.r.t. ``table`` reproduces the
    gradient the CUDA kernel accumulates directly.
    """
    x01 = (x.reshape(-1, spec.input_dim) + bound) / (2.0 * bound)
    x01f = jnp.clip(x01.astype(jnp.float32), 0.0, 1.0)
    total = jnp.zeros((), dtype=jnp.float32)
    for lvl in range(spec.num_levels):
        scale = spec.level_scale(lvl)
        size = spec.level_table_size(lvl)
        res = spec.level_resolution(lvl)
        side = res if spec.align_corners else res + 1
        use_hash = spec.level_uses_hash(lvl)

        pos = x01f * scale + (0.0 if spec.align_corners else 0.5)
        pg = jnp.floor(pos).astype(jnp.uint32)

        def index_of(cg: jnp.ndarray) -> jnp.ndarray:
            if use_hash:
                idx = jnp.zeros(cg.shape[:-1], dtype=jnp.uint32)
                for d in range(spec.input_dim):
                    idx = idx ^ (cg[..., d] * jnp.uint32(_PRIMES[d]))
            else:
                idx = jnp.zeros(cg.shape[:-1], dtype=jnp.uint32)
                stride = 1
                for d in range(spec.input_dim):
                    idx = idx + cg[..., d] * jnp.uint32(stride)
                    stride *= side
            return (idx % jnp.uint32(size)).astype(jnp.int32) + spec.offsets[lvl]

        center = table[index_of(pg)]
        for d in range(spec.input_dim):
            nb = pg.at[..., d].add(jnp.uint32(1))
            diff = center - table[index_of(nb)]
            total = total + jnp.sum(diff.astype(jnp.float32) ** 2)
    return total / x01f.shape[0]
