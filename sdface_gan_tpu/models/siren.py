"""FiLM-SIREN point networks — the SDF generator backbones.

TPU-native rebuild of the reference networks (behavior parity, new code):

* ``SirenGenerator``    — 8-layer FiLM-SIREN MLP    (``sdf_model.py:101-139``)
* ``NGPSIRENGenerator`` — hash-grid + 3-layer SIREN (``sdf_model.py:1534-1596``)
* ``FCGenerator``       — plain ReLU MLP + NeRF PE  (``sdf_model.py:1599-1670``)

Design: every network is a (config, init, apply) triple over nested-dict
pytrees.  The point dimension is flattened to one big [N, C] matmul axis so
every layer is a single MXU-shaped GEMM over N = B*H*W*S points; FiLM
modulation (``sin(gamma * Wx + beta)``) broadcasts per-batch [B, C] factors
onto [B, P, C] activations, which XLA fuses into the matmul epilogue.

All three networks output ``[..., 3 + 1 + F]`` = [rgb, sdf, features]
(features omitted when ``output_features=False``), matching the reference's
channel contract consumed by volume integration (``sdf_model.py:247-250``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hash_encoder import HashGridSpec, hash_encode, init_hash_table
from ..ops.sh_encoder import sh_encode, sh_output_dim
from ..ops.transcendental import fast_sin
from .init import film_siren_weight, linear_params, uniform

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Elementary layers
# ---------------------------------------------------------------------------

def apply_linear(
    p: Params, x: jnp.ndarray, std_init: float = 1.0, bias_init: float = 0.0
) -> jnp.ndarray:
    """SIREN-family LinearLayer: ``std*(xW + b) + bias_init``
    (reference ``sdf_model.py:23-41``).

    Inputs follow the parameter dtype, so casting the param tree to
    bfloat16 moves the whole GEMM path onto the fast MXU pipeline.
    """
    out = x.astype(p["w"].dtype) @ p["w"]
    if "b" in p:
        out = out + p["b"]
    if std_init != 1.0:
        out = std_init * out
    if bias_init != 0.0:
        out = out + bias_init
    return out


def init_film_siren(
    key: jax.Array, in_dim: int, out_dim: int, style_dim: int, is_first: bool = False
) -> Params:
    """FiLMSiren params (reference ``sdf_model.py:44-69``): main kernel with
    SIREN init, plus gamma/beta style heads (kaiming, scaled at apply time)."""
    kw, kb, kg, kbeta = jax.random.split(key, 4)
    return {
        "w": film_siren_weight(kw, in_dim, out_dim, is_first),
        "b": uniform(kb, (out_dim,), math.sqrt(1.0 / in_dim)),
        "gamma": linear_params(kg, style_dim, out_dim, mode="kaiming"),
        "beta": linear_params(kbeta, style_dim, out_dim, mode="kaiming"),
    }


def _film_act(p: Params, out: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
    """FiLM modulation + sine on a precomputed linear output ``out``."""
    gamma = apply_linear(p["gamma"], style, std_init=15.0, bias_init=30.0)
    beta = apply_linear(p["beta"], style, std_init=0.25, bias_init=0.0)
    # fast_sin: polynomial sine (error < 1e-7) — XLA's range-reduced sin
    # costs ~3x the GEMM on the VPU (see ops/transcendental.py)
    return fast_sin(gamma[:, None, :] * out + beta[:, None, :])


def apply_film_siren(p: Params, x: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
    """``sin(gamma(style) * (xW + b) + beta(style))``.

    gamma head: std 15, bias-init 30; beta head: std 0.25, bias-init 0
    (reference ``sdf_model.py:58-59``).  ``x`` is [B, P, C]; ``style`` [B, S].
    """
    out = x.astype(p["w"].dtype) @ p["w"] + p["b"]
    return _film_act(p, out, style)


# ---------------------------------------------------------------------------
# SirenGenerator — the pure-SDF backbone
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SirenConfig:
    depth: int = 8
    width: int = 256
    style_dim: int = 256
    output_features: bool = True

    @property
    def out_dim(self) -> int:
        return 4 + (self.width if self.output_features else 0)


def init_siren_generator(key: jax.Array, cfg: SirenConfig) -> Params:
    keys = jax.random.split(key, cfg.depth + 3)
    layers = [init_film_siren(keys[0], 3, cfg.width, cfg.style_dim, is_first=True)]
    for i in range(1, cfg.depth):
        layers.append(init_film_siren(keys[i], cfg.width, cfg.width, cfg.style_dim))
    return {
        "pts_linears": layers,
        "views_linear": init_film_siren(
            keys[cfg.depth], 3 + cfg.width, cfg.width, cfg.style_dim
        ),
        "rgb_linear": linear_params(keys[cfg.depth + 1], cfg.width, 3, mode="freq"),
        "sigma_linear": linear_params(keys[cfg.depth + 2], cfg.width, 1, mode="freq"),
    }


def apply_siren_generator_parts(
    p: Params, cfg: SirenConfig, pts: jnp.ndarray, views: jnp.ndarray, style: jnp.ndarray
):
    """Evaluate the SIREN field at flattened points.

    Args:
      pts / views: [B, P, 3] positions and view directions.
      style: [B, style_dim].

    Returns ``(rgb [B,P,3], sdf [B,P,1], features [B,P,W] | None)`` as
    SEPARATE tensors: concatenating them forces the consumer to re-slice at
    lane offset 4, which on TPU (8x128 tiling) relayouts the multi-GB
    feature tensor.  Use :func:`apply_siren_generator` for the reference's
    concatenated channel contract.
    """
    h = pts
    for layer in p["pts_linears"]:
        h = apply_film_siren(layer, h, style)
    sdf = apply_linear(p["sigma_linear"], h)
    # views_linear consumes concat([h, views]); splitting the GEMM along the
    # input dim (w rows 0:W for h, W: for views) avoids materializing the
    # [N, W+3] concat — same math, one less multi-GB HBM round trip.
    vw = p["views_linear"]["w"]
    width = h.shape[-1]
    vout = (
        h.astype(vw.dtype) @ vw[:width]
        + views.astype(vw.dtype) @ vw[width:]
        + p["views_linear"]["b"]
    )
    feat = _film_act(p["views_linear"], vout, style)
    rgb = apply_linear(p["rgb_linear"], feat)
    return rgb, sdf, (feat if cfg.output_features else None)


def apply_siren_generator(
    p: Params, cfg: SirenConfig, pts: jnp.ndarray, views: jnp.ndarray, style: jnp.ndarray
) -> jnp.ndarray:
    """Concatenated [B, P, 3+1(+W)] = [rgb, sdf(, features)] contract
    (reference ``SirenGenerator.forward``, ``sdf_model.py:120-139``)."""
    rgb, sdf, feat = apply_siren_generator_parts(p, cfg, pts, views, style)
    out = jnp.concatenate([rgb, sdf], -1)
    if feat is not None:
        out = jnp.concatenate([out, feat], -1)
    return out


# ---------------------------------------------------------------------------
# NGPSIRENGenerator — hash-grid accelerated backbone
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class NGPSirenConfig:
    depth: int = 2  # reference D=2 -> 1 + D = 3 FiLM-SIREN layers
    width: int = 256
    style_dim: int = 256
    bound: float = 2.0
    sh_degree: int = 4
    output_features: bool = True
    grid: HashGridSpec = HashGridSpec.create(desired_resolution=4096)
    # Corner-packed inference tables (ops/hash_encoder.py PackPlan): levels
    # whose packed form fits this budget gather ONE [2^D*C]-wide row per
    # point instead of 2^D C-wide rows.  Measured 1.49x on the tuned-grid
    # encode at 64 MB (scripts/bench_packed_gather.py); larger budgets pack
    # more levels but LOSE (26.75 -> 31.5 -> 39.2 ms at 64/512/4096 MB).
    # 0 = off.  Inference-only: packing happens via pack_ngp_network_params
    # at load time; training params never carry the packed entry.
    pack_mb: int = 0

    @property
    def out_dim(self) -> int:
        return 4 + (self.width if self.output_features else 0)

    @property
    def pack_plan(self):
        if self.pack_mb <= 0:
            return None
        from ..ops.hash_encoder import plan_packing

        return plan_packing(self.grid, max_bytes=self.pack_mb << 20, bytes_per_el=2)


def init_ngp_siren_generator(key: jax.Array, cfg: NGPSirenConfig) -> Params:
    keys = jax.random.split(key, cfg.depth + 6)
    in_dim = cfg.grid.output_dim
    layers = [init_film_siren(keys[0], cfg.width, cfg.width, cfg.style_dim, is_first=True)]
    for i in range(1, cfg.depth + 1):
        layers.append(init_film_siren(keys[i], cfg.width, cfg.width, cfg.style_dim))
    d = cfg.depth
    return {
        "hash_table": init_hash_table(keys[d + 1], cfg.grid),
        "input_linear": linear_params(keys[d + 2], in_dim, cfg.width, mode="freq"),
        "pts_linears": layers,
        "views_linear": init_film_siren(
            keys[d + 3], sh_output_dim(cfg.sh_degree) + cfg.width, cfg.width, cfg.style_dim
        ),
        "rgb_linear": linear_params(keys[d + 4], cfg.width, 3, mode="freq"),
        "sigma_linear": linear_params(keys[d + 5], cfg.width, 1, mode="freq"),
    }


def apply_ngp_siren_generator_parts(
    p: Params,
    cfg: NGPSirenConfig,
    pts: jnp.ndarray,
    views: jnp.ndarray,
    style: jnp.ndarray,
):
    """Hash-encode points, SH-encode dirs, run the short SIREN stack
    (reference ``sdf_model.py:1566-1592``).  Returns (rgb, sdf, feat|None)."""
    if cfg.pack_mb > 0 and "hash_table_packed" in p:
        from ..ops.hash_encoder import hash_encode_packed

        enc = hash_encode_packed(
            pts, p["hash_table"], p["hash_table_packed"], cfg.pack_plan,
            bound=cfg.bound,
        )
    else:
        enc = hash_encode(pts, p["hash_table"], cfg.grid, bound=cfg.bound)
    dirs = sh_encode(views, degree=cfg.sh_degree)
    h = apply_linear(p["input_linear"], enc.astype(pts.dtype))
    for layer in p["pts_linears"]:
        h = apply_film_siren(layer, h, style)
    sdf = apply_linear(p["sigma_linear"], h)
    vw = p["views_linear"]["w"]
    width = h.shape[-1]
    vout = (
        h.astype(vw.dtype) @ vw[:width]
        + dirs.astype(vw.dtype) @ vw[width:]
        + p["views_linear"]["b"]
    )
    feat = _film_act(p["views_linear"], vout, style)
    rgb = apply_linear(p["rgb_linear"], feat)
    return rgb, sdf, (feat if cfg.output_features else None)


def apply_ngp_siren_generator(
    p: Params,
    cfg: NGPSirenConfig,
    pts: jnp.ndarray,
    views: jnp.ndarray,
    style: jnp.ndarray,
) -> jnp.ndarray:
    """Concatenated [rgb, sdf(, features)] channel contract."""
    rgb, sdf, feat = apply_ngp_siren_generator_parts(p, cfg, pts, views, style)
    out = jnp.concatenate([rgb, sdf], -1)
    if feat is not None:
        out = jnp.concatenate([out, feat], -1)
    return out


def pack_ngp_network_params(
    p: Params, cfg: NGPSirenConfig, dtype=None
) -> Params:
    """Add the corner-packed inference table to an NGP network param tree
    (one-time host-side repack; see :class:`ops.hash_encoder.PackPlan`).
    No-op when ``cfg.pack_mb`` is 0 or the entry already exists.  ``dtype``
    defaults to the standard table's dtype (bf16 on the serving path)."""
    plan = cfg.pack_plan
    if plan is None or "hash_table_packed" in p:
        return p
    from ..ops.hash_encoder import pack_hash_table

    table = p["hash_table"]
    return dict(
        p,
        hash_table_packed=pack_hash_table(
            table, plan, dtype=dtype if dtype is not None else table.dtype
        ),
    )


def ngp_query_embedding(
    p: Params, cfg: NGPSirenConfig, pts: jnp.ndarray
) -> jnp.ndarray:
    """Raw hash embedding at points — input to the TV smoothness loss
    (reference ``query_sdf``, ``sdf_model.py:1594-1596``)."""
    return hash_encode(pts, p["hash_table"], cfg.grid, bound=cfg.bound)


# ---------------------------------------------------------------------------
# FCGenerator — classic NeRF MLP ablation
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class FCConfig:
    depth: int = 8
    width: int = 256
    style_dim: int = 256
    n_freq: int = 10
    n_freq_views: int = 4
    output_features: bool = True

    @property
    def out_dim(self) -> int:
        return 4 + (self.width if self.output_features else 0)


def positional_encoding(p: jnp.ndarray, n_freq: int) -> jnp.ndarray:
    """NeRF PE with the reference's /2 pre-scale and [sin_xyz, cos_xyz] per
    frequency layout (``sdf_model.py:1640-1652``)."""
    p = p / 2.0
    feats = []
    for i in range(n_freq):
        arg = (2.0**i) * np.pi * p
        feats.append(jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], -1))
    return jnp.concatenate(feats, -1)


def _torch_linear(key: jax.Array, in_dim: int, out_dim: int) -> Params:
    """torch ``nn.Linear`` default init: kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(in), 1/sqrt(in)) for both weight and bias."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {"w": uniform(kw, (in_dim, out_dim), bound), "b": uniform(kb, (out_dim,), bound)}


def init_fc_generator(key: jax.Array, cfg: FCConfig) -> Params:
    keys = jax.random.split(key, cfg.depth + 5)
    dim_embed = 3 * cfg.n_freq * 2
    dim_embed_views = 3 * cfg.n_freq_views * 2
    return {
        "x_in": _torch_linear(keys[0], dim_embed, cfg.width),
        "style_in": _torch_linear(keys[1], cfg.style_dim, cfg.width),
        "pts_linears": [
            _torch_linear(keys[2 + i], cfg.width, cfg.width) for i in range(cfg.depth - 1)
        ],
        "views_linear": _torch_linear(
            keys[cfg.depth + 1], dim_embed_views + cfg.width, cfg.width
        ),
        "rgb_linear": _torch_linear(keys[cfg.depth + 2], cfg.width, 3),
        "sigma_linear": _torch_linear(keys[cfg.depth + 3], cfg.width, 1),
    }


def apply_fc_generator_parts(
    p: Params, cfg: FCConfig, pts: jnp.ndarray, views: jnp.ndarray, style: jnp.ndarray
):
    """ReLU MLP with positional encoding; style enters additively after the
    first layer (reference ``sdf_model.py:1654-1680``).  Returns
    (rgb, sdf, feat|None)."""
    x = positional_encoding(pts, cfg.n_freq)
    v = positional_encoding(views, cfg.n_freq_views)
    h = apply_linear(p["x_in"], x) + apply_linear(p["style_in"], style)[:, None, :]
    h = jax.nn.relu(h)
    for layer in p["pts_linears"]:
        h = jax.nn.relu(apply_linear(layer, h))
    sdf = apply_linear(p["sigma_linear"], h)
    # NB: reference applies no activation after views_linears in the FC path.
    vw = p["views_linear"]["w"]
    width = h.shape[-1]
    feat = (
        h.astype(vw.dtype) @ vw[:width]
        + v.astype(vw.dtype) @ vw[width:]
        + p["views_linear"]["b"]
    )
    rgb = apply_linear(p["rgb_linear"], feat)
    return rgb, sdf, (feat if cfg.output_features else None)


def apply_fc_generator(
    p: Params, cfg: FCConfig, pts: jnp.ndarray, views: jnp.ndarray, style: jnp.ndarray
) -> jnp.ndarray:
    """Concatenated [rgb, sdf(, features)] channel contract."""
    rgb, sdf, feat = apply_fc_generator_parts(p, cfg, pts, views, style)
    out = jnp.concatenate([rgb, sdf], -1)
    if feat is not None:
        out = jnp.concatenate([out, feat], -1)
    return out
