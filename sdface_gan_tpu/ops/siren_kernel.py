"""Fused FiLM-SIREN field evaluation — Pallas TPU kernel.

The volume renderer's hot loop evaluates an 8-layer 256-wide FiLM-SIREN
MLP over B x H x W x S sample points (reference ``SirenGenerator``,
``sdf_model.py:101-139``).  The XLA path writes every [N, 256] activation
(hundreds of MB) back to HBM between layers; this kernel keeps the ENTIRE
network resident in VMEM — all layer weights total ~2.3 MB — and streams
point tiles through it, so HBM traffic collapses to the [N, 3] inputs and
[N, 4(+F)] outputs.

Layout: one grid dimension over point tiles; weights/gammas/betas are
whole-array VMEM blocks (broadcast to every program).  The per-sample
style modulation is pre-computed outside (two tiny GEMMs) and indexed per
batch element by ``vmap`` over the kernel.  Activations use the polynomial
``fast_sin`` (ops/transcendental.py).

Optional inference path (``RendererConfig.use_fused_kernel``); the XLA
path is the measured-faster serving default — it interleaves the sine
epilogue (VPU) with MXU tiles at the instruction level, while this
kernel's per-tile layer chain serializes them (53 vs 76 ms field+composite
at batch 32 bf16 on v5e).  Training always takes the XLA path where
autodiff composes with the eikonal/R1 double backprop.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .transcendental import fast_sin

TILE = 2048  # points per program: [2048, 256] f32 activations = 2 MB VMEM


def _siren_kernel(
    dot_dtype,
    pts_ref,      # [TILE, 8]   (xyz + viewdirs padded to 8 lanes)
    w_first_ref,  # [8, W]      (first-layer kernel, padded input dim)
    b_first_ref,  # [1, W]
    w_stack_ref,  # [D-1, W, W]
    b_stack_ref,  # [D-1, W]
    gamma_ref,    # [D, W]   per-batch-element FiLM scales
    beta_ref,     # [D, W]
    wv_pts_ref,   # [W, W]   views_linear kernel, point-feature part
    wv_dir_ref,   # [8, W]   views_linear kernel, view-dir part (padded)
    bv_ref,       # [1, W]
    gv_ref,       # [1, W]   views-layer gamma
    bev_ref,      # [1, W]   views-layer beta
    w_rgb_ref,    # [W, 8]   rgb head (3 used)
    b_rgb_ref,    # [1, 8]
    w_sdf_ref,    # [W, 8]   sdf head (1 used)
    b_sdf_ref,    # [1, 8]
    out_ref,      # [TILE, 16]  (rgb 3, sdf 1, padding) -- feature head
    feat_ref,     # [TILE, W]
):
    # bf16 multiplies with f32 accumulation — the MXU's native fast mode,
    # matching XLA's default matmul precision for f32 operands on TPU.
    def dot16(a, b):
        return jnp.dot(
            a.astype(dot_dtype), b.astype(dot_dtype),
            preferred_element_type=jnp.float32,
        )

    x = pts_ref[:, :]  # [TILE, 8]; lanes 0..2 = xyz, 4..6 = viewdirs
    pts = jnp.where(jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) < 4, x, 0.0)
    dirs = jnp.where(jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) >= 4, x, 0.0)

    h = dot16(pts, w_first_ref[:, :])
    h = fast_sin(gamma_ref[0:1, :] * (h + b_first_ref[:, :]) + beta_ref[0:1, :])

    n_hidden = w_stack_ref.shape[0]
    for layer in range(n_hidden):
        z = dot16(h, w_stack_ref[layer])
        z = z + b_stack_ref[layer : layer + 1, :]
        h = fast_sin(gamma_ref[layer + 1 : layer + 2, :] * z
                     + beta_ref[layer + 1 : layer + 2, :])

    sdf = dot16(h, w_sdf_ref[:, :])
    sdf = sdf + b_sdf_ref[:, :]

    f = dot16(h, wv_pts_ref[:, :])
    f = f + dot16(dirs, wv_dir_ref[:, :])
    f = fast_sin(gv_ref[:, :] * (f + bv_ref[:, :]) + bev_ref[:, :])
    feat_ref[:, :] = f.astype(feat_ref.dtype)

    rgb = dot16(f, w_rgb_ref[:, :])
    rgb = rgb + b_rgb_ref[:, :]

    lane = jax.lax.broadcasted_iota(jnp.int32, (rgb.shape[0], 16), 1)
    rgb_pad = jnp.pad(rgb, ((0, 0), (0, 8)))
    sdf_pad = jnp.pad(sdf, ((0, 0), (0, 8)))
    out_ref[:, :] = jnp.where(
        lane < 3, rgb_pad, jnp.where(lane == 3, jnp.roll(sdf_pad, 3, axis=1), 0.0)
    )


def _pack_params(p: Dict, depth: int, width: int, dot_dtype):
    """Stack the SIREN layer params into kernel-friendly padded arrays.

    Weight matrices are stored in ``dot_dtype`` (bf16 by default — halves
    the resident VMEM and the broadcast DMA); biases stay f32 and are
    added to the f32 dot accumulators in-kernel.
    """
    w_first = jnp.zeros((8, width), dot_dtype).at[:3].set(
        p["pts_linears"][0]["w"].astype(dot_dtype))
    b_first = p["pts_linears"][0]["b"][None, :].astype(jnp.float32)
    w_stack = jnp.stack(
        [p["pts_linears"][i]["w"] for i in range(1, depth)]).astype(dot_dtype)
    b_stack = jnp.stack(
        [p["pts_linears"][i]["b"] for i in range(1, depth)]).astype(jnp.float32)
    wv = p["views_linear"]["w"]  # [W+3, W]
    wv_pts = wv[:width].astype(dot_dtype)
    wv_dir = jnp.zeros((8, width), dot_dtype).at[4:7].set(
        wv[width:].astype(dot_dtype))
    bv = p["views_linear"]["b"][None, :].astype(jnp.float32)
    w_rgb = jnp.zeros((width, 8), dot_dtype).at[:, :3].set(
        p["rgb_linear"]["w"].astype(dot_dtype))
    b_rgb = jnp.zeros((1, 8), jnp.float32).at[:, :3].set(
        p["rgb_linear"]["b"].astype(jnp.float32))
    w_sdf = jnp.zeros((width, 8), dot_dtype).at[:, :1].set(
        p["sigma_linear"]["w"].astype(dot_dtype))
    b_sdf = jnp.zeros((1, 8), jnp.float32).at[:, :1].set(
        p["sigma_linear"]["b"].astype(jnp.float32))
    return (w_first, b_first, w_stack, b_stack, wv_pts, wv_dir, bv,
            w_rgb, b_rgb, w_sdf, b_sdf)


def _film_coeffs(p: Dict, style_1: jnp.ndarray, depth: int):
    """Per-layer gamma/beta for ONE style vector (tiny GEMMs outside the
    kernel).  Returns ([D, W], [D, W], [1, W], [1, W])."""
    from ..models.siren import apply_linear

    gammas, betas = [], []
    for i in range(depth):
        layer = p["pts_linears"][i]
        gammas.append(apply_linear(layer["gamma"], style_1, std_init=15.0, bias_init=30.0))
        betas.append(apply_linear(layer["beta"], style_1, std_init=0.25))
    gv = apply_linear(p["views_linear"]["gamma"], style_1, std_init=15.0, bias_init=30.0)
    bev = apply_linear(p["views_linear"]["beta"], style_1, std_init=0.25)
    return (jnp.concatenate(gammas, 0), jnp.concatenate(betas, 0),
            gv.reshape(1, -1), bev.reshape(1, -1))


@functools.partial(
    jax.jit, static_argnames=("depth", "width", "interpret", "dot_dtype")
)
def siren_field_fused_parts(
    params: Dict,
    pts: jnp.ndarray,    # [B, P, 3]
    views: jnp.ndarray,  # [B, P, 3]
    style: jnp.ndarray,  # [B, style_dim]
    depth: int = 8,
    width: int = 256,
    interpret: bool = False,
    dot_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused evaluation returning ``(rgb [B,P,3], sdf [B,P,1], feat [B,P,W])``.

    Matches ``apply_siren_generator_parts`` to ~1e-5 with
    ``dot_dtype=float32``; the default bf16 configuration is held to
    f32-ground-truth error no worse than the XLA bf16 path
    (``tests/test_ops.py::test_fused_siren_kernel_bf16_default_quality``).
    P is padded to a TILE multiple internally.
    """
    b, n, _ = pts.shape
    n_pad = (n + TILE - 1) // TILE * TILE
    packed = _pack_params(params, depth, width, dot_dtype)

    # interleave xyz / dirs into one [B, P, 8] tile-friendly input, stored
    # in the dot dtype (the first-layer matmul casts anyway — same values)
    x8 = jnp.zeros((b, n_pad, 8), dot_dtype)
    x8 = x8.at[:, :n, :3].set(pts.astype(dot_dtype))
    x8 = x8.at[:, :n, 4:7].set(views.astype(dot_dtype))

    def run_one(x_one, g, be, gv, bev):
        grid = (n_pad // TILE,)
        full = lambda *_: (0, 0)
        full3 = lambda *_: (0, 0, 0)
        out, feat = pl.pallas_call(
            functools.partial(_siren_kernel, dot_dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE, 8), lambda i: (i, 0)),
                pl.BlockSpec((8, width), full),
                pl.BlockSpec((1, width), full),
                pl.BlockSpec((depth - 1, width, width), full3),
                pl.BlockSpec((depth - 1, width), full),
                pl.BlockSpec((depth, width), full),
                pl.BlockSpec((depth, width), full),
                pl.BlockSpec((width, width), full),
                pl.BlockSpec((8, width), full),
                pl.BlockSpec((1, width), full),
                pl.BlockSpec((1, width), full),
                pl.BlockSpec((1, width), full),
                pl.BlockSpec((width, 8), full),
                pl.BlockSpec((1, 8), full),
                pl.BlockSpec((width, 8), full),
                pl.BlockSpec((1, 8), full),
            ],
            out_specs=[
                pl.BlockSpec((TILE, 16), lambda i: (i, 0)),
                pl.BlockSpec((TILE, width), lambda i: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_pad, 16), jnp.float32),
                # features stream out in the dot dtype — the compositing
                # weighted-sum promotes them elementwise (renderer._integrate)
                jax.ShapeDtypeStruct((n_pad, width), dot_dtype),
            ],
            interpret=interpret,
        )(
            x_one, packed[0], packed[1], packed[2], packed[3], g, be,
            packed[4], packed[5], packed[6], gv, bev,
            packed[7], packed[8], packed[9], packed[10],
        )
        return out, feat

    gammas, betas, gvs, bevs = jax.vmap(
        lambda s: _film_coeffs(params, s[None, :], depth)
    )(style)
    out, feat = jax.vmap(run_one)(x8, gammas, betas, gvs, bevs)
    return out[:, :n, :3], out[:, :n, 3:4], feat[:, :n, :]


def siren_field_fused(
    params: Dict,
    pts: jnp.ndarray,
    views: jnp.ndarray,
    style: jnp.ndarray,
    depth: int = 8,
    width: int = 256,
    interpret: bool = False,
    dot_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Concatenated [B, P, 4 + width] = [rgb, sdf, features] contract."""
    rgb, sdf, feat = siren_field_fused_parts(
        params, pts, views, style, depth=depth, width=width,
        interpret=interpret, dot_dtype=dot_dtype,
    )
    return jnp.concatenate([rgb, sdf, feat], axis=-1)
