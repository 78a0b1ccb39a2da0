"""Micro-scale fog/sparsity experiment on CPU.

Tiny stage-A GAN (16^2 renderer, 8 samples, width-32 SIREN) against
procedural 'blob on gray' images, bg_mode=gray.  Question: does lambda=0
drift toward a crossing-free SDF while sparsity_lambda>0 keeps/forms a
zero-level set?

Usage: python scripts/micro_geometry_cpu.py <sparsity_lambda> [iters]

Measured result (docs/TRAINING_RUN.md "CPU micro-scale control"): the
prior's gradient direction is confirmed — lambda=0.1 clears density
(bg transmittance 0.38 -> 0.72) where lambda=0 drifts into weak positive
fog — but NO arm forms a surface, because the 16^2 discriminator never
leaves chance (d ~ 1.3): the harness validates mechanics, not the
equilibrium.  Geometry conclusions need the real 64^2 runs.
"""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from sdface_gan_tpu.models.discriminator import (
    VolumeRenderDiscConfig, init_volume_render_discriminator)
from sdface_gan_tpu.models.generator import GeneratorConfig, init_generator
from sdface_gan_tpu.models.renderer import RendererConfig
from sdface_gan_tpu.training.steps import (
    TrainHParams, make_sphere_init_step, make_stage_a_d_step,
    make_stage_a_g_step)
from sdface_gan_tpu.training import stage_a_optimizers

LAM = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 400
RES, NS, W, B = 16, 8, 32, 8

GCFG = GeneratorConfig(
    size=RES, style_dim=32, full_pipeline=False,
    renderer=RendererConfig(type="sdf", out_im_res=RES, n_samples=NS,
                            style_dim=32, width=W, depth=3,
                            bg_mode="gray", return_sdf=True),
)
DCFG = VolumeRenderDiscConfig(in_res=RES)
HP = TrainHParams(batch=B, style_dim=32, r1=100.0, sparsity_lambda=LAM)


def blob_batch(rng, b):
    """Shaded-sphere blobs on constant mid-gray, pose-correlated shift."""
    yy, xx = np.mgrid[0:RES, 0:RES].astype(np.float32)
    yy = (yy - RES / 2 + 0.5) / (RES / 2)
    xx = (xx - RES / 2 + 0.5) / (RES / 2)
    imgs = np.zeros((b, RES, RES, 3), np.float32)
    for i in range(b):
        cx = rng.normal(0, 0.15); cy = rng.normal(0, 0.1)
        r = 0.55 + rng.uniform(-0.05, 0.05)
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2
        inside = d2 < r * r
        nz = np.sqrt(np.clip(r * r - d2, 0, None)) / r
        shade = 0.3 + 0.7 * nz
        col = rng.uniform(0.3, 1.0, size=3).astype(np.float32)
        img = np.full((RES, RES, 3), 0.0, np.float32)  # mid-gray in [-1,1]
        for c in range(3):
            img[..., c] = np.where(inside, (col[c] * shade) * 2 - 1, 0.0)
        imgs[i] = img
    return jnp.asarray(imgs)


key = jax.random.PRNGKey(0)
g = init_generator(key, GCFG)
d = init_volume_render_discriminator(jax.random.PRNGKey(1), DCFG)
g_tx, d_tx = stage_a_optimizers()
g_state, d_state = g_tx.init(g), d_tx.init(d)

# sphere init
init_hp = TrainHParams(batch=3, style_dim=32, camera=HP.camera)
init_step = jax.jit(make_sphere_init_step(GCFG, init_hp, g_tx))
for i in range(300):
    key, sub = jax.random.split(key)
    g, g_state, m = init_step(g, g_state, sub)
g_state = g_tx.init(g)
ema = jax.tree_util.tree_map(jnp.copy, g)

d_step = jax.jit(make_stage_a_d_step(GCFG, DCFG, HP, d_tx))
g_step = jax.jit(make_stage_a_g_step(GCFG, DCFG, HP, g_tx))

# probe: frontal render of the sdf via the G step's own forward
from sdface_gan_tpu.geometry import generate_camera_params
from sdface_gan_tpu.models.generator import map_style
from sdface_gan_tpu.models.renderer import render
from dataclasses import replace
rcfg = replace(GCFG.renderer, perturb=0.0, static_viewdirs=True, return_xyz=True)
front = generate_camera_params(RES, None, batch=1, locations=jnp.zeros((1, 2)))

def probe(params, tag):
    z = jax.random.normal(jax.random.PRNGKey(7), (1, 32))
    style = map_style(params, z)
    out = render(params["renderer"], rcfg, front.focal, front.extrinsics,
                 front.near, front.far, style)
    s = np.asarray(out.sdf)
    crossing = float(np.mean((s.min(axis=-2) < 0) & (s.max(axis=-2) > 0)))
    print(f"{tag}: sdf[{s.min():+.3f},{s.max():+.3f}] cross {crossing:.3f} "
          f"bgw {np.asarray(out.mask).mean():.3f}", flush=True)

rng = np.random.default_rng(0)
probe(g, "init")
t0 = time.time()
for i in range(ITERS):
    key, k1, k2 = jax.random.split(key, 3)
    real = blob_batch(rng, B)
    d, d_state, dm = d_step(g, d, d_state, k1, real)
    g, g_state, ema, gm = g_step(g, d, g_state, ema, k2)
    if i % 100 == 0 or i == ITERS - 1:
        print(f"[{i}] d={float(dm['d']):.3f} g={float(gm['g']):.3f} "
              f"fg={float(gm['fg_mass']):.3f} "
              f"spars={float(gm.get('g_sparsity', 0.0)):.4f} "
              f"({time.time()-t0:.0f}s)", flush=True)
        probe(g, f"  it{i}")
probe(ema, "final-ema")
