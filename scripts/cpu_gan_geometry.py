"""CPU GAN geometry-formation experiment at 32^2.

The 16^2 micro GAN (micro_geometry_cpu.py) is inconclusive: its
discriminator never leaves chance, so no adversarial pressure exists and
the cheapest field is an empty one.  This harness scales the same
production stage-A steps to 32^2 with TRUE 3D pose-correlated data —
lambertian spheres rendered analytically through the SAME camera model
the generator samples (generate_camera_params), so real images carry
genuine parallax, not image-space shifts — and runs the stacked
geometry counters (bg_mode=gray, view_independent, sparsity/distortion).

Question: under a discriminator that does leave chance, do the priors
hold/form a zero-level set (the supervised control says they recover
exact geometry without a GAN; docs/TRAINING_RUN.md)?

Usage: python scripts/cpu_gan_geometry.py [iters] [sparsity] [distortion]
           [view_independent 0|1] [res]
"""
import sys
import time
from dataclasses import replace

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from sdface_gan_tpu.geometry import generate_camera_params
from sdface_gan_tpu.geometry.rays import get_rays
from sdface_gan_tpu.models.discriminator import (
    VolumeRenderDiscConfig,
    init_volume_render_discriminator,
)
from sdface_gan_tpu.models.generator import (
    GeneratorConfig,
    init_generator,
    map_style,
)
from sdface_gan_tpu.models.renderer import RendererConfig, render
from sdface_gan_tpu.training import stage_a_optimizers
from sdface_gan_tpu.training.steps import (
    CameraHParams,
    TrainHParams,
    make_sphere_init_step,
    make_stage_a_d_step,
    make_stage_a_g_step,
)

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
LAM_S = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
LAM_D = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
VIEW_INDEP = bool(int(sys.argv[4])) if len(sys.argv) > 4 else True
RES = int(sys.argv[5]) if len(sys.argv) > 5 else 32
NS, W, B, SDIM = 12, 48, 8, 64

GCFG = GeneratorConfig(
    size=RES, style_dim=SDIM, full_pipeline=False,
    renderer=RendererConfig(
        type="sdf", out_im_res=RES, n_samples=NS, style_dim=SDIM, width=W,
        depth=4, bg_mode="gray", view_independent=VIEW_INDEP,
    ),
)
DCFG = VolumeRenderDiscConfig(in_res=RES)
HP = TrainHParams(batch=B, style_dim=SDIM, r1=100.0,
                  sparsity_lambda=LAM_S, distortion_lambda=LAM_D)


def real_batch(rng, b):
    """True-3D data: lambertian spheres (radius inside the sampling band)
    through the production camera distribution — same generator camera
    model, so the only way to explain the set is parallax + shading."""
    locs = jnp.asarray(
        np.stack([rng.normal(0, 0.3, b), rng.normal(0, 0.15, b)], -1),
        dtype=jnp.float32,
    )
    cams = generate_camera_params(RES, None, batch=b, locations=locs)
    rays = get_rays(cams.focal, cams.extrinsics, RES, static_viewdirs=False)
    o = np.asarray(rays.origins)
    d = np.asarray(rays.directions)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    imgs = np.zeros((b, RES, RES, 3), np.float32)
    for i in range(b):
        r = rng.uniform(0.07, 0.10)
        bq = np.sum(o[i] * d[i], axis=-1)
        cq = np.sum(o[i] * o[i], axis=-1) - r * r
        disc = bq * bq - cq
        hit = disc > 0
        t = -bq - np.sqrt(np.clip(disc, 0, None))
        p = o[i] + d[i] * t[..., None]
        n = p / r
        light = np.array([0.4, 0.4, -0.8])
        light /= np.linalg.norm(light)
        shade = 0.25 + 0.75 * np.clip(-(n @ light), 0, 1)
        col = rng.uniform(0.3, 1.0, 3)
        for ch in range(3):
            imgs[i, ..., ch] = np.where(hit, col[ch] * shade * 2 - 1, 0.0)
    return jnp.asarray(imgs)


key = jax.random.PRNGKey(0)
g = init_generator(key, GCFG)
d = init_volume_render_discriminator(jax.random.PRNGKey(1), DCFG)
g_tx, d_tx = stage_a_optimizers()

# sphere init (radius matched to the data objects)
init_hp = TrainHParams(batch=3, style_dim=SDIM, camera=HP.camera)
init_step = jax.jit(make_sphere_init_step(GCFG, init_hp, g_tx))
g_state = g_tx.init(g)
for i in range(500):
    key, sub = jax.random.split(key)
    g, g_state, m = init_step(g, g_state, sub)
g_state = g_tx.init(g)
d_state = d_tx.init(d)
ema = jax.tree_util.tree_map(jnp.copy, g)

d_step = jax.jit(make_stage_a_d_step(GCFG, DCFG, HP, d_tx))
g_step = jax.jit(make_stage_a_g_step(GCFG, DCFG, HP, g_tx))

# frontal SDF probe
rcfg = replace(GCFG.renderer, perturb=0.0, static_viewdirs=True,
               return_sdf=True, return_xyz=True)
front = generate_camera_params(RES, None, batch=1, locations=jnp.zeros((1, 2)))


def probe(params, tag):
    z = jax.random.normal(jax.random.PRNGKey(7), (1, SDIM))
    style = map_style(params, z)
    out = render(params["renderer"], rcfg, front.focal, front.extrinsics,
                 front.near, front.far, style)
    s = np.asarray(out.sdf)
    crossing = float(np.mean((s.min(axis=-2) < 0) & (s.max(axis=-2) > 0)))
    print(f"{tag}: sdf[{s.min():+.3f},{s.max():+.3f}] cross {crossing:.3f} "
          f"bgw {np.asarray(out.mask).mean():.3f}", flush=True)


print(f"iters={ITERS} sparsity={LAM_S} distortion={LAM_D} "
      f"view_independent={VIEW_INDEP} res={RES}", flush=True)
rng = np.random.default_rng(0)
probe(g, "init")
t0 = time.time()
for i in range(ITERS):
    key, k1, k2 = jax.random.split(key, 3)
    real = real_batch(rng, B)
    d, d_state, dm = d_step(g, d, d_state, k1, real)
    g, g_state, ema, gm = g_step(g, d, g_state, ema, k2)
    if i % 200 == 0 or i == ITERS - 1:
        print(f"[{i}] d={float(dm['d']):.3f} "
              f"real={float(dm['real_score']):.2f} "
              f"fake={float(dm['fake_score']):.2f} g={float(gm['g']):.3f} "
              f"fg={float(gm['fg_mass']):.3f} "
              f"spars={float(gm.get('g_sparsity', 0.0)):.4f} "
              f"dist={float(gm.get('g_distortion', 0.0)):.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)
        probe(g, f"  it{i}")
probe(ema, "final-ema")
