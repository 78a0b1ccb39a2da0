"""Micro-scale SUPERVISED geometry control on CPU.

The GAN micro harness (micro_geometry_cpu.py) is inconclusive on geometry
because its 16^2 discriminator never leaves chance.  This script removes
the GAN entirely: fit the stage-A renderer to a fixed set of POSED images
of one procedural blob by direct L2 photometric loss (NeRF-style), which
supplies the strongest possible multi-view constraint.  Question: does
parallax supervision alone produce a zero-crossing SDF, and does the
view-independent field (rendering.view_independent) need it / the
view-dependent field dodge it?

Arms: {view_dep, view_indep} x {sparsity, distortion} lambdas.

Usage: python scripts/micro_supervised_cpu.py <view_independent 0|1>
           [sparsity_lambda] [iters] [distortion_lambda]

This validates the *mechanism* the solid configs rely on
(docs/TRAINING_RUN.md "The remaining leak"): if even supervised fitting
forms no surface with view_independent=1, the leak diagnosis is wrong; if
it forms one only with view_independent=1, the knob is load-bearing.
"""
import sys
import time
from dataclasses import replace

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax

from sdface_gan_tpu.geometry import generate_camera_params
from sdface_gan_tpu.losses.geometry_losses import (
    distortion_loss,
    occupancy_sparsity_loss,
)
from sdface_gan_tpu.models.renderer import RendererConfig, init_renderer, render

VIEW_INDEP = bool(int(sys.argv[1])) if len(sys.argv) > 1 else True
LAM = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 600
LAM_DIST = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
RES, NS, W = 16, 10, 32

CFG = RendererConfig(
    type="sdf", out_im_res=RES, n_samples=NS, style_dim=32, width=W, depth=3,
    bg_mode="gray", view_independent=VIEW_INDEP, return_sdf=True, perturb=0.0,
    return_weights=LAM_DIST > 0,
)

# --- fixed posed views of one lambertian blob (same camera model the
# renderer uses, so pixels correspond across views only via parallax) ---
N_VIEWS = 24
key = jax.random.PRNGKey(0)
locations = jnp.stack(
    [
        jax.random.normal(jax.random.PRNGKey(10), (N_VIEWS,)) * 0.3,
        jax.random.normal(jax.random.PRNGKey(11), (N_VIEWS,)) * 0.15,
    ],
    axis=-1,
)
cams = generate_camera_params(RES, None, batch=N_VIEWS, locations=locations)


def render_blob(cams):
    """Analytic render of a lambertian sphere at the origin through the
    SAME ray geometry as the renderer: per-pixel ray-sphere intersection.

    The radius must keep the surface INSIDE the sampled depth band
    [near, far] = [0.88, 1.12] (camera distance ~1): r < 0.12, and small
    enough that some background pixels remain (angular radius below the
    6 deg half-fov).  r=0.35 was measured to be degenerate — the whole
    band sits inside the sphere, so a crossing-free negative SDF is the
    CORRECT fit and the arms can't be compared."""
    from sdface_gan_tpu.geometry.rays import get_rays

    rays = get_rays(cams.focal, cams.extrinsics, RES, static_viewdirs=False)
    o = np.asarray(rays.origins)  # [V,H,W,3]
    d = np.asarray(rays.directions)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    r = 0.10
    b = np.sum(o * d, axis=-1)
    c = np.sum(o * o, axis=-1) - r * r
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.clip(disc, 0, None))
    p = o + d * t[..., None]
    n = p / r
    light = np.array([0.4, 0.4, -0.8])
    light = light / np.linalg.norm(light)
    shade = 0.25 + 0.75 * np.clip(-(n @ light), 0, 1)
    col = np.array([0.9, 0.55, 0.35])
    img = np.zeros((N_VIEWS, RES, RES, 3), np.float32)
    img[..., :] = 0.0  # mid-gray background in [-1,1]
    for ch in range(3):
        img[..., ch] = np.where(hit, col[ch] * shade * 2 - 1, 0.0)
    return jnp.asarray(img)


TARGET = render_blob(cams)
print(f"target bg fraction {float(np.mean(np.all(np.asarray(TARGET) == 0.0, -1))):.3f}")
STYLE = jnp.zeros((N_VIEWS, 32))  # one identity; style path held constant

params = init_renderer(jax.random.PRNGKey(1), CFG)
tx = optax.adam(2e-4)
opt_state = tx.init(params)


def loss_fn(p):
    out = render(p, CFG, cams.focal, cams.extrinsics, cams.near, cams.far, STYLE)
    l2 = jnp.mean((out.rgb - TARGET) ** 2)
    spars = occupancy_sparsity_loss(out.sdf, p["sigmoid_beta"])
    loss = l2 + LAM * spars
    if LAM_DIST > 0:
        loss = loss + LAM_DIST * distortion_loss(out.weights, out.s_vals)
    return loss, (l2, spars)


@jax.jit
def step(p, s):
    (loss, (l2, sp)), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
    updates, s = tx.update(grads, s, p)
    return optax.apply_updates(p, updates), s, l2, sp


front = generate_camera_params(RES, None, batch=1, locations=jnp.zeros((1, 2)))
pcfg = replace(CFG, static_viewdirs=True, return_xyz=True)


def probe(p, tag):
    out = render(p, pcfg, front.focal, front.extrinsics, front.near, front.far,
                 STYLE[:1])
    s = np.asarray(out.sdf)
    crossing = float(np.mean((s.min(axis=-2) < 0) & (s.max(axis=-2) > 0)))
    print(
        f"{tag}: sdf[{s.min():+.3f},{s.max():+.3f}] cross {crossing:.3f} "
        f"bgw {np.asarray(out.mask).mean():.3f}",
        flush=True,
    )
    return crossing


print(f"view_independent={VIEW_INDEP} sparsity={LAM} distortion={LAM_DIST} iters={ITERS}")
probe(params, "init")
t0 = time.time()
for i in range(ITERS):
    params, opt_state, l2, sp = step(params, opt_state)
    if i % 100 == 0 or i == ITERS - 1:
        print(f"[{i}] l2={float(l2):.5f} spars={float(sp):.3f} "
              f"({time.time() - t0:.0f}s)", flush=True)
        probe(params, f"  it{i}")
final_cross = probe(params, "final")
