"""Jitted train steps for the three SDF training stages.

Functional rebuild of the reference loops (``im2scene/training_utils.py``):

* sphere init      (``:287-327``)  — L1-regress the SDF to a centered sphere
* stage A D / G    (``:338-454``)  — volume renderer vs CoordConv D, with
  R1 (every step), viewpoint, eikonal, minimal-surface and NGP-smoothness
* stage B D / G    (``:655-790``)  — StyleGAN decoder vs StyleGAN D, with
  lazy R1 (every ``d_reg_every``), content loss, path-length reg (every
  ``g_reg_every``)

Each step is a pure function ``(params, opt_state, key, batch) ->
(params, opt_state, metrics)`` built by a ``make_*`` factory that closes
over static configs and optax transforms, ready for ``jax.jit`` with
sharding annotations (see :mod:`sdface_gan_tpu.parallel`).

TPU-first notes: the reference's host-side ``chunk`` microbatching
(``training_utils.py:365-375``) exists to fit an 11 GB GPU; on TPU the
whole batch is one XLA program.  Style mixing and the injection index are
drawn INSIDE jit (traced ``where`` masks), so a single compiled step covers
both mixed and unmixed iterations — no retracing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..geometry.cameras import CameraParams, generate_camera_params
from ..losses.gan_losses import (
    d_logistic_loss,
    d_logits_and_r1,
    g_content_loss,
    g_nonsaturating_loss,
    g_path_regularize,
    viewpoints_loss,
)
from ..losses.geometry_losses import (
    distortion_loss,
    eikonal_loss,
    hash_smoothness_loss,
    occupancy_sparsity_loss,
    sphere_init_loss,
)
from ..models.discriminator import (
    StyleDiscConfig,
    VolumeRenderDiscConfig,
    apply_style_discriminator,
    apply_volume_render_discriminator,
)
from ..models.generator import (
    GeneratorConfig,
    generator_forward,
    generator_init_forward,
    map_style,
)
from ..models.renderer import render
from ..models.stylegan2 import apply_decoder, make_decoder_latent
from .ema import EMA_DECAY, accumulate

Params = Dict[str, Any]


@dataclass(frozen=True)
class CameraHParams:
    """Camera sampling knobs (reference ``SDFOptions`` camera group,
    ``sdf_utils.py:560-575``)."""

    uniform: bool = False
    azim: float = 0.3
    elev: float = 0.15
    fov: float = 6.0
    dist_radius: float = 0.12


@dataclass(frozen=True)
class TrainHParams:
    """Training hyperparameters (reference ``SDFOptions`` training group,
    ``sdf_utils.py:447-530``)."""

    batch: int = 8
    style_dim: int = 256
    r1: float = 10.0
    view_lambda: float = 15.0
    eikonal_lambda: float = 0.1
    min_surf_lambda: float = 0.05
    min_surf_beta: float = 100.0
    sparsity_lambda: float = 0.0  # occupancy sparsity prior, not in reference
    distortion_lambda: float = 0.0  # mip-NeRF 360 distortion, not in reference
    smooth_lambda: float = 1000.0
    # Mixed-precision G compute: cast the f32 master params to this dtype
    # wherever a G forward runs — inside the stage-A/B G-step loss closures
    # (grads come back f32 through the cast's VJP, so optimizer/EMA state
    # stays full precision) AND for the detached fake generation inside
    # both D steps.  "bfloat16" halves the [B*res^2*S, width] activation
    # traffic of the eikonal reverse-over-reverse — the binding cost of
    # the 355 ms stage-A G step — and the field eval that dominates the D
    # steps (docs/PERFORMANCE.md).  The renderer pins compositing to f32
    # internally regardless; the stage-B path-reg step stays f32 (see
    # make_stage_b_g_step).
    g_param_dtype: str = "float32"
    mixing: float = 0.9
    d_reg_every: int = 16
    g_reg_every: int = 4
    # Stage-A lazy R1: the reference penalizes R1 every D step in stage A
    # (``training_utils.py:345-397``) while stage B uses StyleGAN2's lazy
    # regularization (every ``d_reg_every``, ``config.py:202-218``).  1 keeps
    # strict stage-A parity; >1 applies the same lazy convention to stage A
    # (penalty scaled by the interval, optimizer lr/betas ratio-adjusted) —
    # a TPU-config knob, measured in docs/PERFORMANCE.md.
    a_d_reg_every: int = 1
    path_regularize: float = 2.0
    path_batch_shrink: int = 2
    camera: CameraHParams = field(default_factory=CameraHParams)


# The hardcoded stage-A smoothness bounding box (axis-aligned min/max),
# reference ``training_utils.py:433-437``.  np (not jnp): a module-level
# jnp.array would initialize the JAX backend at import time, defeating the
# post-import platform override this machine requires (CLAUDE.md).
SMOOTH_BBOX = np.array([[-1.0, 7.0], [-1.3, 3.7], [-1.7, 1.4]], dtype=np.float32)


def _cast_params(params: Params, cast_dt) -> Params:
    """Cast f32 leaves to ``cast_dt`` (identity when ``cast_dt`` is None).

    Used for the mixed-precision G forward (``TrainHParams.g_param_dtype``):
    inside a differentiated closure the cast's VJP returns the gradients to
    f32, so optimizer/EMA state always stays full precision."""
    if cast_dt is None:
        return params
    return jax.tree_util.tree_map(
        lambda x: x.astype(cast_dt) if x.dtype == jnp.float32 else x, params
    )


def _sample_cameras(key: jax.Array, res: int, batch: int, cam: CameraHParams) -> CameraParams:
    return generate_camera_params(
        res,
        key,
        batch=batch,
        uniform=cam.uniform,
        azim_range=cam.azim,
        elev_range=cam.elev,
        fov_ang=cam.fov,
        dist_radius=cam.dist_radius,
    )


def _mixing_latents(
    key: jax.Array, batch: int, style_dim: int, mixing_prob: float, n_latent: int
):
    """Draw (z1, z2, inject_index): with prob ``mixing_prob`` two distinct
    codes and a random injection layer, else one code for all layers
    (reference ``mixing_noise``, ``sdf_utils.py:80-93``) — all inside jit."""
    kz, kcoin, kidx = jax.random.split(key, 3)
    z = jax.random.normal(kz, (2, batch, style_dim))
    coin = jax.random.uniform(kcoin, ())
    mixed = coin < mixing_prob
    z2 = jnp.where(mixed, z[1], z[0])
    idx = jnp.where(
        mixed, jax.random.randint(kidx, (), 1, n_latent), n_latent
    )
    return z[0], z2, idx


# ---------------------------------------------------------------------------
# Sphere init (stage A warmup)
# ---------------------------------------------------------------------------

def make_sphere_init_step(gcfg: GeneratorConfig, hp: TrainHParams, tx: optax.GradientTransformation):
    """Reference ``training_utils.py:287-327``: 10k iters of
    ``L1(sdf, ||p|| - r)`` through ``init_forward``."""

    res = gcfg.renderer.out_im_res

    def step(g_params: Params, opt_state, key: jax.Array):
        kz, kc, kr = jax.random.split(key, 3)
        z = jax.random.normal(kz, (hp.batch, hp.style_dim))
        cams = _sample_cameras(kc, res, hp.batch, hp.camera)

        def loss_fn(gp):
            sdf, target = generator_init_forward(
                gp, gcfg, [z], cams.extrinsics, cams.focal, cams.near, cams.far, kr
            )
            return sphere_init_loss(sdf, target)

        loss, grads = jax.value_and_grad(loss_fn)(g_params)
        updates, opt_state = tx.update(grads, opt_state, g_params)
        g_params = optax.apply_updates(g_params, updates)
        return g_params, opt_state, {"sdf_init_loss": loss}

    return step


# ---------------------------------------------------------------------------
# Stage A: volume renderer adversarial steps
# ---------------------------------------------------------------------------

def make_stage_a_d_step(
    gcfg: GeneratorConfig,
    dcfg: VolumeRenderDiscConfig,
    hp: TrainHParams,
    d_tx: optax.GradientTransformation,
    with_r1: bool = True,
):
    """Reference ``training_utils.py:345-397``: D on 64^2 thumbs with
    logistic loss + R1 (every step, weight r1/2) + viewpoint smooth-L1.

    ``with_r1=False`` builds the plain variant for lazy stage-A R1
    (``TrainHParams.a_d_reg_every`` > 1): the regularized variant then
    scales the penalty by the interval, the StyleGAN2 lazy-reg convention
    the stage-B D already follows (reference ``sdf_model.py`` /
    ``config.py:202-218``)."""

    res = gcfg.renderer.out_im_res
    # The viewpoint head is absent when view_lambda == 0 (reference
    # ``viewpoint_condition``, training_utils.py:341): the D returns None
    # for view predictions and the loss term must be skipped entirely.
    use_view = hp.view_lambda > 0 and dcfg.viewpoint_head
    # The fake forward is inference (detached below), so it runs at the
    # same precision the G step trains at: in the bf16 config this halves
    # the D step's dominant cost, the field eval (docs/PERFORMANCE.md).
    cast_dt = None if hp.g_param_dtype == "float32" else jnp.dtype(hp.g_param_dtype)

    def step(
        g_params: Params,
        d_params: Params,
        d_opt_state,
        key: jax.Array,
        real_thumbs: jnp.ndarray,
    ):
        kz, kc, kr = jax.random.split(key, 3)
        z = jax.random.normal(kz, (hp.batch, hp.style_dim))
        cams = _sample_cameras(kc, res, hp.batch, hp.camera)
        out = generator_forward(
            _cast_params(g_params, cast_dt),
            gcfg, [z], cams.extrinsics, cams.focal, cams.near, cams.far, key=kr,
        )
        fake = jax.lax.stop_gradient(out.thumb_rgb).astype(jnp.float32)

        def loss_fn(dp):
            fake_pred, fake_view = apply_volume_render_discriminator(dp, dcfg, fake)
            d_view = (
                hp.view_lambda * viewpoints_loss(fake_view, cams.viewpoint)
                if use_view
                else jnp.zeros(())
            )
            if with_r1:
                # one D forward on real images yields both logits and R1;
                # under lazy reg the penalty amortizes over the interval
                real_pred, penalty = d_logits_and_r1(
                    lambda img: apply_volume_render_discriminator(dp, dcfg, img)[0],
                    real_thumbs,
                )
                r1 = hp.r1 * 0.5 * penalty * max(hp.a_d_reg_every, 1)
            else:
                real_pred, _ = apply_volume_render_discriminator(dp, dcfg, real_thumbs)
                r1 = jnp.zeros(())
            gan = d_logistic_loss(real_pred, fake_pred)
            loss = gan + r1 + d_view
            metrics = {
                "d": gan,
                "d_view": d_view,
                "real_score": jnp.mean(real_pred),
                "fake_score": jnp.mean(fake_pred),
            }
            if with_r1:
                metrics["r1"] = r1
            return loss, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(d_params)
        updates, d_opt_state = d_tx.update(grads, d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, updates)
        return d_params, d_opt_state, metrics

    return step


def make_stage_a_g_step(
    gcfg: GeneratorConfig,
    dcfg: VolumeRenderDiscConfig,
    hp: TrainHParams,
    g_tx: optax.GradientTransformation,
    ema_decay: float = EMA_DECAY,
):
    """Reference ``training_utils.py:399-454``: G nonsat + viewpoint +
    eikonal + minimal-surface (+ NGP hash TV smoothness), then EMA."""

    res = gcfg.renderer.out_im_res
    is_ngp = gcfg.renderer.type == "ngp"
    use_eik = hp.eikonal_lambda > 0
    use_msurf = hp.min_surf_lambda > 0
    use_sparsity = hp.sparsity_lambda > 0
    use_dist = hp.distortion_lambda > 0
    use_view = hp.view_lambda > 0 and dcfg.viewpoint_head
    cast_dt = None if hp.g_param_dtype == "float32" else jnp.dtype(hp.g_param_dtype)

    def step(
        g_params: Params,
        d_params: Params,
        g_opt_state,
        ema_params: Params,
        key: jax.Array,
    ):
        kz, kc, kr, ks = jax.random.split(key, 4)
        z = jax.random.normal(kz, (hp.batch, hp.style_dim))
        cams = _sample_cameras(kc, res, hp.batch, hp.camera)

        def loss_fn(gp):
            gp_c = _cast_params(gp, cast_dt)
            out = generator_forward(
                gp_c,
                gcfg,
                [z],
                cams.extrinsics,
                cams.focal,
                cams.near,
                cams.far,
                key=kr,
                return_sdf=use_msurf or use_sparsity,
                return_xyz=True,  # mask -> fg_mass diagnostic (below)
                return_eikonal=use_eik,
                return_weights=use_dist,
            )
            fake_pred, fake_view = apply_volume_render_discriminator(
                d_params, dcfg, out.thumb_rgb
            )
            g_gan = g_nonsaturating_loss(fake_pred)
            g_view = (
                hp.view_lambda * viewpoints_loss(fake_view, cams.viewpoint)
                if use_view
                else jnp.zeros(())
            )
            eik, msurf = eikonal_loss(
                out.eikonal_term if use_eik else None,
                out.sdf if use_msurf else None,
                beta=hp.min_surf_beta,
            )
            loss = (
                g_gan + g_view + hp.eikonal_lambda * eik + hp.min_surf_lambda * msurf
            )
            if use_sparsity:
                sparsity = occupancy_sparsity_loss(
                    out.sdf, gp["renderer"]["sigmoid_beta"]
                )
                loss = loss + hp.sparsity_lambda * sparsity
            metrics = {
                "g": g_gan,
                "g_view": g_view,
                "g_eikonal": hp.eikonal_lambda * eik,
                "g_minimal_surface": hp.min_surf_lambda * msurf,
                # Foreground mass: how much compositing weight lands INSIDE
                # the volume vs on the infinite-dist last sample (the "sky
                # dome").  A healthy 3D run stays well above 0; a collapse
                # to a far-plane billboard — geometry erased, images painted
                # on the dome — drives this to 0 while every OTHER curve
                # still looks like a converging GAN (docs/TRAINING_RUN.md).
                "fg_mass": 1.0 - jnp.mean(out.mask),
            }
            if use_sparsity:
                metrics["g_sparsity"] = hp.sparsity_lambda * sparsity
            if use_dist:
                dist = distortion_loss(out.weights, out.s_vals)
                loss = loss + hp.distortion_lambda * dist
                metrics["g_distortion"] = hp.distortion_lambda * dist
            if is_ngp and hp.smooth_lambda > 0:
                smooth = hash_smoothness_loss(
                    gp["renderer"]["network"]["hash_table"],
                    gcfg.renderer.network_config().grid,
                    ks,
                    SMOOTH_BBOX,
                    bound=gcfg.renderer.network_config().bound,
                )
                loss = loss + hp.smooth_lambda * smooth
                metrics["g_smooth"] = hp.smooth_lambda * smooth
            return loss, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(g_params)
        updates, g_opt_state = g_tx.update(grads, g_opt_state, g_params)
        g_params = optax.apply_updates(g_params, updates)
        ema_params = accumulate(ema_params, g_params, ema_decay)
        return g_params, g_opt_state, ema_params, metrics

    return step


# ---------------------------------------------------------------------------
# Stage B: full pipeline adversarial steps
# ---------------------------------------------------------------------------

def make_stage_b_d_step(
    gcfg: GeneratorConfig,
    dcfg: StyleDiscConfig,
    hp: TrainHParams,
    d_tx: optax.GradientTransformation,
    regularize: bool,
):
    """Reference ``training_utils.py:660-717``: StyleGAN D step; R1 only on
    regularize iterations, scaled by ``d_reg_every`` (lazy regularization).
    ``regularize`` is static — the driver alternates two compiled variants.
    """

    res = gcfg.renderer.out_im_res
    n_latent = gcfg.decoder.n_latent
    # Fake generation is inference (detached below) — run it at the
    # G-step precision (see make_stage_a_d_step).
    cast_dt = None if hp.g_param_dtype == "float32" else jnp.dtype(hp.g_param_dtype)

    def step(
        g_params: Params,
        d_params: Params,
        d_opt_state,
        key: jax.Array,
        real_imgs: jnp.ndarray,
    ):
        kz, kc, kr = jax.random.split(key, 3)
        z1, z2, idx = _mixing_latents(kz, hp.batch, hp.style_dim, hp.mixing, n_latent)
        cams = _sample_cameras(kc, res, hp.batch, hp.camera)
        out = generator_forward(
            _cast_params(g_params, cast_dt),
            gcfg,
            [z1, z2],
            cams.extrinsics,
            cams.focal,
            cams.near,
            cams.far,
            key=kr,
            inject_index=idx,
        )
        fake = jax.lax.stop_gradient(out.rgb).astype(jnp.float32)

        def loss_fn(dp):
            fake_pred = apply_style_discriminator(dp, dcfg, fake)
            if regularize:
                # one D forward on real images yields both logits and R1
                real_pred, penalty = d_logits_and_r1(
                    lambda img: apply_style_discriminator(dp, dcfg, img), real_imgs
                )
            else:
                real_pred = apply_style_discriminator(dp, dcfg, real_imgs)
            gan = d_logistic_loss(real_pred, fake_pred)
            metrics = {
                "d": gan,
                "real_score": jnp.mean(real_pred),
                "fake_score": jnp.mean(fake_pred),
            }
            loss = gan
            if regularize:
                r1 = hp.r1 * 0.5 * penalty * hp.d_reg_every
                loss = loss + r1
                metrics["r1"] = r1
            return loss, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(d_params)
        updates, d_opt_state = d_tx.update(grads, d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, updates)
        return d_params, d_opt_state, metrics

    return step


def _nearest_upsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """torch ``nn.Upsample(scale_factor=f)`` default (nearest) in NHWC."""
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


def make_stage_b_g_step(
    gcfg: GeneratorConfig,
    dcfg: StyleDiscConfig,
    hp: TrainHParams,
    g_tx: optax.GradientTransformation,
    content_lambda: float = 0.001,
):
    """Reference ``training_utils.py:721-745``: G nonsat + content loss
    against the 4x-nearest-upsampled thumb.  EMA accumulation happens in
    the LOOP after path regularization (see the note in ``step``)."""

    res = gcfg.renderer.out_im_res
    n_latent = gcfg.decoder.n_latent
    up_factor = gcfg.size // res
    # Mixed precision mirrors stage A: cast INSIDE the loss closure so
    # decoder grads come back f32 through the cast's VJP.  The renderer
    # half of the tree is frozen here (decoder-only optimizer), so its
    # cast is pure inference.  The path-reg step stays f32: its
    # double-backprop is the training signal itself and runs on a shrunk
    # batch every g_reg_every iterations (cheap), so there is nothing to
    # win and precision to lose.
    cast_dt = None if hp.g_param_dtype == "float32" else jnp.dtype(hp.g_param_dtype)

    def step(
        g_params: Params,
        d_params: Params,
        g_opt_state,
        key: jax.Array,
    ):
        kz, kc, kr = jax.random.split(key, 3)
        z1, z2, idx = _mixing_latents(kz, hp.batch, hp.style_dim, hp.mixing, n_latent)
        cams = _sample_cameras(kc, res, hp.batch, hp.camera)

        def loss_fn(gp):
            out = generator_forward(
                _cast_params(gp, cast_dt),
                gcfg,
                [z1, z2],
                cams.extrinsics,
                cams.focal,
                cams.near,
                cams.far,
                key=kr,
                inject_index=idx,
            )
            fake_pred = apply_style_discriminator(d_params, dcfg, out.rgb)
            g_gan = g_nonsaturating_loss(fake_pred)
            up = _nearest_upsample(out.thumb_rgb, up_factor)
            cont = g_content_loss(out.rgb, up)
            loss = g_gan + content_lambda * cont
            return loss, {"g": g_gan, "g_content": cont}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(g_params)
        updates, g_opt_state = g_tx.update(grads, g_opt_state, g_params)
        g_params = optax.apply_updates(g_params, updates)
        # NOTE: stage B does NOT fold the EMA in here — the reference
        # accumulates once per iteration AFTER path regularization
        # (training_utils.py:780), which updates the decoder again on
        # g_reg_every iterations.  The loop applies accumulate separately.
        return g_params, g_opt_state, metrics

    return step


def make_stage_b_path_step(
    gcfg: GeneratorConfig,
    hp: TrainHParams,
    g_tx: optax.GradientTransformation,
):
    """Reference ``training_utils.py:747-778``: StyleGAN2 path-length
    regularization every ``g_reg_every`` iterations on a shrunk batch.

    The renderer is frozen in stage B, so features are constants w.r.t.
    the differentiated (decoder) params — matching the reference where the
    G optimizer only holds ``decoder.*``.
    """

    res = gcfg.renderer.out_im_res
    dcfg_dec = gcfg.decoder
    n_latent = dcfg_dec.n_latent
    path_batch = max(1, hp.batch // hp.path_batch_shrink)

    def step(
        g_params: Params,
        g_opt_state,
        mean_path_length: jnp.ndarray,
        key: jax.Array,
    ):
        kz, kc, kr, kn, kp = jax.random.split(key, 5)
        z1, z2, idx = _mixing_latents(kz, path_batch, hp.style_dim, hp.mixing, n_latent)
        cams = _sample_cameras(kc, res, path_batch, hp.camera)

        def loss_fn(gp):
            # Renderer features (frozen -> constants for the decoder grads).
            mapped = map_style(gp, z1)
            rout = render(
                gp["renderer"],
                gcfg.renderer,
                cams.focal,
                cams.extrinsics,
                cams.near,
                cams.far,
                mapped,
                key=kr,
            )
            features = jax.lax.stop_gradient(rout.features)
            latent = make_decoder_latent(
                gp["decoder"], dcfg_dec, [map_style(gp, z1), map_style(gp, z2)],
                inject_index=idx,
            )

            def img_fn(lat):
                return apply_decoder(
                    gp["decoder"], dcfg_dec, features, lat, noise_key=kn
                )

            penalty, new_mean, path_lengths = g_path_regularize(
                img_fn, latent, mean_path_length, kp
            )
            weighted = hp.path_regularize * hp.g_reg_every * penalty
            return weighted, (new_mean, {
                "path": penalty,
                "path_length": jnp.mean(path_lengths),
            })

        (_, (new_mean, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            g_params
        )
        updates, g_opt_state = g_tx.update(grads, g_opt_state, g_params)
        g_params = optax.apply_updates(g_params, updates)
        return g_params, g_opt_state, new_mean, metrics

    return step
