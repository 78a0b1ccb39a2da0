"""Model-stack tests: SIREN field, volume renderer, StyleGAN2 blocks,
discriminators, full generator.

The reference ships no tests (SURVEY.md §4); invariants here come from the
math: compositing weights form a (sub)probability distribution, modulated
conv must equal the naive per-sample-weight computation, the eikonal term
must match finite differences, SIREN sphere-init targets a centered sphere.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdface_gan_tpu.geometry import generate_camera_params
from sdface_gan_tpu.models.generator import (
    GeneratorConfig,
    generator_forward,
    generator_init_forward,
    init_generator,
    map_style,
    mean_latent,
)
from sdface_gan_tpu.models.renderer import RendererConfig, init_renderer, render
from sdface_gan_tpu.models.siren import (
    SirenConfig,
    apply_siren_generator,
    init_siren_generator,
)
from sdface_gan_tpu.models.stylegan2 import (
    DecoderConfig,
    ModConvConfig,
    apply_decoder,
    apply_modulated_conv,
    init_decoder,
    init_modulated_conv,
    make_decoder_latent,
)
from sdface_gan_tpu.models.discriminator import (
    StyleDiscConfig,
    VolumeRenderDiscConfig,
    apply_style_discriminator,
    apply_volume_render_discriminator,
    init_style_discriminator,
    init_volume_render_discriminator,
)

KEY = jax.random.PRNGKey(0)

SMALL_RENDERER = RendererConfig(
    type="sdf", out_im_res=8, n_samples=6, style_dim=32, width=32, depth=2
)


# ------------------------------------------------------------------ SIREN
def test_siren_generator_output_layout():
    cfg = SirenConfig(depth=2, width=16, style_dim=8)
    p = init_siren_generator(KEY, cfg)
    pts = jax.random.normal(KEY, (2, 10, 3))
    views = jax.random.normal(KEY, (2, 10, 3))
    style = jax.random.normal(KEY, (2, 8))
    out = apply_siren_generator(p, cfg, pts, views, style)
    assert out.shape == (2, 10, 4 + 16)

    cfg_nf = SirenConfig(depth=2, width=16, style_dim=8, output_features=False)
    out_nf = apply_siren_generator(p, cfg_nf, pts, views, style)
    assert out_nf.shape == (2, 10, 4)
    # rgb+sdf channels agree regardless of feature output
    np.testing.assert_allclose(np.asarray(out[..., :4]), np.asarray(out_nf), rtol=1e-6)


# --------------------------------------------------------------- renderer
def test_renderer_weights_and_shapes():
    cfg = SMALL_RENDERER
    p = init_renderer(KEY, cfg)
    cams = generate_camera_params(cfg.out_im_res, jax.random.PRNGKey(1), batch=2)
    style = jax.random.normal(KEY, (2, cfg.style_dim))
    out = render(p, cfg, cams.focal, cams.extrinsics, cams.near, cams.far, style,
                 key=jax.random.PRNGKey(2))
    assert out.rgb.shape == (2, 8, 8, 3)
    assert out.features.shape == (2, 8, 8, cfg.feature_out_size)
    assert bool(jnp.all(jnp.isfinite(out.rgb)))
    assert bool(jnp.all(out.rgb >= -1.0 - 1e-5)) and bool(jnp.all(out.rgb <= 1.0 + 1e-5))


def test_renderer_force_background_weights_sum_to_one():
    # with force_background, the composite of an all-ones field == 1,
    # so rgb = -1 + 2*sum(w * sigmoid(rgb_raw)) stays within [-1,1] and the
    # xyz/mask path uses weights summing to 1.
    cfg = RendererConfig(
        type="sdf", out_im_res=4, n_samples=5, style_dim=16, width=16, depth=1,
        return_xyz=True, return_sdf=True, perturb=0.0,
    )
    p = init_renderer(KEY, cfg)
    cams = generate_camera_params(cfg.out_im_res, jax.random.PRNGKey(1), batch=1)
    style = jax.random.normal(KEY, (1, cfg.style_dim))
    out = render(p, cfg, cams.focal, cams.extrinsics, cams.near, cams.far, style)
    assert out.sdf.shape == (1, 4, 4, 5, 1)
    assert out.xyz.shape == (1, 4, 4, 3)
    assert out.mask.shape == (1, 4, 4, 1)


def test_renderer_fixed_background_modes():
    """bg_mode='white'/'gray'/'black' (pi-GAN/GRAF convention): leftover
    transmittance composites onto a fixed color, so with a strongly
    positive SDF (no density) the image IS the background color and the
    mask (background probability) is ~1.  The reference 'lastsample' mode
    instead hands that visibility to the infinite-width last sample
    (sdf_model.py:240) — the learnable 'dome' that enables the billboard
    collapse documented in docs/TRAINING_RUN.md."""
    base = RendererConfig(
        type="sdf", out_im_res=4, n_samples=5, style_dim=16, width=16, depth=1,
        return_xyz=True, perturb=0.0,
    )
    from dataclasses import replace

    p = init_renderer(KEY, base)
    # push the field far outside the surface: sdf >> 0 -> sigma ~ 0
    p["network"]["sigma_linear"] = {
        "w": jnp.zeros_like(p["network"]["sigma_linear"]["w"]),
        "b": jnp.full_like(p["network"]["sigma_linear"]["b"], 50.0),
    }
    cams = generate_camera_params(base.out_im_res, jax.random.PRNGKey(1), batch=1)
    style = jax.random.normal(KEY, (1, base.style_dim))
    for mode, level in (("white", 1.0), ("gray", 0.0), ("black", -1.0)):
        cfg = replace(base, bg_mode=mode)
        out = render(p, cfg, cams.focal, cams.extrinsics, cams.near, cams.far, style)
        np.testing.assert_allclose(np.asarray(out.rgb), level, atol=1e-3)
        np.testing.assert_allclose(np.asarray(out.mask), 1.0, atol=1e-3)
    # lastsample: the same empty field still paints via the dome sample
    out_ref = render(p, base, cams.focal, cams.extrinsics, cams.near, cams.far, style)
    assert float(jnp.max(jnp.abs(out_ref.mask - 1.0))) < 1e-3


def test_renderer_view_independent_cuts_view_dependence():
    """With ``view_independent``, rgb must be invariant to the view branch:
    static vs per-ray viewdirs give identical images (each world point has
    one color).  Without it the default-init views head makes them differ —
    the light-field leak that enables the measured painting collapses
    (docs/TRAINING_RUN.md)."""
    from dataclasses import replace

    base = RendererConfig(
        type="sdf", out_im_res=4, n_samples=5, style_dim=16, width=16, depth=1,
        perturb=0.0,
    )
    p = init_renderer(KEY, base)
    cams = generate_camera_params(base.out_im_res, jax.random.PRNGKey(1), batch=1)
    style = jax.random.normal(KEY, (1, base.style_dim))

    def rgb_of(cfg):
        return np.asarray(
            render(p, cfg, cams.focal, cams.extrinsics, cams.near, cams.far, style).rgb
        )

    dep = rgb_of(base)
    dep_static = rgb_of(replace(base, static_viewdirs=True))
    assert np.abs(dep - dep_static).max() > 1e-4  # views head is live
    ind = rgb_of(replace(base, view_independent=True))
    ind_static = rgb_of(replace(base, view_independent=True, static_viewdirs=True))
    np.testing.assert_allclose(ind, ind_static, atol=0)


def test_renderer_return_weights():
    """``return_weights`` exposes the squeezed [B,H,W,S] compositing weights
    and normalized sample positions; leftover transmittance (the mask under
    a fixed background) must equal 1 - sum(weights)."""
    cfg = RendererConfig(
        type="sdf", out_im_res=4, n_samples=5, style_dim=16, width=16, depth=1,
        perturb=0.0, return_xyz=True, return_weights=True, bg_mode="gray",
    )
    p = init_renderer(KEY, cfg)
    cams = generate_camera_params(cfg.out_im_res, jax.random.PRNGKey(1), batch=1)
    style = jax.random.normal(KEY, (1, cfg.style_dim))
    out = render(p, cfg, cams.focal, cams.extrinsics, cams.near, cams.far, style)
    assert out.weights.shape == (1, 4, 4, 5)
    assert out.s_vals.shape == (1, 4, 4, 5)
    s = np.asarray(out.s_vals)
    assert s.min() >= 0.0 and s.max() <= 1.0 + 1e-6
    assert np.all(np.diff(s, axis=-1) > 0)
    np.testing.assert_allclose(
        np.asarray(out.mask[..., 0]),
        1.0 - np.asarray(out.weights).sum(-1),
        atol=1e-6,
    )


def test_integrate_matches_naive_reference_formula():
    """The lane-dense [B,H,W,S] compositing chain must equal a naive
    transcription of the reference ``volume_integration``
    (``sdf_model.py:236-301``) written with trailing-channel tensors."""
    from sdface_gan_tpu.models.renderer import _integrate, init_renderer

    cfg = RendererConfig(
        type="sdf", out_im_res=4, n_samples=5, style_dim=16, width=16, depth=1,
        return_xyz=True, return_sdf=True,
    )
    p = init_renderer(KEY, cfg)
    b, h, w, s, f = 2, 4, 4, 5, cfg.feature_out_size
    k = jax.random.split(KEY, 6)
    rgb = jax.random.normal(k[0], (b, h, w, s, 3))
    sdf = jax.random.normal(k[1], (b, h, w, s, 1)) * 0.3
    feat = jax.random.normal(k[2], (b, h, w, s, f))
    z_vals = jnp.sort(jax.random.uniform(k[3], (b, h, w, s), minval=0.88, maxval=1.12), -1)
    rays_d = jax.random.normal(k[4], (b, h, w, 3))
    pts = jax.random.normal(k[5], (b, h, w, s, 3))

    rgb_map, feat_map, sdf_out, mask, xyz, _ = _integrate(
        p, cfg, (rgb, sdf, feat), z_vals, rays_d, pts
    )

    # naive reference: trailing-channel [B,H,W,S,1] everywhere
    beta = p["sigmoid_beta"]
    dists = jnp.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1], jnp.full((b, h, w, 1), 1e10)], -1
    ) * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    sigma = jax.nn.sigmoid(-sdf / beta) / beta
    alpha = 1.0 - jnp.exp(-sigma * dists[..., None])
    trans = jnp.concatenate([jnp.ones_like(alpha[..., :1, :]), 1.0 - alpha + 1e-10], -2)
    weights = alpha * jnp.cumprod(trans, -2)[..., :-1, :]
    last = 1.0 - jnp.sum(weights[..., :-1, :], -2, keepdims=True)
    weights = jnp.concatenate([weights[..., :-1, :], last], -2)
    ref_rgb = -1.0 + 2.0 * jnp.sum(weights * jax.nn.sigmoid(rgb), -2)
    ref_feat = jnp.sum(weights * feat, -2)
    ref_xyz = jnp.sum(weights * pts, -2)

    np.testing.assert_allclose(np.asarray(rgb_map), np.asarray(ref_rgb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(feat_map), np.asarray(ref_feat), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xyz), np.asarray(ref_xyz), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mask), np.asarray(weights[..., -1, :]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sdf_out), np.asarray(sdf), atol=0)


def test_parts_and_concat_network_contracts_agree():
    """apply_siren_generator (reference channel-concat contract) must equal
    the parts contract the renderer consumes."""
    from sdface_gan_tpu.models.siren import apply_siren_generator_parts

    cfg = SirenConfig(depth=2, width=32, style_dim=16)
    p = init_siren_generator(KEY, cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (2, 40, 3)) * 0.5
    views = jax.random.normal(jax.random.PRNGKey(2), (2, 40, 3))
    style = jax.random.normal(jax.random.PRNGKey(3), (2, 16))
    cat = apply_siren_generator(p, cfg, pts, views, style)
    rgb, sdf, feat = apply_siren_generator_parts(p, cfg, pts, views, style)
    np.testing.assert_allclose(np.asarray(cat[..., :3]), np.asarray(rgb), atol=0)
    np.testing.assert_allclose(np.asarray(cat[..., 3:4]), np.asarray(sdf), atol=0)
    np.testing.assert_allclose(np.asarray(cat[..., 4:]), np.asarray(feat), atol=0)


def test_renderer_eikonal_matches_finite_difference():
    cfg = RendererConfig(
        type="sdf", out_im_res=2, n_samples=3, style_dim=16, width=16, depth=1,
        perturb=0.0,
    )
    p = init_renderer(KEY, cfg)
    cams = generate_camera_params(cfg.out_im_res, jax.random.PRNGKey(1), batch=1)
    style = jax.random.normal(KEY, (1, cfg.style_dim))
    out = render(p, cfg, cams.focal, cams.extrinsics, cams.near, cams.far, style,
                 return_eikonal=True)
    assert out.eikonal_term.shape == (1, 2, 2, 3, 3)
    # finite-difference check on the underlying field: grad of sdf wrt pts
    from sdface_gan_tpu.models.renderer import _apply_network
    from sdface_gan_tpu.geometry.rays import get_rays, base_t_vals

    rays = get_rays(cams.focal, cams.extrinsics, 2)
    near = cams.near.reshape(1, 1, 1, 1)
    far = cams.far.reshape(1, 1, 1, 1)
    t = base_t_vals(3, True).reshape(1, 1, 1, 3)
    z = near * (1 - t) + far * t
    z = jnp.broadcast_to(z, (1, 2, 2, 3))
    pts = rays.origins[..., None, :] + rays.directions[..., None, :] * z[..., None]
    views = jnp.broadcast_to(rays.viewdirs[..., None, :], pts.shape)

    def sdf_at(pp):
        npts = pp * 2.0 / (far - near)[..., None]
        return _apply_network(p, cfg, npts, views, style)[1][..., 0]

    eps = 1e-4
    for axis in range(3):
        dp = jnp.zeros_like(pts).at[..., axis].set(eps)
        fd = (sdf_at(pts + dp) - sdf_at(pts - dp)) / (2 * eps)
        np.testing.assert_allclose(
            np.asarray(out.eikonal_term[..., axis]), np.asarray(fd), rtol=2e-2, atol=2e-3
        )


def test_sphere_init_targets():
    cfg = GeneratorConfig(
        size=16, style_dim=16, full_pipeline=False,
        renderer=RendererConfig(type="sdf", out_im_res=4, n_samples=4,
                                style_dim=16, width=16, depth=1),
    )
    p = init_generator(KEY, cfg)
    cams = generate_camera_params(4, jax.random.PRNGKey(1), batch=2)
    z = jax.random.normal(KEY, (2, 16))
    sdf, target = generator_init_forward(
        p, cfg, [z], cams.extrinsics, cams.focal, cams.near, cams.far,
        jax.random.PRNGKey(2),
    )
    assert sdf.shape == (2, 4, 4, 4)
    assert target.shape == (2, 4, 4, 4)
    # target = ||pts|| - (far-near)/4.  Cameras sit on the unit sphere and
    # rays pass near the world origin with z in [near, far] = [0.88, 1.12],
    # so sample points lie within ~0.12 of the origin: ||pts|| in [0, ~0.15]
    # and target = ||pts|| - 0.06 is small.
    t = np.asarray(target)
    assert t.min() >= -0.06 - 1e-5
    assert t.max() <= 0.2
    np.testing.assert_allclose(
        t, np.asarray(jnp.linalg.norm(jnp.zeros(1))) * 0 + t, rtol=0
    )  # finite


# ---------------------------------------------------------- modulated conv
def _naive_modulated_conv(p, cfg, x, style):
    """Direct per-sample-weight computation (the reference's grouped-conv
    semantics, ``sdf_model.py:660-701``) in NHWC."""
    from sdface_gan_tpu.models.stylegan2 import apply_equal_linear

    s = apply_equal_linear(p["modulation"], style)  # [B, in]
    scale = 1.0 / math.sqrt(cfg.in_ch * cfg.kernel_size**2)
    w = scale * p["w"]  # [kh,kw,in,out]
    wmod = w[None] * s[:, None, None, :, None]  # [B,kh,kw,in,out]
    if cfg.demodulate:
        demod = jax.lax.rsqrt(jnp.sum(wmod**2, axis=(1, 2, 3)) + 1e-8)
        wmod = wmod * demod[:, None, None, None, :]
    outs = []
    for b in range(x.shape[0]):
        outs.append(
            jax.lax.conv_general_dilated(
                x[b : b + 1], wmod[b], (1, 1),
                ((cfg.kernel_size // 2,) * 2, (cfg.kernel_size // 2,) * 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
    return jnp.concatenate(outs, 0)


def test_modulated_conv_equals_naive_grouped():
    cfg = ModConvConfig(in_ch=8, out_ch=12, kernel_size=3, style_dim=16)
    p = init_modulated_conv(KEY, cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (3, 6, 6, 8))
    style = jax.random.normal(jax.random.PRNGKey(6), (3, 16))
    fast = apply_modulated_conv(p, cfg, x, style)
    naive = _naive_modulated_conv(p, cfg, x, style)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive), rtol=2e-4, atol=1e-5)


def test_modulated_conv_upsample_doubles_resolution():
    cfg = ModConvConfig(in_ch=8, out_ch=8, kernel_size=3, style_dim=16, upsample=True)
    p = init_modulated_conv(KEY, cfg)
    x = jax.random.normal(KEY, (2, 6, 6, 8))
    style = jax.random.normal(KEY, (2, 16))
    out = apply_modulated_conv(p, cfg, x, style)
    assert out.shape == (2, 12, 12, 8)


def test_modulated_conv_downsample_halves_resolution():
    cfg = ModConvConfig(in_ch=8, out_ch=8, kernel_size=3, style_dim=16, downsample=True)
    p = init_modulated_conv(KEY, cfg)
    x = jax.random.normal(KEY, (2, 8, 8, 8))
    style = jax.random.normal(KEY, (2, 16))
    out = apply_modulated_conv(p, cfg, x, style)
    assert out.shape == (2, 4, 4, 8)


# ----------------------------------------------------------------- decoder
def test_decoder_pyramid_shapes():
    cfg = DecoderConfig(size=64, style_dim=64, in_res=16, in_channels=24,
                        channel_multiplier=1)
    p = init_decoder(KEY, cfg)
    assert cfg.num_layers == 5 and cfg.n_latent == 6
    feats = jax.random.normal(KEY, (2, 16, 16, 24))
    z = jax.random.normal(KEY, (2, 32))
    latent = make_decoder_latent(p, cfg, [z])
    assert latent.shape == (2, 6, 64)
    img = apply_decoder(p, cfg, feats, latent, noise_key=jax.random.PRNGKey(3))
    assert img.shape == (2, 64, 64, 3)
    # stored-noise (deterministic) path
    img2 = apply_decoder(p, cfg, feats, latent)
    img3 = apply_decoder(p, cfg, feats, latent)
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img3))


def test_decoder_512_shapes():
    """512^2 decoder pyramid (reference ``prepare_data.py:82`` sizes;
    ``channel_table`` covers to 1024).  ``channel_base`` shrinks widths so
    CPU can execute the seven-layer pyramid; the shape math under test
    (noise ladder, latent count) is width-independent."""
    cfg = DecoderConfig(size=512, style_dim=32, in_res=64, in_channels=16,
                        channel_multiplier=1, channel_base=16)
    assert cfg.num_layers == 7 and cfg.n_latent == 8
    assert cfg.noise_shapes() == [64, 128, 128, 256, 256, 512, 512]
    p = init_decoder(KEY, cfg)
    feats = jax.random.normal(KEY, (1, 64, 64, 16))
    z = jax.random.normal(KEY, (1, 16))
    latent = make_decoder_latent(p, cfg, [z])
    assert latent.shape == (1, 8, 32)
    img = apply_decoder(p, cfg, feats, latent, noise_key=jax.random.PRNGKey(3))
    assert img.shape == (1, 512, 512, 3)


def test_channel_table_reference_defaults():
    """channel_base=512 (the default) must reproduce the reference's
    table exactly (``sdf_model.py:913-923``)."""
    from sdface_gan_tpu.models.stylegan2 import channel_table

    assert channel_table(2) == {4: 512, 8: 512, 16: 512, 32: 512, 64: 512,
                                128: 256, 256: 128, 512: 64, 1024: 32}
    assert channel_table(1) == {4: 512, 8: 512, 16: 512, 32: 512, 64: 256,
                                128: 128, 256: 64, 512: 32, 1024: 16}


def test_decoder_style_mixing_inject_index():
    cfg = DecoderConfig(size=32, style_dim=32, in_res=16, in_channels=8,
                        channel_multiplier=1)
    p = init_decoder(KEY, cfg)
    z1 = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    z2 = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    latent = make_decoder_latent(p, cfg, [z1, z2], inject_index=2)
    assert latent.shape == (2, cfg.n_latent, 32)
    np.testing.assert_allclose(np.asarray(latent[:, 0]), np.asarray(latent[:, 1]))
    assert not np.allclose(np.asarray(latent[:, 1]), np.asarray(latent[:, 2]))


# ----------------------------------------------------------- discriminators
def test_volume_render_discriminator_heads():
    cfg = VolumeRenderDiscConfig(in_res=32)
    p = init_volume_render_discriminator(KEY, cfg)
    x = jax.random.normal(KEY, (4, 32, 32, 3))
    gan, view = apply_volume_render_discriminator(p, cfg, x)
    assert gan.shape == (4, 1)
    assert view.shape == (4, 2)


def test_style_discriminator_logits():
    cfg = StyleDiscConfig(size=32, channel_multiplier=1)
    p = init_style_discriminator(KEY, cfg)
    x = jax.random.normal(KEY, (4, 32, 32, 3))
    out = apply_style_discriminator(p, cfg, x)
    assert out.shape == (4, 1)


@pytest.mark.parametrize("batch", [5, 7])
def test_style_discriminator_odd_batches(batch):
    """Batches with no small divisor must not crash minibatch-stddev
    (the reference's grouping, sdf_model.py:1465-1477, reshapes raggedly
    for b=5/7; the rebuild searches for the largest valid divisor)."""
    cfg = StyleDiscConfig(size=32, channel_multiplier=1)
    p = init_style_discriminator(KEY, cfg)
    x = jax.random.normal(KEY, (batch, 32, 32, 3))
    out = apply_style_discriminator(p, cfg, x)
    assert out.shape == (batch, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


# ------------------------------------------------------------ full generator
def test_full_generator_pipeline():
    cfg = GeneratorConfig(
        size=32, style_dim=32, full_pipeline=True, channel_multiplier=1,
        renderer=RendererConfig(type="sdf", out_im_res=16, n_samples=4,
                                style_dim=32, width=32, depth=2),
    )
    p = init_generator(KEY, cfg)
    cams = generate_camera_params(16, jax.random.PRNGKey(1), batch=2)
    z = jax.random.normal(KEY, (2, 32))
    out = generator_forward(
        p, cfg, [z], cams.extrinsics, cams.focal, cams.near, cams.far,
        key=jax.random.PRNGKey(2),
    )
    assert out.rgb.shape == (2, 32, 32, 3)
    assert out.thumb_rgb.shape == (2, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(out.rgb)))


def test_generator_truncation_pulls_to_mean():
    cfg = GeneratorConfig(
        size=32, style_dim=32, full_pipeline=False,
        renderer=RendererConfig(type="sdf", out_im_res=8, n_samples=4,
                                style_dim=32, width=16, depth=1),
    )
    p = init_generator(KEY, cfg)
    rmean, dmean = mean_latent(p, cfg, jax.random.PRNGKey(9), n_latent=256)
    assert rmean.shape == (1, 32)
    assert dmean is None
    z = jax.random.normal(KEY, (2, 32))
    mapped = map_style(p, z)
    truncated = rmean + 0.5 * (mapped - rmean)
    # truncation shrinks distance to the mean latent
    assert float(jnp.linalg.norm(truncated - rmean)) < float(
        jnp.linalg.norm(mapped - rmean)
    )


def test_ngp_generator_forward():
    from sdface_gan_tpu.ops.hash_encoder import HashGridSpec
    # tiny hash grid to keep CPU test fast
    cfg = GeneratorConfig(
        size=16, style_dim=32, full_pipeline=False,
        renderer=RendererConfig(type="ngp", out_im_res=8, n_samples=4,
                                style_dim=32, width=32),
    )
    # NGP network config uses default grid; just run the forward
    p = init_generator(KEY, cfg)
    cams = generate_camera_params(8, jax.random.PRNGKey(1), batch=1)
    z = jax.random.normal(KEY, (1, 32))
    out = generator_forward(
        p, cfg, [z], cams.extrinsics, cams.focal, cams.near, cams.far,
        key=jax.random.PRNGKey(2),
    )
    assert out.thumb_rgb.shape == (1, 8, 8, 3)
    assert bool(jnp.all(jnp.isfinite(out.thumb_rgb)))


def test_ngp_packed_inference_parity():
    """The corner-packed serving path (renderer.ngp_pack_mb +
    pack_generator_for_inference) must produce the generator output of the
    standard 8-gather encode exactly: the packed table is a pure repack
    (ops/hash_encoder.py PackPlan), f32-packed here to isolate layout from
    dtype."""
    from sdface_gan_tpu.models.generator import pack_generator_for_inference

    base = dict(type="ngp", out_im_res=8, n_samples=4, style_dim=32,
                width=32, ngp_num_levels=3, ngp_level_dim=2,
                ngp_finest_res=64, ngp_log2_hashmap_size=8)
    cfg = GeneratorConfig(
        size=16, style_dim=32, full_pipeline=False,
        renderer=RendererConfig(**base),
    )
    cfg_packed = GeneratorConfig(
        size=16, style_dim=32, full_pipeline=False,
        renderer=RendererConfig(**base, ngp_pack_mb=64),
    )
    p = init_generator(KEY, cfg)
    assert cfg_packed.renderer.network_config().pack_plan.packed_levels
    pp = pack_generator_for_inference(p, cfg_packed)
    assert "hash_table_packed" in pp["renderer"]["network"]
    # no-op paths: knob off, or already packed
    assert pack_generator_for_inference(p, cfg) is p
    assert pack_generator_for_inference(pp, cfg_packed)["renderer"][
        "network"] is pp["renderer"]["network"]

    cams = generate_camera_params(8, jax.random.PRNGKey(1), batch=2)
    z = jax.random.normal(KEY, (2, 32))
    args = (cams.extrinsics, cams.focal, cams.near, cams.far)
    ref = generator_forward(p, cfg, [z], *args, key=jax.random.PRNGKey(2))
    got = generator_forward(pp, cfg_packed, [z], *args,
                            key=jax.random.PRNGKey(2))
    import numpy as np
    np.testing.assert_array_equal(np.asarray(ref.thumb_rgb),
                                  np.asarray(got.thumb_rgb))


def test_fc_generator_forward():
    cfg = GeneratorConfig(
        size=16, style_dim=16, full_pipeline=False,
        renderer=RendererConfig(type="fc", out_im_res=8, n_samples=4,
                                style_dim=16, width=16, depth=3),
    )
    p = init_generator(KEY, cfg)
    cams = generate_camera_params(8, jax.random.PRNGKey(1), batch=1)
    z = jax.random.normal(KEY, (1, 16))
    out = generator_forward(
        p, cfg, [z], cams.extrinsics, cams.focal, cams.near, cams.far,
        key=jax.random.PRNGKey(2),
    )
    assert out.thumb_rgb.shape == (1, 8, 8, 3)


def test_eikonal_jvp_matches_vjp():
    """Forward-mode eikonal (three jvp tangents) must produce the same
    d sdf / d pts — and the same gradients THROUGH it — as the reverse-mode
    pullback (reference get_eikonal_term, sdf_model.py:224-229)."""
    from dataclasses import replace as _replace

    cfg = RendererConfig(
        type="sdf", out_im_res=4, n_samples=3, style_dim=16, width=16, depth=2,
        perturb=0.0,
    )
    p = init_renderer(KEY, cfg)
    cams = generate_camera_params(cfg.out_im_res, jax.random.PRNGKey(1), batch=2)
    style = jax.random.normal(KEY, (2, cfg.style_dim))

    out_v = render(p, cfg, cams.focal, cams.extrinsics, cams.near, cams.far,
                   style, return_eikonal=True)
    cfg_j = _replace(cfg, eikonal_mode="jvp")
    out_j = render(p, cfg_j, cams.focal, cams.extrinsics, cams.near, cams.far,
                   style, return_eikonal=True)
    np.testing.assert_allclose(np.asarray(out_j.eikonal_term),
                               np.asarray(out_v.eikonal_term),
                               rtol=1e-4, atol=1e-5)

    # param-gradient parity through the eikonal loss (the double-backprop
    # path the G step takes)
    def loss(params, mode_cfg):
        out = render(params, mode_cfg, cams.focal, cams.extrinsics, cams.near,
                     cams.far, style, return_eikonal=True)
        return jnp.mean((jnp.linalg.norm(out.eikonal_term, axis=-1) - 1.0) ** 2)

    g_v = jax.grad(loss)(p, cfg)
    g_j = jax.grad(loss)(p, cfg_j)
    for a, b in zip(jax.tree_util.tree_leaves(g_v), jax.tree_util.tree_leaves(g_j)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5)


def test_eikonal_subsample():
    """M fresh frustum points: correct shape, differentiable twice, and an
    unbiased estimate of the full-set eikonal loss (same point
    distribution — stratified depth x pixel rays vs uniform depth x
    continuous-pixel rays over the same frustum)."""
    from dataclasses import replace as _replace

    cfg = RendererConfig(
        type="sdf", out_im_res=8, n_samples=6, style_dim=16, width=16, depth=2,
        perturb=0.0,
    )
    p = init_renderer(KEY, cfg)
    cams = generate_camera_params(cfg.out_im_res, jax.random.PRNGKey(1), batch=2)
    style = jax.random.normal(KEY, (2, cfg.style_dim))

    cfg_s = _replace(cfg, eikonal_subsample=32)
    out = render(p, cfg_s, cams.focal, cams.extrinsics, cams.near, cams.far,
                 style, key=jax.random.PRNGKey(5), return_eikonal=True)
    assert out.eikonal_term.shape == (2, 32, 3)
    assert bool(jnp.all(jnp.isfinite(out.eikonal_term)))
    # the render outputs themselves are unchanged by the knob
    out_full = render(p, cfg, cams.focal, cams.extrinsics, cams.near, cams.far,
                      style, key=jax.random.PRNGKey(5), return_eikonal=True)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(out_full.rgb),
                               rtol=1e-5, atol=1e-6)

    # double-backprop works: grad of the eikonal penalty wrt params
    def loss(params):
        o = render(params, cfg_s, cams.focal, cams.extrinsics, cams.near,
                   cams.far, style, key=jax.random.PRNGKey(5),
                   return_eikonal=True)
        return jnp.mean((jnp.linalg.norm(o.eikonal_term, axis=-1) - 1.0) ** 2)

    g = jax.grad(loss)(p)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(g))

    # statistical agreement with the full-set estimate at large M
    def eik_mean(o):
        return float(jnp.mean((jnp.linalg.norm(o.eikonal_term, axis=-1) - 1.0) ** 2))

    cfg_big = _replace(cfg, eikonal_subsample=4096)
    out_big = render(p, cfg_big, cams.focal, cams.extrinsics, cams.near,
                     cams.far, style, key=jax.random.PRNGKey(9),
                     return_eikonal=True)
    full, sub = eik_mean(out_full), eik_mean(out_big)
    assert abs(full - sub) / max(full, 1e-6) < 0.15, (full, sub)

    # without a key the knob must raise, not silently fall back to the
    # full-graph pullback — the configs pairing eikonal_subsample with
    # no_remat would OOM on the un-rematerialized reverse-over-reverse
    with pytest.raises(ValueError, match="eikonal_subsample"):
        render(p, cfg_s, cams.focal, cams.extrinsics, cams.near,
               cams.far, style, key=None, return_eikonal=True)


def test_eikonal_subsample_ngp():
    """The subsampled eikonal pass also differentiates through the
    hash-grid field (second-order gather/scatter on M points only)."""
    from dataclasses import replace as _replace

    cfg = RendererConfig(
        type="ngp", out_im_res=4, n_samples=3, style_dim=16, width=16,
        perturb=0.0, eikonal_subsample=16,
        ngp_num_levels=2, ngp_level_dim=2, ngp_finest_res=32,
        ngp_log2_hashmap_size=8,
    )
    p = init_renderer(KEY, cfg)
    cams = generate_camera_params(cfg.out_im_res, jax.random.PRNGKey(1), batch=2)
    style = jax.random.normal(KEY, (2, cfg.style_dim))

    def loss(params):
        o = render(params, cfg, cams.focal, cams.extrinsics, cams.near,
                   cams.far, style, key=jax.random.PRNGKey(5),
                   return_eikonal=True)
        return jnp.mean((jnp.linalg.norm(o.eikonal_term, axis=-1) - 1.0) ** 2)

    g = jax.grad(loss)(p)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(g))
