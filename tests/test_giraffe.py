"""GIRAFFE family tests: camera math, bbox transforms, decoders, neural
renderer, compositional generator, trainer steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from dataclasses import replace

from sdface_gan_tpu.giraffe import (
    BBoxConfig,
    DCDiscConfig,
    DecoderConfig,
    GiraffeConfig,
    NeuralRendererConfig,
    apply_dc_discriminator,
    apply_giraffe_decoder,
    apply_neural_renderer,
    giraffe_forward,
    init_dc_discriminator,
    init_giraffe,
    init_giraffe_decoder,
    init_neural_renderer,
    sample_transformations,
)
from sdface_gan_tpu.giraffe.camera import (
    arange_pixels,
    get_camera_mat,
    get_random_pose,
    image_points_to_world,
    interpolate_sphere,
    origin_to_world,
)
from sdface_gan_tpu.giraffe.bbox import transform_points_to_box
from sdface_gan_tpu.giraffe.generator import sample_latent_codes
from sdface_gan_tpu.giraffe.trainer import (
    GiraffeTrainHParams,
    giraffe_optimizers,
    make_giraffe_d_step,
    make_giraffe_g_step,
)

KEY = jax.random.PRNGKey(0)

TINY = GiraffeConfig(
    z_dim=16,
    z_dim_bg=8,
    n_ray_samples=4,
    resolution_vol=4,
    decoder=DecoderConfig(z_dim=16, hidden_size=16, n_blocks=3, skips=(2,), rgb_out_dim=8),
    background=DecoderConfig(z_dim=8, hidden_size=8, n_blocks=2, skips=(),
                             downscale_p_by=12.0, rgb_out_dim=8),
    neural_renderer=NeuralRendererConfig(n_feat=8, input_dim=8, img_size=32, min_feat=4),
)


def test_camera_pose_orthonormal_looks_at_origin():
    rt = get_random_pose(KEY, (0, 1), (0.2, 0.3), (2.7, 2.8), batch_size=4)
    r = np.asarray(rt[:, :3, :3])
    eye = np.einsum("bij,bik->bjk", r, r)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (4, 1, 1)), atol=1e-5)
    loc = np.asarray(rt[:, :3, 3])
    np.testing.assert_allclose(np.linalg.norm(loc, axis=-1), 2.75, atol=0.06)
    # camera z column points away from origin (z = eye - at normalized)
    z = r[:, :, 2]
    np.testing.assert_allclose(z, loc / np.linalg.norm(loc, axis=1, keepdims=True),
                               atol=1e-5)


def test_rays_pass_through_scene():
    cam = jnp.tile(get_camera_mat(), (2, 1, 1))
    world = get_random_pose(jax.random.PRNGKey(1), (0, 1), (0.4, 0.5), (2.732, 2.732), 2)
    pix = arange_pixels(8, 2)
    pw = image_points_to_world(pix, cam, world)
    cw = origin_to_world(64, cam, world)
    # rays from camera toward image plane head toward the origin region:
    # the center ray's closest approach to the origin is near 0
    ray = pw - cw
    t_star = -jnp.sum(cw * ray, -1) / jnp.sum(ray * ray, -1)
    closest = cw + t_star[..., None] * ray
    center_dist = jnp.linalg.norm(closest, axis=-1).min()
    # res=8 has no exactly-central pixel; nearest ray passes within ~0.26
    # of the origin while the camera sits at radius 2.732
    assert float(center_dist) < 0.3


def test_interpolate_sphere_endpoints():
    z1 = jax.random.normal(KEY, (2, 8))
    z2 = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
    np.testing.assert_allclose(np.asarray(interpolate_sphere(z1, z2, 0.0)),
                               np.asarray(z1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(interpolate_sphere(z1, z2, 1.0)),
                               np.asarray(z2), atol=1e-5)


def test_bbox_transform_inverse():
    cfg = BBoxConfig(n_boxes=2, scale_range_min=(0.4, 0.4, 0.4),
                     scale_range_max=(0.6, 0.6, 0.6))
    s, t, r = sample_transformations(KEY, cfg, batch_size=3)
    assert s.shape == (3, 2, 3) and t.shape == (3, 2, 3) and r.shape == (3, 2, 3, 3)
    p = jax.random.normal(KEY, (3, 10, 3))
    local = transform_points_to_box(p, s, t, r, 0)
    # invert: p = R^T (local * s) + t
    back = jnp.einsum("bji,bnj->bni", r[:, 0], local * s[:, 0][:, None, :]) + t[:, 0][:, None, :]
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-4)


def test_decoder_shapes():
    cfg = DecoderConfig(z_dim=16, hidden_size=16, n_blocks=3, skips=(2,), rgb_out_dim=8)
    p = init_giraffe_decoder(KEY, cfg)
    pts = jax.random.normal(KEY, (2, 20, 3))
    rays = jax.random.normal(KEY, (2, 20, 3))
    zs = jax.random.normal(KEY, (2, 16))
    za = jax.random.normal(KEY, (2, 16))
    feat, sigma = apply_giraffe_decoder(p, cfg, pts, rays, zs, za)
    assert feat.shape == (2, 20, 8)
    assert sigma.shape == (2, 20)


def test_decoder_hash_encoding():
    cfg = DecoderConfig(z_dim=8, hidden_size=16, n_blocks=2, skips=(),
                        rgb_out_dim=4, positional_encoding="hash")
    p = init_giraffe_decoder(KEY, cfg)
    pts = jax.random.normal(KEY, (1, 12, 3))
    feat, sigma = apply_giraffe_decoder(p, cfg, pts, pts,
                                        jax.random.normal(KEY, (1, 8)),
                                        jax.random.normal(KEY, (1, 8)))
    assert feat.shape == (1, 12, 4) and sigma.shape == (1, 12)


def test_small_decoder():
    from sdface_gan_tpu.giraffe.decoder import (
        SmallDecoderConfig,
        apply_small_decoder,
        init_small_decoder,
    )

    cfg = SmallDecoderConfig(z_dim=8, rgb_out_dim=6)
    p = init_small_decoder(KEY, cfg)
    pts = jax.random.normal(KEY, (1, 10, 3))
    feat, sigma = apply_small_decoder(p, cfg, pts, pts,
                                      jax.random.normal(KEY, (1, 8)),
                                      jax.random.normal(KEY, (1, 8)))
    assert feat.shape == (1, 10, 6) and sigma.shape == (1, 10)


def test_neural_renderer_upsamples():
    cfg = NeuralRendererConfig(n_feat=8, input_dim=8, img_size=64, min_feat=4)
    p = init_neural_renderer(KEY, cfg)
    x = jax.random.normal(KEY, (2, 16, 16, 8))
    out = apply_neural_renderer(p, cfg, x)
    assert out.shape == (2, 64, 64, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_giraffe_forward_and_alpha():
    p = init_giraffe(KEY, TINY)
    img = giraffe_forward(p, TINY, key=jax.random.PRNGKey(2), batch_size=2)
    # renderer upsamples by 2^n_blocks = 2^(log2(32)-4) = 2 from the 4^2
    # volume resolution (reference uses 16^2 -> img_size; ratio preserved)
    assert img.shape == (2, 8, 8, 3)
    assert bool(jnp.all(jnp.isfinite(img)))
    alpha = giraffe_forward(p, TINY, key=jax.random.PRNGKey(2), batch_size=2,
                            return_alpha_map=True)
    assert alpha.shape == (2, 4, 4, 1)
    # alpha in [0, 1]
    assert float(alpha.min()) >= 0.0 and float(alpha.max()) <= 1.0 + 1e-5


def test_giraffe_train_steps():
    p = init_giraffe(KEY, TINY)
    dcfg = DCDiscConfig(img_size=8, n_feat=32)  # TINY renders 8x8
    d = init_dc_discriminator(jax.random.PRNGKey(1), dcfg)
    hp = GiraffeTrainHParams(batch_size=2)
    g_tx, d_tx = giraffe_optimizers(hp)
    d_step = jax.jit(make_giraffe_d_step(TINY, dcfg, hp, d_tx))
    g_step = jax.jit(make_giraffe_g_step(TINY, dcfg, hp, g_tx))
    d_state, g_state = d_tx.init(d), g_tx.init(p)
    ema = jax.tree_util.tree_map(jnp.copy, p)
    real = jax.random.uniform(KEY, (2, 8, 8, 3))
    d, d_state, dm = d_step(p, d, d_state, jax.random.PRNGKey(3), real)
    p, g_state, ema, gm = g_step(p, d, g_state, ema, jax.random.PRNGKey(4))
    assert np.isfinite(float(dm["discriminator"])) and np.isfinite(float(dm["regularizer"]))
    assert np.isfinite(float(gm["generator"]))


def test_dc_discriminator_shapes():
    cfg = DCDiscConfig(img_size=64)
    p = init_dc_discriminator(KEY, cfg)
    x = jax.random.uniform(KEY, (3, 64, 64, 3))
    logits, feat = apply_dc_discriminator(p, cfg, x)
    assert logits.shape == (3, 1)
    assert feat.shape == (3, 512 * 4 * 4)


def test_resnet_discriminator():
    from sdface_gan_tpu.giraffe.discriminator import (
        ResnetDiscConfig,
        apply_resnet_discriminator,
        init_resnet_discriminator,
    )

    cfg = ResnetDiscConfig(img_size=32, nfilter=4, nfilter_max=32)
    p = init_resnet_discriminator(KEY, cfg)
    x = jax.random.uniform(KEY, (2, 32, 32, 3))
    out = apply_resnet_discriminator(p, cfg, x)
    assert out.shape == (2, 1)


def test_giraffe_encoder_step():
    import optax

    from sdface_gan_tpu.encoder import VAEEncoderConfig, init_vae_encoder
    from sdface_gan_tpu.giraffe.trainer import make_giraffe_encoder_step

    p = init_giraffe(KEY, TINY)
    dcfg = DCDiscConfig(img_size=8, n_feat=32)
    d = init_dc_discriminator(jax.random.PRNGKey(1), dcfg)
    hp = GiraffeTrainHParams(batch_size=2)
    ecfg = VAEEncoderConfig(img_size=8, z_size=2 * TINY.z_dim)
    e = init_vae_encoder(jax.random.PRNGKey(2), ecfg)
    e_tx = optax.adam(5e-4)
    e_state = e_tx.init(e)
    step = jax.jit(make_giraffe_encoder_step(TINY, dcfg, hp, e_tx))
    real = jax.random.uniform(KEY, (2, 8, 8, 3))
    e, e_state, m = step(e, p, d, e_state, jax.random.PRNGKey(3), real)
    assert np.isfinite(float(m["encoder"]))


def test_render_programs_and_mesh_extraction(tmp_path):
    from sdface_gan_tpu.giraffe.rendering import (
        PROGRAMS,
        extract_giraffe_mesh,
        render_program,
    )

    p = init_giraffe(KEY, TINY)
    frames = render_program(p, TINY, "object_rotation", str(tmp_path),
                            n_samples=2, n_steps=3, save_video=False)
    assert len(frames) == 3 and frames[0].shape == (2, 8, 8, 3)
    assert (tmp_path / "object_rotation.png").exists()
    frames = render_program(p, TINY, "render_add_objects", str(tmp_path),
                            n_samples=2, n_steps=2, save_video=False)
    assert len(frames) == 2

    mesh = extract_giraffe_mesh(p, TINY, resolution=24, level=0.001)
    assert mesh.verts.shape[1] == 3 and mesh.faces.shape[1] == 3


@pytest.mark.slow
def test_every_render_program_runs(tmp_path):
    """Every program name the reference's render_full_visualization
    dispatches (rendering.py:39-77) runs on a tiny random model."""
    from sdface_gan_tpu.giraffe.rendering import (
        _ADD_LAYOUTS,
        PROGRAMS,
        render_program,
    )

    p = init_giraffe(KEY, TINY)
    for program in PROGRAMS:
        if program in ("object_rotation", "render_add_objects"):
            continue  # covered above
        frames = render_program(p, TINY, program, str(tmp_path),
                                n_samples=1, n_steps=2, save_video=False)
        expected = (
            len(_ADD_LAYOUTS[program]["reveal"]) if program in _ADD_LAYOUTS else 2
        )
        assert len(frames) == expected, program
        assert all(np.all(np.isfinite(f)) for f in frames), program
        assert (tmp_path / f"{program}.png").exists()

    import pytest

    with pytest.raises(ValueError):
        render_program(p, TINY, "nope", str(tmp_path))


def test_render_program_codes_override_and_mesh_export(tmp_path):
    """The VAE-conditioning hook: explicit codes change the output; the
    rotation program can export per-identity meshes."""
    from sdface_gan_tpu.giraffe.generator import sample_latent_codes
    from sdface_gan_tpu.giraffe.rendering import render_program

    p = init_giraffe(KEY, TINY)
    c1 = sample_latent_codes(jax.random.PRNGKey(5), TINY, 1, tmp=0.65)
    c2 = sample_latent_codes(jax.random.PRNGKey(6), TINY, 1, tmp=0.65)
    f1 = render_program(p, TINY, "object_rotation", str(tmp_path / "a"),
                        n_steps=2, save_video=False, codes=c1)
    f2 = render_program(p, TINY, "object_rotation", str(tmp_path / "b"),
                        n_steps=2, save_video=False, codes=c2)
    assert not np.allclose(f1[0], f2[0])

    render_program(p, TINY, "object_rotation", str(tmp_path / "m"),
                   n_samples=1, n_steps=2, save_video=False,
                   export_meshes=True, mesh_resolution=16)
    assert (tmp_path / "m" / "00_rotation.ply").exists()
