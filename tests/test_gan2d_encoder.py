"""gan2d family + inversion-encoder stack tests."""

import jax
import jax.numpy as jnp
import numpy as np

from sdface_gan_tpu.encoder import (
    IRSEConfig,
    LossUtils,
    VAEEncoderConfig,
    apply_gradual_style_encoder,
    apply_irse_backbone,
    apply_lpips,
    apply_vae_encoder,
    init_gradual_style_encoder,
    init_irse_backbone,
    init_lpips,
    init_vae_encoder,
    reparameterize,
)
from sdface_gan_tpu.encoder.id_loss import id_loss
from sdface_gan_tpu.encoder.lpips import LPIPSConfig
from sdface_gan_tpu.gan2d import (
    Gan2dGeneratorConfig,
    apply_gan2d_generator,
    init_gan2d_generator,
)
from sdface_gan_tpu.gan2d.trainer import (
    Gan2dTrainHParams,
    make_gan2d_d_step,
    make_gan2d_g_step,
)
from sdface_gan_tpu.giraffe.discriminator import DCDiscConfig, init_dc_discriminator

KEY = jax.random.PRNGKey(0)


def test_gan2d_generator_shapes():
    cfg = Gan2dGeneratorConfig(z_dim=32, size=32, nfilter=8, nfilter_max=64)
    p = init_gan2d_generator(KEY, cfg)
    z = jax.random.normal(KEY, (2, 32))
    img = apply_gan2d_generator(p, cfg, z)
    assert img.shape == (2, 32, 32, 3)
    assert float(img.min()) >= -1.0 and float(img.max()) <= 1.0


def test_gan2d_train_steps():
    import optax

    gcfg = Gan2dGeneratorConfig(z_dim=16, size=16, nfilter=4, nfilter_max=32)
    dcfg = DCDiscConfig(img_size=16, n_feat=32)
    hp = Gan2dTrainHParams(batch_size=2)
    g = init_gan2d_generator(KEY, gcfg)
    d = init_dc_discriminator(jax.random.PRNGKey(1), dcfg)
    g_tx, d_tx = optax.rmsprop(5e-4), optax.rmsprop(1e-4)
    d_step = jax.jit(make_gan2d_d_step(gcfg, dcfg, hp, d_tx))
    g_step = jax.jit(make_gan2d_g_step(gcfg, dcfg, hp, g_tx))
    d_state, g_state = d_tx.init(d), g_tx.init(g)
    ema = jax.tree_util.tree_map(jnp.copy, g)
    real = jax.random.uniform(KEY, (2, 16, 16, 3))
    d, d_state, dm = d_step(g, d, d_state, jax.random.PRNGKey(2), real)
    g, g_state, ema, gm = g_step(g, d, g_state, ema, jax.random.PRNGKey(3))
    assert np.isfinite(float(dm["discriminator"]))
    assert np.isfinite(float(gm["generator"]))


def test_vae_encoder_and_reparameterize():
    cfg = VAEEncoderConfig(img_size=32, z_size=16)
    p = init_vae_encoder(KEY, cfg)
    x = jax.random.uniform(KEY, (4, 32, 32, 3)) * 2 - 1
    mu, logvar = apply_vae_encoder(p, cfg, x)
    assert mu.shape == (4, 16) and logvar.shape == (4, 16)
    z = reparameterize(jax.random.PRNGKey(1), mu, logvar)
    assert z.shape == (4, 16)
    assert bool(jnp.all(jnp.isfinite(z)))


def test_irse_backbone_embedding():
    p = init_irse_backbone(KEY)
    x = jax.random.uniform(KEY, (1, 112, 112, 3)) * 2 - 1
    emb = apply_irse_backbone(p, x)
    assert emb.shape == (1, 512)
    assert bool(jnp.all(jnp.isfinite(emb)))


def test_id_loss_zero_for_identical():
    p = init_irse_backbone(KEY)
    x = jax.random.uniform(KEY, (1, 256, 256, 3)) * 2 - 1
    loss_same = float(id_loss(p, x, x))
    assert abs(loss_same) < 1e-4
    y = jax.random.uniform(jax.random.PRNGKey(5), (1, 256, 256, 3)) * 2 - 1
    assert float(id_loss(p, x, y)) > loss_same - 1e-6


def test_gradual_style_encoder_shapes():
    p = init_gradual_style_encoder(KEY)
    x = jax.random.uniform(KEY, (1, 256, 256, 3)) * 2 - 1
    styles = apply_gradual_style_encoder(p, x)
    assert styles.shape == (1, 6, 512)


def test_lpips_metric_properties():
    p = init_lpips(KEY, LPIPSConfig())
    x = jax.random.uniform(KEY, (1, 64, 64, 3)) * 2 - 1
    y = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 3)) * 2 - 1
    d_same = float(apply_lpips(p, x, x))
    d_diff = float(apply_lpips(p, x, y))
    assert abs(d_same) < 1e-6
    assert d_diff >= d_same


def test_loss_utils_bundle():
    lu = LossUtils()  # L2-only without pretrained weights
    x = jax.random.uniform(KEY, (2, 16, 16, 3))
    y = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    out = lu(x, y)
    assert "l2" in out and "loss" in out
    np.testing.assert_allclose(float(out["loss"]), float(out["l2"]), rtol=1e-6)


def test_vae_decoder_shapes():
    from sdface_gan_tpu.encoder.vae import (
        VAEDecoderConfig,
        apply_vae_decoder,
        init_vae_decoder,
    )

    cfg = VAEDecoderConfig(z_size=32, size=64)
    p = init_vae_decoder(KEY, cfg)
    z = jax.random.normal(KEY, (2, 32))
    img = apply_vae_decoder(p, cfg, z)
    assert img.shape == (2, 64, 64, 3)
    assert float(img.min()) >= -1.0 and float(img.max()) <= 1.0


def test_resnet_block_fc():
    from sdface_gan_tpu.models.layers import (
        apply_resnet_block_fc,
        init_resnet_block_fc,
    )

    p = init_resnet_block_fc(KEY, 16, 24)
    x = jax.random.normal(KEY, (5, 16))
    out = apply_resnet_block_fc(p, x)
    assert out.shape == (5, 24)
    # zero-init second fc => output equals the shortcut projection + bias
    expected = x @ p["shortcut"]["w"] + p["fc_1"]["b"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5)
