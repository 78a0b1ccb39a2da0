"""Tests for the long-tail parity components: microbatching, Ranger/GC,
object-existence sampling, bbox priors, SDFModel container."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

KEY = jax.random.PRNGKey(0)


def test_accumulate_gradients_matches_full_batch():
    from sdface_gan_tpu.training.microbatch import accumulate_gradients

    params = {"w": jnp.arange(4.0)}
    batch = {"x": jax.random.normal(KEY, (8, 4)), "y": jax.random.normal(KEY, (8,))}

    def loss_fn(p, b):
        pred = b["x"] @ p["w"]
        return jnp.mean((pred - b["y"]) ** 2), {}

    g_full = jax.grad(lambda p: loss_fn(p, batch)[0])(params)
    g_acc, loss, _ = accumulate_gradients(loss_fn, params, batch, n_chunks=4)
    np.testing.assert_allclose(np.asarray(g_acc["w"]), np.asarray(g_full["w"]),
                               rtol=1e-5)


def test_gradient_centralization_zero_mean():
    from sdface_gan_tpu.training.optim import gradient_centralization, ranger

    gc = gradient_centralization()
    g = {"w": jax.random.normal(KEY, (4, 6)), "b": jnp.ones((6,))}
    out, _ = gc.update(g, gc.init(g))
    np.testing.assert_allclose(np.asarray(out["w"].mean(axis=1)), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["b"]), 1.0)  # 1-D untouched
    # ranger steps on PLAIN params (lookahead slow weights live in the
    # optimizer state, not a LookaheadParams wrapper)
    tx = ranger(1e-3, sync_period=2, slow_step_size=0.5)
    params = {"w": jnp.ones((3, 3))}
    state = tx.init(params)
    grads = {"w": jnp.ones((3, 3))}
    # step 1: no sync — behaves like the inner optimizer
    u1, state = tx.update(grads, state, params)
    p1 = optax.apply_updates(params, u1)
    # step 2: sync — params snap to slow + 0.5 * (fast - slow)
    u2, state = tx.update(grads, state, p1)
    p2 = optax.apply_updates(p1, u2)
    slow0 = np.ones((3, 3))
    # reconstruct: fast after 2 inner steps vs the synced value
    assert np.all(np.asarray(p2["w"]) > np.asarray(p1["w"]) - 1.0)  # finite
    # the synced params lie strictly between the initial (slow) weights and
    # the fast trajectory, which a plain optimizer would not produce
    fast_dir = np.asarray(p1["w"]) - slow0
    synced_dir = np.asarray(p2["w"]) - slow0
    assert np.all(np.abs(synced_dir) <= np.abs(fast_dir) + 1e-3)


def test_object_existence_mask():
    from sdface_gan_tpu.giraffe.bbox import BBoxConfig
    from sdface_gan_tpu.giraffe.generator import (
        GiraffeConfig,
        sample_object_existence,
    )

    cfg = GiraffeConfig(bbox=BBoxConfig(n_boxes=5), sample_object_existance=True)
    mask = sample_object_existence(KEY, cfg, 64)
    assert mask.shape == (64, 5)
    counts = np.asarray(mask.sum(axis=1))
    assert counts.min() >= 2 and counts.max() <= 5


def test_bbox_prior_translations():
    from sdface_gan_tpu.giraffe.bbox import BBoxConfig, sample_transformations

    cfg = BBoxConfig(n_boxes=2)
    prior = jnp.asarray(np.tile(np.array([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]]),
                                (7, 1, 1)))
    s, t, r = sample_transformations(KEY, cfg, batch_size=3, prior=prior)
    np.testing.assert_allclose(np.asarray(t[0]),
                               [[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]], rtol=1e-6)


def test_sdf_model_container():
    from sdface_gan_tpu.models.container import SDFModel
    from sdface_gan_tpu.models.generator import GeneratorConfig
    from sdface_gan_tpu.models.renderer import RendererConfig

    gcfg = GeneratorConfig(
        size=16, style_dim=16, full_pipeline=False,
        renderer=RendererConfig(type="sdf", out_im_res=8, n_samples=4,
                                style_dim=16, width=16, depth=1),
    )
    m = SDFModel.create(KEY, gcfg)
    assert "renderer" in m.generator and "renderer" in m.generator_test
    from sdface_gan_tpu.models.discriminator import VolumeRenderDiscConfig

    assert isinstance(m.dcfg, VolumeRenderDiscConfig)


def test_serving_sampler():
    from sdface_gan_tpu.models.generator import GeneratorConfig, init_generator
    from sdface_gan_tpu.models.renderer import RendererConfig
    from sdface_gan_tpu.serving import SDFaceSampler

    cfg = GeneratorConfig(
        size=16, style_dim=16, full_pipeline=False,
        renderer=RendererConfig(type="sdf", out_im_res=8, n_samples=4,
                                style_dim=16, width=16, depth=1),
    )
    params = init_generator(KEY, cfg)
    sampler = SDFaceSampler(params, cfg, batch=2, use_fused_kernel=False)
    imgs = sampler.sample(seed=1)
    assert imgs.shape == (2, 8, 8, 3)
    fixed = sampler.sample(seed=1, azim=0.2, elev=0.1)
    assert fixed.shape == (2, 8, 8, 3)
    # same seed + viewpoint => deterministic
    np.testing.assert_allclose(fixed, sampler.sample(seed=1, azim=0.2, elev=0.1))
