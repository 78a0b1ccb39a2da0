"""End-to-end train-step tests: sphere init, stage A (D+G with R1/eikonal/
min-surface), stage B (lazy R1, content, path-reg), EMA, and the
data-parallel mesh path on 8 virtual CPU devices."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sdface_gan_tpu.models.discriminator import (
    StyleDiscConfig,
    VolumeRenderDiscConfig,
    init_style_discriminator,
    init_volume_render_discriminator,
)
from sdface_gan_tpu.models.generator import GeneratorConfig, init_generator
from sdface_gan_tpu.models.renderer import RendererConfig
from sdface_gan_tpu.parallel import data_parallel_jit, make_mesh, replicate, shard_batch
from sdface_gan_tpu.training import (
    TrainHParams,
    accumulate,
    decoder_only,
    make_sphere_init_step,
    make_stage_a_d_step,
    make_stage_a_g_step,
    make_stage_b_d_step,
    make_stage_b_g_step,
    make_stage_b_path_step,
    stage_a_optimizers,
    stage_b_optimizers,
)

KEY = jax.random.PRNGKey(0)

A_GCFG = GeneratorConfig(
    size=16, style_dim=16, full_pipeline=False,
    renderer=RendererConfig(type="sdf", out_im_res=8, n_samples=4,
                            style_dim=16, width=16, depth=2),
)
A_DCFG = VolumeRenderDiscConfig(in_res=8)
A_HP = TrainHParams(batch=4, style_dim=16)

B_GCFG = GeneratorConfig(
    size=32, style_dim=16, full_pipeline=True, freeze_renderer=True,
    channel_multiplier=1,
    renderer=RendererConfig(type="sdf", out_im_res=16, n_samples=4,
                            style_dim=16, width=16, depth=2),
)
B_DCFG = StyleDiscConfig(size=32, channel_multiplier=1)
B_HP = TrainHParams(batch=4, style_dim=16)


def _finite(tree):
    return all(
        bool(jnp.all(jnp.isfinite(x))) for x in jax.tree_util.tree_leaves(tree)
    )


def test_stage_a_steps_without_viewpoint_head():
    """view_lambda=0 disables the D viewpoint head (config/build.py:63);
    both stage-A steps must skip the viewpoint loss instead of calling
    viewpoints_loss(None, ...) (regression: trace-time TypeError)."""
    hp = TrainHParams(batch=2, style_dim=16, view_lambda=0.0)
    dcfg = VolumeRenderDiscConfig(in_res=8, viewpoint_head=False)
    g = init_generator(KEY, A_GCFG)
    d = init_volume_render_discriminator(jax.random.PRNGKey(1), dcfg)
    g_tx, d_tx = stage_a_optimizers()
    g_state, d_state = g_tx.init(g), d_tx.init(d)
    ema = jax.tree_util.tree_map(jnp.copy, g)
    thumbs = jax.random.uniform(KEY, (2, 8, 8, 3)) * 2 - 1

    d_step = jax.jit(make_stage_a_d_step(A_GCFG, dcfg, hp, d_tx))
    g_step = jax.jit(make_stage_a_g_step(A_GCFG, dcfg, hp, g_tx))
    d, d_state, dm = d_step(g, d, d_state, jax.random.PRNGKey(2), thumbs)
    g, g_state, ema, gm = g_step(g, d, g_state, ema, jax.random.PRNGKey(3))
    assert float(dm["d_view"]) == 0.0 and float(gm["g_view"]) == 0.0
    assert _finite(g) and _finite(d)


def test_sphere_init_step_reduces_loss():
    g = init_generator(KEY, A_GCFG)
    g_tx = optax.adam(1e-2)
    step = jax.jit(make_sphere_init_step(A_GCFG, A_HP, g_tx))
    state = g_tx.init(g)
    losses = []
    for i in range(8):
        g, state, m = step(g, state, jax.random.PRNGKey(i))
        losses.append(float(m["sdf_init_loss"]))
    assert losses[-1] < losses[0]
    assert _finite(g)


def test_stage_a_steps():
    kg, kd = jax.random.split(KEY)
    g = init_generator(kg, A_GCFG)
    d = init_volume_render_discriminator(kd, A_DCFG)
    g_tx, d_tx = stage_a_optimizers()
    d_step = jax.jit(make_stage_a_d_step(A_GCFG, A_DCFG, A_HP, d_tx))
    g_step = jax.jit(make_stage_a_g_step(A_GCFG, A_DCFG, A_HP, g_tx))
    d_state = d_tx.init(d)
    g_state = g_tx.init(g)
    ema = jax.tree_util.tree_map(jnp.copy, g)

    real = jax.random.uniform(KEY, (A_HP.batch, 8, 8, 3)) * 2 - 1
    d, d_state, dm = d_step(g, d, d_state, jax.random.PRNGKey(1), real)
    g, g_state, ema, gm = g_step(g, d, g_state, ema, jax.random.PRNGKey(2))

    for name in ("d", "r1", "d_view", "real_score", "fake_score"):
        assert name in dm and np.isfinite(float(dm[name]))
    for name in ("g", "g_view", "g_eikonal", "g_minimal_surface", "fg_mass"):
        assert name in gm and np.isfinite(float(gm[name]))
    # fg_mass is a weight fraction: 1 - mean background-sample weight
    assert 0.0 <= float(gm["fg_mass"]) <= 1.0
    assert _finite(g) and _finite(d) and _finite(ema)


def test_stage_a_g_step_bf16_mixed_precision():
    """g_param_dtype='bfloat16' casts the field INSIDE the loss closure:
    params/opt state/EMA must stay f32 (master weights), the step must run
    the eikonal double-backprop in bf16 without NaNs, and the loss must
    stay close to the f32 step on identical seeds."""
    kg, kd = jax.random.split(KEY)
    g = init_generator(kg, A_GCFG)
    d = init_volume_render_discriminator(kd, A_DCFG)
    g_tx, _ = stage_a_optimizers()

    results = {}
    for dt in ("float32", "bfloat16"):
        hp = TrainHParams(batch=4, style_dim=16, g_param_dtype=dt)
        step = jax.jit(make_stage_a_g_step(A_GCFG, A_DCFG, hp, g_tx))
        g1, gs1, ema1, gm = step(
            g, d, g_tx.init(g), jax.tree_util.tree_map(jnp.copy, g),
            jax.random.PRNGKey(2),
        )
        assert _finite(g1) and _finite(ema1)
        assert all(
            x.dtype == jnp.float32
            for x in jax.tree_util.tree_leaves(g1)
            if jnp.issubdtype(x.dtype, jnp.floating)
        )
        results[dt] = (g1, gm)
    m32, m16 = results["float32"][1], results["bfloat16"][1]
    # same seeds -> the bf16 step is the same step at lower precision
    assert abs(float(m16["g"]) - float(m32["g"])) < 0.1 * (
        1.0 + abs(float(m32["g"]))
    )
    # and it actually updated the params (not a no-op cast)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        results["float32"][0], g,
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


@pytest.mark.slow
def test_bf16_covers_d_steps_and_stage_b_g_step():
    """g_param_dtype='bfloat16' must also reach (a) the detached fake
    forward inside both D steps and (b) the stage-B G-step closure —
    the D params and all master weights stay f32, and metrics stay close
    to the f32 step on identical seeds (the casts are precision-only)."""
    kg, kd, kd2 = jax.random.split(KEY, 3)
    ga = init_generator(kg, A_GCFG)
    da = init_volume_render_discriminator(kd, A_DCFG)
    gb = init_generator(kg, B_GCFG)
    db = init_style_discriminator(kd2, B_DCFG)
    g_tx_a, d_tx_a = stage_a_optimizers()
    g_tx_b, d_tx_b = stage_b_optimizers()
    g_tx_b = decoder_only(g_tx_b, gb)
    real_a = jax.random.uniform(KEY, (4, 8, 8, 3)) * 2 - 1
    real_b = jax.random.uniform(KEY, (4, 32, 32, 3)) * 2 - 1

    out = {}
    for dt in ("float32", "bfloat16"):
        hp = TrainHParams(batch=4, style_dim=16, g_param_dtype=dt)
        da_step = jax.jit(make_stage_a_d_step(A_GCFG, A_DCFG, hp, d_tx_a))
        db_step = jax.jit(make_stage_b_d_step(B_GCFG, B_DCFG, hp, d_tx_b, True))
        gb_step = jax.jit(make_stage_b_g_step(B_GCFG, B_DCFG, hp, g_tx_b))
        da1, _, dam = da_step(ga, da, d_tx_a.init(da), jax.random.PRNGKey(5), real_a)
        db1, _, dbm = db_step(gb, db, d_tx_b.init(db), jax.random.PRNGKey(6), real_b)
        gb1, _, gbm = gb_step(gb, db, g_tx_b.init(gb), jax.random.PRNGKey(7))
        for tree in (da1, db1, gb1):
            assert _finite(tree)
            assert all(
                x.dtype == jnp.float32
                for x in jax.tree_util.tree_leaves(tree)
                if jnp.issubdtype(x.dtype, jnp.floating)
            )
        out[dt] = (dam, dbm, gbm)
    for m32, m16 in zip(out["float32"], out["bfloat16"]):
        for name in ("d", "g"):
            if name in m32:
                a, b = float(m32[name]), float(m16[name])
                assert abs(a - b) < 0.1 * (1.0 + abs(a)), (name, a, b)


def test_stage_a_lazy_r1():
    """a_d_reg_every > 1: the plain variant (with_r1=False) must run and
    omit the r1 metric, and the regularized variant must scale the penalty
    by the interval (StyleGAN2 lazy-reg convention, mirroring the stage-B
    pair) — so r1(every=k) == k * r1(every=1) on identical seeds/params."""
    kg, kd = jax.random.split(KEY)
    g = init_generator(kg, A_GCFG)
    d = init_volume_render_discriminator(kd, A_DCFG)
    real = jax.random.uniform(KEY, (4, 8, 8, 3)) * 2 - 1

    r1_vals = {}
    for every in (1, 4):
        hp = TrainHParams(batch=4, style_dim=16, a_d_reg_every=every)
        _, d_tx = stage_a_optimizers(every)
        d_state = d_tx.init(d)
        reg_step = jax.jit(make_stage_a_d_step(A_GCFG, A_DCFG, hp, d_tx))
        d1, d_state, dm = reg_step(g, d, d_state, jax.random.PRNGKey(5), real)
        assert "r1" in dm and _finite(d1)
        r1_vals[every] = float(dm["r1"])
        if every > 1:
            plain_step = jax.jit(
                make_stage_a_d_step(A_GCFG, A_DCFG, hp, d_tx, with_r1=False)
            )
            d2, _, pm = plain_step(g, d, d_tx.init(d), jax.random.PRNGKey(5), real)
            assert "r1" not in pm and _finite(d2)
            # the plain variant still trains the logistic + viewpoint terms
            for name in ("d", "d_view", "real_score", "fake_score"):
                assert name in pm and np.isfinite(float(pm[name]))
    assert abs(r1_vals[4] - 4.0 * r1_vals[1]) < 1e-4 * (1.0 + abs(r1_vals[4]))


def test_occupancy_sparsity_loss_prices_fog_above_geometry():
    """The prior must make the measured fog regime (sdf ~ -0.07 everywhere,
    docs/TRAINING_RUN.md) strictly more expensive than a surface-bearing
    field, and must not backprop into the learnable beta (else it would
    fight the beta anneal by widening the sigmoid)."""
    from sdface_gan_tpu.losses.geometry_losses import occupancy_sparsity_loss

    beta = jnp.asarray([0.0756])
    fog = jnp.full((2, 4, 4, 8, 1), -0.07)
    # a surface: sdf < 0 on only 1/8 of samples, saturated positive outside
    geo = jnp.where(jnp.arange(8).reshape(1, 1, 1, 8, 1) == 3, -0.2, 0.5)
    geo = jnp.broadcast_to(geo, fog.shape)
    l_fog = float(occupancy_sparsity_loss(fog, beta))
    l_geo = float(occupancy_sparsity_loss(geo, beta))
    assert l_fog > 0.5 and l_geo < 0.2 and l_fog > 3 * l_geo
    g_beta = jax.grad(lambda b: occupancy_sparsity_loss(fog, b))(beta)
    assert float(jnp.abs(g_beta).max()) == 0.0


def test_stage_a_sparsity_metric():
    """sparsity_lambda > 0 wires the occupancy prior into the stage-A G
    step (and forces return_sdf) even with min_surf off."""
    hp = TrainHParams(batch=2, style_dim=16, sparsity_lambda=0.1,
                      min_surf_lambda=0.0)
    g = init_generator(KEY, A_GCFG)
    d = init_volume_render_discriminator(KEY, A_DCFG)
    g_tx, _ = stage_a_optimizers()
    g_step = jax.jit(make_stage_a_g_step(A_GCFG, A_DCFG, hp, g_tx))
    g_state = g_tx.init(g)
    ema = jax.tree_util.tree_map(jnp.copy, g)
    g, g_state, ema, gm = g_step(g, d, g_state, ema, jax.random.PRNGKey(3))
    assert "g_sparsity" in gm and np.isfinite(float(gm["g_sparsity"]))
    assert 0.0 < float(gm["g_sparsity"]) < hp.sparsity_lambda
    assert _finite(g)


def test_distortion_loss_prices_fog_above_surface():
    """mip-NeRF 360 distortion: spread weight (fog) pays, weight
    concentrated in one interval (a surface) pays ~an interval width,
    empty rays pay ~0; the O(S) cumsum form must match the O(S^2)
    pairwise definition."""
    from sdface_gan_tpu.losses.geometry_losses import distortion_loss

    s = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 8), (2, 3, 3, 8))
    fog = jnp.full((2, 3, 3, 8), 1.0 / 8.0)
    surf = jnp.zeros((2, 3, 3, 8)).at[..., 3].set(0.9)
    empty = jnp.zeros((2, 3, 3, 8))
    l_fog = float(distortion_loss(fog, s))
    l_surf = float(distortion_loss(surf, s))
    l_empty = float(distortion_loss(empty, s))
    assert l_fog > 5 * l_surf > 0 and l_empty == 0.0

    # brute-force pairwise check on random weights
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    w = jax.random.uniform(k1, (2, 3, 3, 8)) * 0.2
    sv = jnp.sort(jax.random.uniform(k2, (2, 3, 3, 8)), axis=-1)
    d = jnp.diff(sv, axis=-1)
    d = jnp.concatenate([d, d[..., -1:]], axis=-1)
    pair = jnp.sum(
        w[..., :, None] * w[..., None, :]
        * jnp.abs(sv[..., :, None] - sv[..., None, :]),
        axis=(-2, -1),
    )
    ref = float(jnp.mean(pair + jnp.sum(w * w * d, -1) / 3.0))
    np.testing.assert_allclose(float(distortion_loss(w, sv)), ref, rtol=1e-5)


def test_stage_a_distortion_metric():
    """distortion_lambda > 0 threads return_weights through the generator
    and adds the weighted distortion term to the stage-A G loss."""
    hp = TrainHParams(batch=2, style_dim=16, distortion_lambda=0.1,
                      min_surf_lambda=0.0, sparsity_lambda=0.0)
    g = init_generator(KEY, A_GCFG)
    d = init_volume_render_discriminator(KEY, A_DCFG)
    g_tx, _ = stage_a_optimizers()
    g_step = jax.jit(make_stage_a_g_step(A_GCFG, A_DCFG, hp, g_tx))
    g_state = g_tx.init(g)
    ema = jax.tree_util.tree_map(jnp.copy, g)
    g, g_state, ema, gm = g_step(g, d, g_state, ema, jax.random.PRNGKey(3))
    assert "g_distortion" in gm and np.isfinite(float(gm["g_distortion"]))
    assert float(gm["g_distortion"]) >= 0.0
    assert _finite(g)


@pytest.mark.slow
def test_stage_a_ngp_smoothness_metric():
    gcfg = GeneratorConfig(
        size=16, style_dim=16, full_pipeline=False,
        renderer=RendererConfig(type="ngp", out_im_res=4, n_samples=3,
                                style_dim=16, width=16),
    )
    hp = TrainHParams(batch=2, style_dim=16)
    g = init_generator(KEY, gcfg)
    d = init_volume_render_discriminator(KEY, VolumeRenderDiscConfig(in_res=4))
    g_tx, _ = stage_a_optimizers()
    g_step = jax.jit(
        make_stage_a_g_step(gcfg, VolumeRenderDiscConfig(in_res=4), hp, g_tx)
    )
    g_state = g_tx.init(g)
    ema = jax.tree_util.tree_map(jnp.copy, g)
    g, g_state, ema, gm = g_step(g, d, g_state, ema, jax.random.PRNGKey(3))
    assert "g_smooth" in gm and np.isfinite(float(gm["g_smooth"]))


@pytest.mark.slow
def test_stage_b_steps_and_decoder_only_freeze():
    kg, kd = jax.random.split(KEY)
    g = init_generator(kg, B_GCFG)
    d = init_style_discriminator(kd, B_DCFG)
    g_tx_raw, d_tx = stage_b_optimizers()
    g_tx = decoder_only(g_tx_raw, g)
    d_state = d_tx.init(d)
    g_state = g_tx.init(g)
    ema = jax.tree_util.tree_map(jnp.copy, g)

    d_step_reg = jax.jit(make_stage_b_d_step(B_GCFG, B_DCFG, B_HP, d_tx, True))
    d_step = jax.jit(make_stage_b_d_step(B_GCFG, B_DCFG, B_HP, d_tx, False))
    g_step = jax.jit(make_stage_b_g_step(B_GCFG, B_DCFG, B_HP, g_tx))
    path_step = jax.jit(make_stage_b_path_step(B_GCFG, B_HP, g_tx))

    real = jax.random.uniform(KEY, (B_HP.batch, 32, 32, 3)) * 2 - 1
    d, d_state, dm1 = d_step_reg(g, d, d_state, jax.random.PRNGKey(1), real)
    assert "r1" in dm1
    d, d_state, dm2 = d_step(g, d, d_state, jax.random.PRNGKey(2), real)
    assert "r1" not in dm2

    g_before = jax.tree_util.tree_map(jnp.copy, g)
    g, g_state, gm = g_step(g, d, g_state, jax.random.PRNGKey(3))
    assert "g" in gm and "g_content" in gm
    # renderer + mapping frozen, decoder updated
    r_delta = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g_before["renderer"], g["renderer"]
    )
    assert max(jax.tree_util.tree_leaves(r_delta)) == 0.0
    dec_delta = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g_before["decoder"], g["decoder"]
    )
    assert max(jax.tree_util.tree_leaves(dec_delta)) > 0.0

    mean_pl = jnp.zeros(())
    g, g_state, mean_pl, pm = path_step(g, g_state, mean_pl, jax.random.PRNGKey(4))
    assert "path" in pm and np.isfinite(float(pm["path"]))
    assert _finite(g)


def test_ema_accumulate_decay():
    a = {"w": jnp.ones((3,))}
    b = {"w": jnp.zeros((3,))}
    out = accumulate(a, b, decay=0.75)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.75)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_stage_a_data_parallel_on_mesh():
    mesh = make_mesh()
    kg, kd = jax.random.split(KEY)
    g = init_generator(kg, A_GCFG)
    d = init_volume_render_discriminator(kd, A_DCFG)
    hp = TrainHParams(batch=8, style_dim=16)
    g_tx, d_tx = stage_a_optimizers()
    d_state = d_tx.init(d)

    d_step = data_parallel_jit(
        make_stage_a_d_step(A_GCFG, A_DCFG, hp, d_tx), mesh, batch_argnums=(4,)
    )
    g = replicate(g, mesh)
    d = replicate(d, mesh)
    d_state = replicate(d_state, mesh)
    real = shard_batch(jax.random.uniform(KEY, (8, 8, 8, 3)) * 2 - 1, mesh)
    d2, d_state2, dm = d_step(g, d, d_state, jax.random.PRNGKey(1), real)
    assert np.isfinite(float(dm["d"]))
    # results match the single-device step
    d_ref_step = jax.jit(make_stage_a_d_step(A_GCFG, A_DCFG, hp, d_tx))
    d3, _, dm_ref = d_ref_step(g, d, d_tx.init(d), jax.random.PRNGKey(1),
                               jax.device_get(real))
    np.testing.assert_allclose(float(dm["d"]), float(dm_ref["d"]), rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ray_sharded_render_matches_single_device():
    from sdface_gan_tpu.geometry import generate_camera_params
    from sdface_gan_tpu.models.renderer import RendererConfig, init_renderer, render
    from sdface_gan_tpu.parallel import make_mesh
    from sdface_gan_tpu.parallel.rays import render_ray_sharded

    cfg = RendererConfig(type="sdf", out_im_res=16, n_samples=4,
                         style_dim=16, width=16, depth=2, perturb=0.0)
    p = init_renderer(jax.random.PRNGKey(0), cfg)
    cams = generate_camera_params(16, jax.random.PRNGKey(1), batch=2)
    style = jax.random.normal(jax.random.PRNGKey(2), (2, 16))

    ref = render(p, cfg, cams.focal, cams.extrinsics, cams.near, cams.far, style)
    mesh = make_mesh()
    out = jax.jit(
        lambda: render_ray_sharded(
            p, cfg, cams.focal, cams.extrinsics, cams.near, cams.far, style, mesh
        )
    )()
    # sharded matmul partitioning reorders accumulation; ~3e-5 drift
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.features), np.asarray(ref.features),
                               rtol=1e-3, atol=1e-4)
