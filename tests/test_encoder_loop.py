"""Stage-C (inversion encoder) loop tests: VAE + pSp paths, exit/resume
contract, perceptual-weight import wiring — mirroring the stage A/B loop
tests in test_loop.py (reference contract ``training_utils.py:884-1172``)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdface_gan_tpu.encoder import PSPConfig, VAEEncoderConfig
from sdface_gan_tpu.models.generator import GeneratorConfig, init_generator
from sdface_gan_tpu.models.renderer import RendererConfig
from sdface_gan_tpu.training.encoder_loop import (
    load_perceptual_params,
    train_encoder,
)
from sdface_gan_tpu.utils.checkpoints import (
    checkpoint_exists,
    latest_checkpoint_step,
    load_checkpoint,
)

GCFG = GeneratorConfig(
    size=16, style_dim=16, full_pipeline=True, freeze_renderer=True,
    channel_multiplier=1,
    renderer=RendererConfig(type="sdf", out_im_res=8, n_samples=4,
                            style_dim=16, width=16, depth=1),
)


def fake_loader(img_res: int, thumb_res: int, batch: int):
    rng = np.random.default_rng(0)
    while True:
        yield (
            rng.uniform(-1, 1, (batch, img_res, img_res, 3)).astype(np.float32),
            rng.uniform(-1, 1, (batch, thumb_res, thumb_res, 3)).astype(np.float32),
        )


@pytest.mark.slow
def test_vae_encoder_loop_exit_resume(tmp_path):
    """Train 1 step, hit the exit-after contract, resume, finish: the loop
    must carry encoder + optimizer state across the exit(3) boundary and
    write the final {e, g_ema} artifact."""
    out = str(tmp_path / "enc")
    g_ema = init_generator(jax.random.PRNGKey(1), GCFG)
    ecfg = VAEEncoderConfig(img_size=16, z_size=GCFG.style_dim)

    with pytest.raises(SystemExit) as exc:
        train_encoder(
            fake_loader(16, 8, 2), GCFG, g_ema, ecfg, out,
            iters=4, log_every=1, save_every=0, sample_every=2,
            exit_after=0.0, val_n_sample=2,
        )
    assert exc.value.code == 3
    assert latest_checkpoint_step(out) == 0
    # eval targets + first reconstruction grid were written
    assert os.path.exists(os.path.join(out, "eval.png"))
    assert os.path.exists(os.path.join(out, "samples_0000000.png"))
    ck = load_checkpoint(out, "models_0000000")
    # Adam moved (second moment strictly positive somewhere)
    nu = [np.asarray(x) for x in jax.tree_util.tree_leaves(ck["e_opt"])]
    assert any(np.any(np.abs(x) > 0) for x in nu if x.ndim > 0)

    e = train_encoder(
        fake_loader(16, 8, 2), GCFG, g_ema, ecfg, out,
        iters=3, log_every=1, save_every=0, sample_every=0, val_n_sample=2,
    )
    assert checkpoint_exists(out, "encoder")
    final = load_checkpoint(out, "encoder")
    assert set(final.keys()) == {"e", "g_ema"}
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(e))
    # metrics JSONL exists with the encoder loss series
    assert os.path.exists(os.path.join(out, "encoder_metrics.jsonl"))


@pytest.mark.slow
def test_psp_encoder_loop_trains(tmp_path):
    """--psp path: GradualStyleEncoder W+ drives the decoder via
    input_is_latent with the learned renderer projection; one step must
    move the encoder params and produce finite metrics."""
    out = str(tmp_path / "psp")
    gcfg = GeneratorConfig(
        size=16, style_dim=256, full_pipeline=True, freeze_renderer=True,
        channel_multiplier=1,
        renderer=RendererConfig(type="sdf", out_im_res=8, n_samples=4,
                                style_dim=256, width=16, depth=1),
    )
    g_ema = init_generator(jax.random.PRNGKey(1), gcfg)
    ecfg = PSPConfig(img_size=16, style_count=gcfg.decoder.n_latent,
                     renderer_style_dim=gcfg.style_dim)
    e = train_encoder(
        fake_loader(16, 8, 2), gcfg, g_ema, ecfg, out,
        iters=2, log_every=1, save_every=0, sample_every=2, val_n_sample=1,
    )
    assert checkpoint_exists(out, "encoder")
    assert os.path.exists(os.path.join(out, "samples_0000000.png"))
    leaves = jax.tree_util.tree_leaves(e)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    # the renderer projection exists and is finite
    assert np.asarray(e["proj"]["w"]).shape == (512, 256)


@pytest.mark.slow
def test_psp_equal_resolution_decoder(tmp_path):
    """Regression: a decoder whose input resolution equals the output
    (renderer out_im_res == size, e.g. the 64^2 synthetic config) has
    n_latent == 2, below IRSEConfig's default FPN split points — the W+
    stack must clamp coarse/middle boundaries instead of indexing past the
    style list (found by a real-chip stage-C run)."""
    out = str(tmp_path / "psp_eq")
    gcfg = GeneratorConfig(
        size=16, style_dim=256, full_pipeline=True, freeze_renderer=True,
        channel_multiplier=1,
        renderer=RendererConfig(type="sdf", out_im_res=16, n_samples=4,
                                style_dim=256, width=16, depth=1),
    )
    assert gcfg.decoder.n_latent == 2
    g_ema = init_generator(jax.random.PRNGKey(1), gcfg)
    ecfg = PSPConfig(img_size=16, style_count=gcfg.decoder.n_latent,
                     renderer_style_dim=gcfg.style_dim)
    e = train_encoder(
        fake_loader(16, 16, 2), gcfg, g_ema, ecfg, out,
        iters=2, log_every=1, save_every=0, sample_every=0, val_n_sample=1,
    )
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(e))


def test_psp_rejects_non512_decoder(tmp_path):
    g_ema = init_generator(jax.random.PRNGKey(1), GCFG)  # style_dim 16
    ecfg = PSPConfig(img_size=16, style_count=GCFG.decoder.n_latent,
                     renderer_style_dim=GCFG.style_dim)
    with pytest.raises(ValueError, match="512"):
        train_encoder(fake_loader(16, 8, 2), GCFG, g_ema, ecfg,
                      str(tmp_path / "x"), iters=1)


def _fake_irse_state_dict(template):
    """Synthesize a torch-layout ir_se50 state dict covering the template
    (inverse of import_irse_state's mappings)."""
    import torch

    rng = np.random.default_rng(0)
    state = {}

    def conv(name, w_hwio):
        state[name] = torch.tensor(
            rng.normal(0, 0.02, np.transpose(w_hwio, (3, 2, 0, 1)).shape)
            .astype(np.float32))

    def bn(prefix, ch):
        state[f"{prefix}.weight"] = torch.ones(ch)
        state[f"{prefix}.bias"] = torch.zeros(ch)
        state[f"{prefix}.running_mean"] = torch.zeros(ch)
        state[f"{prefix}.running_var"] = torch.ones(ch)

    conv("input_layer.0.weight", np.asarray(template["input_conv"]["w"]))
    bn("input_layer.1", 64)
    state["input_layer.2.weight"] = torch.full((64,), 0.25)
    for i, block in enumerate(template["body"]):
        pre = f"body.{i}"
        depth = np.asarray(block["conv1"]["w"]).shape[-1]
        in_ch = np.asarray(block["conv1"]["w"]).shape[-2]
        bn(f"{pre}.res_layer.0", in_ch)
        conv(f"{pre}.res_layer.1.weight", np.asarray(block["conv1"]["w"]))
        state[f"{pre}.res_layer.2.weight"] = torch.full((depth,), 0.25)
        conv(f"{pre}.res_layer.3.weight", np.asarray(block["conv2"]["w"]))
        bn(f"{pre}.res_layer.4", depth)
        conv(f"{pre}.res_layer.5.fc1.weight", np.asarray(block["se_fc1"]["w"]))
        conv(f"{pre}.res_layer.5.fc2.weight", np.asarray(block["se_fc2"]["w"]))
        if "shortcut_conv" in block:
            conv(f"{pre}.shortcut_layer.0.weight",
                 np.asarray(block["shortcut_conv"]["w"]))
            bn(f"{pre}.shortcut_layer.1", depth)
    bn("output_layer.0", 512)
    fc = np.asarray(template["out_fc"]["w"])
    state["output_layer.3.weight"] = torch.tensor(
        rng.normal(0, 0.02, fc.T.shape).astype(np.float32))
    state["output_layer.3.bias"] = torch.zeros(fc.shape[1])
    bn("output_layer.4", 512)
    return state


def test_load_perceptual_params_imports_weights(tmp_path):
    """--irse_weights / --lpips_weights load torch archives through the
    importers into a LossUtils whose ID + LPIPS terms then activate."""
    import argparse

    import torch

    from sdface_gan_tpu.encoder import IRSEConfig, init_irse_backbone

    template = init_irse_backbone(jax.random.PRNGKey(0), IRSEConfig())
    irse_path = str(tmp_path / "model_ir_se50.pth")
    torch.save(_fake_irse_state_dict(template), irse_path)

    # LPIPS bundle: torchvision AlexNet features + lin heads
    alex = {}
    chans = [(3, 64, 11), (64, 192, 5), (192, 384, 3), (384, 256, 3), (256, 256, 3)]
    for cid, (ic, oc, k) in zip([0, 3, 6, 8, 10], chans):
        alex[f"features.{cid}.weight"] = torch.randn(oc, ic, k, k) * 0.02
        alex[f"features.{cid}.bias"] = torch.zeros(oc)
    lin = {f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1)
           for i, c in enumerate([64, 192, 384, 256, 256])}
    lpips_path = str(tmp_path / "lpips.pth")
    torch.save({"alex": alex, "lin": lin}, lpips_path)

    args = argparse.Namespace(irse_weights=irse_path, lpips_weights=lpips_path)
    lu = load_perceptual_params(args)
    assert lu.irse_params is not None and lu.lpips_params is not None

    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 256, 256, 3)) * 2 - 1
    y = jax.random.uniform(jax.random.PRNGKey(4), (1, 256, 256, 3)) * 2 - 1
    out = lu(x, y)
    assert {"l2", "id", "lpips", "loss"} <= set(out.keys())
    assert all(np.isfinite(float(v)) for v in out.values())
    # the weighted sum actually includes the perceptual terms
    expect = float(out["l2"]) + 0.1 * float(out["id"]) + 0.8 * float(out["lpips"])
    np.testing.assert_allclose(float(out["loss"]), expect, rtol=1e-5)
