"""GIRAFFE torch goldens: decoder MLP and neural renderer vs the
reference semantics (``im2scene/giraffe/models/decoder.py:9-283``,
``neural_renderer.py:7-101``, ``im2scene/layers.py:94-103``) run as a
functional torch program over the same weight arrays.

The GIRAFFE family had invariant/shape tests only; these pin the exact
numerics — positional-encoding frequency layout, skip-connection
placement, z-injection points, the nn/bilinear+blur upsampling chain and
RGB skip accumulation — the way ``test_full_chain_golden.py`` does for
the SDF family."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdface_gan_tpu.giraffe.decoder import (  # noqa: E402
    DecoderConfig,
    apply_giraffe_decoder,
)
from sdface_gan_tpu.giraffe.neural_renderer import (  # noqa: E402
    NeuralRendererConfig,
    apply_neural_renderer,
)

RNG = np.random.default_rng(0)


def _lin_np(in_dim, out_dim):
    return {
        "weight": RNG.standard_normal((out_dim, in_dim)).astype(np.float32) * 0.1,
        "bias": RNG.standard_normal((out_dim,)).astype(np.float32) * 0.05,
    }


def _conv_np(in_ch, out_ch, k):
    return {
        "weight": RNG.standard_normal((out_ch, in_ch, k, k)).astype(np.float32) * 0.1,
        "bias": RNG.standard_normal((out_ch,)).astype(np.float32) * 0.05,
    }


def _t_lin(x, p):
    return F.linear(x, torch.from_numpy(p["weight"]), torch.from_numpy(p["bias"]))


def _ours_lin(p):
    return {"w": jnp.asarray(p["weight"].T), "b": jnp.asarray(p["bias"])}


def _ours_conv(p):
    return {
        "w": jnp.asarray(np.transpose(p["weight"], (2, 3, 1, 0))),
        "b": jnp.asarray(p["bias"]),
    }


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

HID, ZDIM, NBLOCKS, RGBOUT = 32, 8, 5, 16
SKIPS = (2,)
LP, LV = 10, 4  # n_freq_posenc / n_freq_posenc_views


def _torch_pe(p, L):
    """Reference transform_points (decoder.py:127-146): /2 downscale, then
    per-frequency [sin(2^i pi p), cos(2^i pi p)] blocks."""
    p = p / 2.0
    return torch.cat(
        [
            torch.cat(
                [torch.sin((2**i) * math.pi * p), torch.cos((2**i) * math.pi * p)], -1
            )
            for i in range(L)
        ],
        -1,
    )


def _torch_decoder(state, pts, ray_d, z_shape, z_app):
    """Reference Decoder.forward (decoder.py:216-283), normal PE."""
    a = F.relu
    p = _torch_pe(pts, LP)
    net = _t_lin(p, state["fc_in"]) + _t_lin(z_shape, state["fc_z"]).unsqueeze(1)
    net = a(net)
    skip_idx = 0
    for idx in range(NBLOCKS - 1):
        net = a(_t_lin(net, state["blocks"][idx]))
        if (idx + 1) in SKIPS and idx < NBLOCKS - 2:
            net = net + _t_lin(z_shape, state["fc_z_skips"][skip_idx]).unsqueeze(1)
            net = net + _t_lin(p, state["fc_p_skips"][skip_idx])
            skip_idx += 1
    sigma = _t_lin(net, state["sigma_out"]).squeeze(-1)

    net = _t_lin(net, state["feat_view"])
    net = net + _t_lin(z_app, state["fc_z_view"]).unsqueeze(1)
    rd = ray_d / torch.norm(ray_d, dim=-1, keepdim=True)
    net = net + _t_lin(_torch_pe(rd, LV), state["fc_view"])
    net = a(net)
    feat = _t_lin(net, state["feat_out"])
    return feat, sigma


def test_giraffe_decoder_golden():
    state = {
        "fc_in": _lin_np(3 * LP * 2, HID),
        "fc_z": _lin_np(ZDIM, HID),
        "blocks": [_lin_np(HID, HID) for _ in range(NBLOCKS - 1)],
        "fc_z_skips": [_lin_np(ZDIM, HID)],
        "fc_p_skips": [_lin_np(3 * LP * 2, HID)],
        "sigma_out": _lin_np(HID, 1),
        "fc_z_view": _lin_np(ZDIM, HID),
        "feat_view": _lin_np(HID, HID),
        "fc_view": _lin_np(3 * LV * 2, HID),
        "feat_out": _lin_np(HID, RGBOUT),
    }
    cfg = DecoderConfig(
        hidden_size=HID, n_blocks=NBLOCKS, skips=SKIPS, z_dim=ZDIM,
        rgb_out_dim=RGBOUT, n_freq_posenc=LP, n_freq_posenc_views=LV,
    )
    params = {
        k: ([_ours_lin(v) for v in state[k]] if isinstance(state[k], list) else _ours_lin(state[k]))
        for k in state
    }

    pts = RNG.standard_normal((2, 40, 3)).astype(np.float32)
    ray_d = RNG.standard_normal((2, 40, 3)).astype(np.float32)
    z_shape = RNG.standard_normal((2, ZDIM)).astype(np.float32)
    z_app = RNG.standard_normal((2, ZDIM)).astype(np.float32)

    feat_t, sigma_t = _torch_decoder(
        state, torch.from_numpy(pts), torch.from_numpy(ray_d),
        torch.from_numpy(z_shape), torch.from_numpy(z_app),
    )
    feat_j, sigma_j = apply_giraffe_decoder(
        params, cfg, jnp.asarray(pts), jnp.asarray(ray_d),
        jnp.asarray(z_shape), jnp.asarray(z_app),
    )
    np.testing.assert_allclose(np.asarray(feat_j), feat_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma_j), sigma_t.numpy(), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Neural renderer
# ---------------------------------------------------------------------------

NFEAT, MINFEAT, IMG = 16, 4, 64  # n_blocks = log2(64) - 4 = 2


def _torch_blur(x):
    """kornia filter2D with the [1,2,1] kernel, normalized, reflect border
    (im2scene/layers.py:94-103)."""
    f = torch.tensor([1.0, 2.0, 1.0])
    k = (f[None, :] * f[:, None])
    k = k / k.sum()
    c = x.shape[1]
    x = F.pad(x, (1, 1, 1, 1), mode="reflect")
    return F.conv2d(x, k.expand(c, 1, 3, 3), groups=c)


def _t_conv(x, p, padding):
    return F.conv2d(x, torch.from_numpy(p["weight"]), torch.from_numpy(p["bias"]),
                    padding=padding)


def _torch_neural_renderer(state, x):
    """Reference NeuralRenderer.forward (neural_renderer.py:78-101):
    upsample_feat='nn', upsample_rgb='bilinear'+Blur, rgb skip."""
    up_nn = lambda t: F.interpolate(t, scale_factor=2.0, mode="nearest")
    up_bl = lambda t: _torch_blur(
        F.interpolate(t, scale_factor=2.0, mode="bilinear", align_corners=False)
    )
    net = x  # n_feat == input_dim: conv_in is identity
    rgb = up_bl(_t_conv(x, state["conv_rgb"][0], 1))
    for idx in range(2):
        net = F.leaky_relu(_t_conv(up_nn(net), state["conv_layers"][idx], 1), 0.2)
        rgb = rgb + _t_conv(net, state["conv_rgb"][idx + 1], 1)
        if idx < 1:
            rgb = up_bl(rgb)
    return torch.sigmoid(rgb)


def test_neural_renderer_golden():
    chans = [NFEAT, max(NFEAT // 2, MINFEAT), max(NFEAT // 4, MINFEAT)]
    state = {
        "conv_layers": [_conv_np(chans[0], chans[1], 3), _conv_np(chans[1], chans[2], 3)],
        "conv_rgb": [_conv_np(NFEAT, 3, 3), _conv_np(chans[1], 3, 3), _conv_np(chans[2], 3, 3)],
    }
    cfg = NeuralRendererConfig(
        n_feat=NFEAT, input_dim=NFEAT, min_feat=MINFEAT, img_size=IMG
    )
    params = {
        "conv_layers": [_ours_conv(c) for c in state["conv_layers"]],
        "conv_rgb": [_ours_conv(c) for c in state["conv_rgb"]],
    }
    x = RNG.standard_normal((2, NFEAT, 16, 16)).astype(np.float32)

    ref = _torch_neural_renderer(state, torch.from_numpy(x)).numpy()
    ours = apply_neural_renderer(
        params, cfg, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-5
    )
