"""Discriminator torch goldens: both D's vs the reference semantics
(``im2scene/sdf/models/sdf_model.py``: VolumeRenderDiscriminator
:1224-1398, StyleGAN ``Discriminator`` :846-880,1400-1509) as functional
torch programs over shared weight arrays.

These pin the training-side parity the generator goldens don't touch:
CoordConv channel order, the biasless-conv + scale-1 FusedLeakyReLU
layering, the /sqrt(2) residual merges, blur-pad arithmetic in the
downsample ConvLayer, minibatch-stddev group math, and the NCHW-vs-NHWC
flatten order feeding the final EqualLinear (torch flattens (c, h, w),
we flatten (h, w, c) — the golden encodes the required permutation for
any future D-weight import)."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdface_gan_tpu.models.discriminator import (  # noqa: E402
    StyleDiscConfig,
    VolumeRenderDiscConfig,
    apply_style_discriminator,
    apply_volume_render_discriminator,
)
from test_torch_parity import torch_upfirdn2d  # noqa: E402

RNG = np.random.default_rng(0)
SQRT2 = math.sqrt(2.0)


def _conv_np(in_ch, out_ch, k, bias=True):
    p = {"weight": RNG.standard_normal((out_ch, in_ch, k, k)).astype(np.float32) * 0.1}
    if bias:
        p["bias"] = RNG.standard_normal((out_ch,)).astype(np.float32) * 0.05
    return p


def _ours_conv(p):
    out = {"w": jnp.asarray(np.transpose(p["weight"], (2, 3, 1, 0)))}
    if "bias" in p:
        out["b"] = jnp.asarray(p["bias"])
    return out


# ---------------------------------------------------------------------------
# VolumeRenderDiscriminator (stage A)
# ---------------------------------------------------------------------------

RES_A = 16
CH = 400  # VOLRENDER_CHANNELS at 16/8/4/2 are all 400


def _t_addcoords(x):
    b, _, h, w = x.shape
    xx = torch.linspace(-1.0, 1.0, w).view(1, 1, 1, w).expand(b, 1, h, w)
    yy = torch.linspace(-1.0, 1.0, h).view(1, 1, h, 1).expand(b, 1, h, w)
    return torch.cat([x, yy, xx], dim=1)


def _t_vrd_conv(x, p, act_bias=None, stride=1, padding=0):
    out = F.conv2d(x, torch.from_numpy(p["weight"]),
                   torch.from_numpy(p["bias"]) if "bias" in p else None,
                   stride=stride, padding=padding)
    if act_bias is not None:
        out = F.leaky_relu(out + torch.from_numpy(act_bias).view(1, -1, 1, 1), 0.2)
    return out  # scale=1 FusedLeakyReLU


def test_volume_render_discriminator_golden():
    state = {
        "conv_in": {"conv": _conv_np(3, CH, 1, bias=False),
                    "act": RNG.standard_normal((CH,)).astype(np.float32) * 0.02},
        "blocks": [
            {
                "conv1": {"conv": _conv_np(CH + 2, CH, 3, bias=False),
                          "act": RNG.standard_normal((CH,)).astype(np.float32) * 0.02},
                "conv2": {"conv": _conv_np(CH + 2, CH, 3, bias=False),
                          "act": RNG.standard_normal((CH,)).astype(np.float32) * 0.02},
            }
            for _ in range(3)  # 16 -> 8 -> 4 -> 2
        ],
        "final": _conv_np(CH, 3, 2, bias=True),
    }

    # torch oracle (sdf_model.py:1326-1351, 1354-1398)
    x = RNG.standard_normal((2, 3, RES_A, RES_A)).astype(np.float32)
    out = _t_vrd_conv(torch.from_numpy(x), state["conv_in"]["conv"],
                      state["conv_in"]["act"])
    for blk in state["blocks"]:
        h = _t_vrd_conv(_t_addcoords(out), blk["conv1"]["conv"], blk["conv1"]["act"],
                        padding=1)
        h = _t_vrd_conv(_t_addcoords(h), blk["conv2"]["conv"], blk["conv2"]["act"],
                        padding=1)
        h = F.avg_pool2d(h, 2)
        out = (h + F.avg_pool2d(out, 2)) / SQRT2  # same-channel: no skip conv
    out = _t_vrd_conv(out, state["final"])  # k=2 on 2x2 -> 1x1
    gan_t = out[:, 0:1].reshape(-1, 1)
    view_t = out[:, 1:].reshape(-1, 2)

    # ours, from the same weights
    params = {
        "conv_in": {**_ours_conv(state["conv_in"]["conv"]),
                    "act_bias": jnp.asarray(state["conv_in"]["act"])},
        "blocks": [
            {
                "conv1": {**_ours_conv(b["conv1"]["conv"]),
                          "act_bias": jnp.asarray(b["conv1"]["act"])},
                "conv2": {**_ours_conv(b["conv2"]["conv"]),
                          "act_bias": jnp.asarray(b["conv2"]["act"])},
            }
            for b in state["blocks"]
        ],
        "final": _ours_conv(state["final"]),
    }
    cfg = VolumeRenderDiscConfig(in_res=RES_A)
    gan_j, view_j = apply_volume_render_discriminator(
        params, cfg, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    np.testing.assert_allclose(np.asarray(gan_j), gan_t.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(view_j), view_t.numpy(), rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# StyleGAN Discriminator (stage B)
# ---------------------------------------------------------------------------

RES_B = 16
SCH = 512  # channel_table at 16/8/4


def _t_equal_conv(x, p, stride=1, padding=0):
    w = torch.from_numpy(p["weight"])
    scale = 1.0 / math.sqrt(w.shape[1] * w.shape[2] * w.shape[3])
    b = torch.from_numpy(p["bias"]) if "bias" in p else None
    return F.conv2d(x, w * scale, b, stride=stride, padding=padding)


def _t_conv_layer(x, p, k, downsample=False, act=None):
    """ConvLayer (sdf_model.py:846-880): [Blur] + EqualConv2d + fused lrelu."""
    if downsample:
        pb = (4 - 2) + (k - 1)
        kern = np.array([1.0, 3.0, 3.0, 1.0], np.float32)
        kern = np.outer(kern, kern)
        kern /= kern.sum()
        x = torch.from_numpy(
            torch_upfirdn2d(x.numpy(), kern, 1, 1, ((pb + 1) // 2, pb // 2))
        )
        out = _t_equal_conv(x, p, stride=2, padding=0)
    else:
        out = _t_equal_conv(x, p, stride=1, padding=k // 2)
    if act is not None:
        out = F.leaky_relu(out + torch.from_numpy(act).view(1, -1, 1, 1), 0.2) * SQRT2
    return out


def test_style_discriminator_golden():
    zeros = lambda c: np.zeros((c,), np.float32)
    state = {
        "conv_in": {"conv": _conv_np(3, SCH, 1, bias=False), "act": zeros(SCH)},
        "blocks": [
            {
                "conv1": {"conv": _conv_np(SCH, SCH, 3, bias=False), "act": zeros(SCH)},
                "conv2": {"conv": _conv_np(SCH, SCH, 3, bias=False), "act": zeros(SCH)},
                "skip": {"conv": _conv_np(SCH, SCH, 1, bias=False)},
            }
            for _ in range(2)  # 16 -> 8 -> 4
        ],
        "final_conv": {"conv": _conv_np(SCH + 1, SCH, 3, bias=False), "act": zeros(SCH)},
        "lin1": {"weight": RNG.standard_normal((SCH, SCH * 16)).astype(np.float32),
                 "bias": RNG.standard_normal((SCH,)).astype(np.float32) * 0.05},
        "lin2": {"weight": RNG.standard_normal((1, SCH)).astype(np.float32),
                 "bias": RNG.standard_normal((1,)).astype(np.float32) * 0.05},
    }

    batch = 4
    x = RNG.standard_normal((batch, 3, RES_B, RES_B)).astype(np.float32)

    # torch oracle (sdf_model.py:1462-1486)
    out = _t_conv_layer(torch.from_numpy(x), state["conv_in"]["conv"], 1,
                        act=state["conv_in"]["act"])
    for blk in state["blocks"]:
        h = _t_conv_layer(out, blk["conv1"]["conv"], 3, act=blk["conv1"]["act"])
        h = _t_conv_layer(h, blk["conv2"]["conv"], 3, downsample=True,
                          act=blk["conv2"]["act"])
        skip = _t_conv_layer(out, blk["skip"]["conv"], 1, downsample=True)
        out = (h + skip) / SQRT2
    b, c, hh, ww = out.shape
    g = min(batch, 4)
    std = out.view(g, -1, 1, c, hh, ww)
    std = torch.sqrt(std.var(0, unbiased=False) + 1e-8)
    std = std.mean([2, 3, 4], keepdims=True).squeeze(2)
    std = std.repeat(g, 1, hh, ww)
    out = torch.cat([out, std], 1)
    out = _t_conv_layer(out, state["final_conv"]["conv"], 3,
                        act=state["final_conv"]["act"])
    feat = out.view(batch, -1)  # torch flatten order: (c, h, w)
    l1w = torch.from_numpy(state["lin1"]["weight"])
    h1 = F.linear(feat, l1w * (1.0 / math.sqrt(l1w.shape[1])))
    h1 = F.leaky_relu(h1 + torch.from_numpy(state["lin1"]["bias"]), 0.2) * SQRT2
    l2w = torch.from_numpy(state["lin2"]["weight"])
    logits_t = F.linear(h1, l2w * (1.0 / math.sqrt(l2w.shape[1])),
                        torch.from_numpy(state["lin2"]["bias"]))

    # ours.  EqualLinear stores w as [in, out]; our features flatten
    # (h, w, c), torch flattens (c, h, w) -> permute lin1's input rows.
    l1 = state["lin1"]["weight"].T.reshape(SCH, 4, 4, SCH)  # (c,h,w) rows
    l1 = np.transpose(l1, (1, 2, 0, 3)).reshape(SCH * 16, SCH)  # -> (h,w,c)
    params = {
        "conv_in": {"conv": _ours_conv(state["conv_in"]["conv"]),
                    "act_bias": jnp.asarray(state["conv_in"]["act"])},
        "blocks": [
            {
                "conv1": {"conv": _ours_conv(b_["conv1"]["conv"]),
                          "act_bias": jnp.asarray(b_["conv1"]["act"])},
                "conv2": {"conv": _ours_conv(b_["conv2"]["conv"]),
                          "act_bias": jnp.asarray(b_["conv2"]["act"])},
                "skip": {"conv": _ours_conv(b_["skip"]["conv"])},
            }
            for b_ in state["blocks"]
        ],
        "final_conv": {"conv": _ours_conv(state["final_conv"]["conv"]),
                       "act_bias": jnp.asarray(state["final_conv"]["act"])},
        "final_linear1": {"w": jnp.asarray(l1), "b": jnp.asarray(state["lin1"]["bias"])},
        "final_linear2": {"w": jnp.asarray(state["lin2"]["weight"].T),
                          "b": jnp.asarray(state["lin2"]["bias"])},
    }
    cfg = StyleDiscConfig(size=RES_B, channel_multiplier=1)
    logits_j = apply_style_discriminator(
        params, cfg, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(),
                               rtol=2e-3, atol=2e-3)
