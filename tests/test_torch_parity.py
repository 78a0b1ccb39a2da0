"""Numerical parity vs PyTorch for the ops whose exact semantics matter
for reference-weight import (SURVEY.md §7 hard part #4).

Each test builds the torch computation from the documented semantics
(zero-stuffed upsample + FIR + downsample; per-sample grouped modulated
conv; transpose-conv upsampling) and checks our XLA formulation matches to
float tolerance.  Torch runs on CPU.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdface_gan_tpu.ops.fused_act import fused_leaky_relu  # noqa: E402
from sdface_gan_tpu.ops.upfirdn2d import upfirdn2d, make_kernel  # noqa: E402
from sdface_gan_tpu.models.stylegan2 import (  # noqa: E402
    ModConvConfig,
    apply_modulated_conv,
    init_modulated_conv,
)

RNG = np.random.default_rng(0)


def torch_upfirdn2d(x_nchw, kernel, up, down, pad):
    """Reference semantics (sdf_op.py:273-314): zero-stuff by (up-1) after
    each sample, pad, correlate with flipped kernel, stride-downsample."""
    x = torch.from_numpy(x_nchw)
    b, c, h, w = x.shape
    k = torch.from_numpy(kernel)
    out = x.reshape(b * c, 1, h, w)
    # zero-stuff
    out = out.view(-1, 1, h, 1, w, 1)
    out = F.pad(out, [0, up - 1, 0, 0, 0, up - 1])
    out = out.view(-1, 1, h * up, w * up)
    out = F.pad(out, [max(pad[0], 0), max(pad[1], 0), max(pad[0], 0), max(pad[1], 0)])
    kh, kw = k.shape
    w_t = torch.flip(k, [0, 1]).view(1, 1, kh, kw)
    out = F.conv2d(out, w_t)
    out = out[:, :, ::down, ::down]
    hh = (h * up + pad[0] + pad[1] - kh) // down + 1
    ww = (w * up + pad[0] + pad[1] - kw) // down + 1
    return out.view(b, c, hh, ww).numpy()


@pytest.mark.parametrize("up,down,pad", [(1, 1, (2, 1)), (2, 1, (2, 1)), (1, 2, (2, 1)),
                                         (2, 2, (3, 3)), (1, 1, (0, 0))])
def test_upfirdn2d_matches_torch(up, down, pad):
    x = RNG.standard_normal((2, 3, 8, 8)).astype(np.float32)
    k = np.asarray(make_kernel(jnp.array([1.0, 3.0, 3.0, 1.0])))
    ref = torch_upfirdn2d(x, k, up, down, pad)
    ours = upfirdn2d(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(k),
                     up=up, down=down, pad=pad)
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-5
    )


def test_fused_leaky_relu_matches_torch():
    x = RNG.standard_normal((2, 5, 4, 4)).astype(np.float32)  # NCHW
    b = RNG.standard_normal((5,)).astype(np.float32)
    ref = (
        F.leaky_relu(torch.from_numpy(x) + torch.from_numpy(b).view(1, -1, 1, 1), 0.2)
        * math.sqrt(2)
    ).numpy()
    ours = fused_leaky_relu(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(b))
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, rtol=1e-5, atol=1e-6
    )


def _torch_modulated_conv(x_nchw, w_oikk, mod_w, mod_b, style, demodulate, mode):
    """Reference ModulatedConv2d semantics (sdf_model.py:655-701) in torch."""
    x = torch.from_numpy(x_nchw)
    weight = torch.from_numpy(w_oikk).unsqueeze(0)  # [1, O, I, k, k]
    batch, in_ch, h, w_sp = x.shape
    out_ch = weight.shape[1]
    k = weight.shape[-1]
    scale = 1.0 / math.sqrt(in_ch * k * k)
    s = torch.from_numpy(style) @ torch.from_numpy(mod_w).t() + torch.from_numpy(mod_b)
    # EqualLinear modulation: scale by 1/sqrt(in_dim)*... handled by caller
    s = s.view(batch, 1, in_ch, 1, 1)
    wmod = scale * weight * s
    if demodulate:
        demod = torch.rsqrt(wmod.pow(2).sum([2, 3, 4]) + 1e-8)
        wmod = wmod * demod.view(batch, out_ch, 1, 1, 1)
    if mode == "up":
        x = x.reshape(1, batch * in_ch, h, w_sp)
        wmod = wmod.reshape(batch, out_ch, in_ch, k, k).transpose(1, 2).reshape(
            batch * in_ch, out_ch, k, k
        )
        out = F.conv_transpose2d(x, wmod, padding=0, stride=2, groups=batch)
        return out.view(batch, out_ch, out.shape[-2], out.shape[-1]).numpy()
    if mode == "down":
        x = x.reshape(1, batch * in_ch, h, w_sp)
        wmod = wmod.reshape(batch * out_ch, in_ch, k, k)
        out = F.conv2d(x, wmod, padding=0, stride=2, groups=batch)
        return out.view(batch, out_ch, out.shape[-2], out.shape[-1]).numpy()
    x = x.reshape(1, batch * in_ch, h, w_sp)
    wmod = wmod.reshape(batch * out_ch, in_ch, k, k)
    out = F.conv2d(x, wmod, padding=k // 2, groups=batch)
    return out.view(batch, out_ch, h, w_sp).numpy()


@pytest.mark.parametrize("mode,demod", [("plain", True), ("plain", False),
                                        ("up", True), ("down", True)])
def test_modulated_conv_matches_torch(mode, demod):
    in_ch, out_ch, k, style_dim, batch = 6, 10, 3, 12, 2
    cfg = ModConvConfig(
        in_ch, out_ch, k, style_dim, demodulate=demod,
        upsample=(mode == "up"), downsample=(mode == "down"),
    )
    p = init_modulated_conv(jax.random.PRNGKey(0), cfg)
    x = RNG.standard_normal((batch, in_ch, 8, 8)).astype(np.float32)
    style = RNG.standard_normal((batch, style_dim)).astype(np.float32)

    # our EqualLinear modulation: s = style @ (w * lr/sqrt(in)) + b
    mod_w_ours = np.asarray(p["modulation"]["w"])  # [style_dim, in_ch]
    mod_scale = 1.0 / math.sqrt(style_dim)
    mod_w_torch = (mod_w_ours * mod_scale).T  # torch [out, in] layout
    mod_b = np.asarray(p["modulation"]["b"])
    w_oikk = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))  # HWIO -> OIKK

    ref = _torch_modulated_conv(x, w_oikk, mod_w_torch, mod_b, style, demod, mode)

    ours_full = apply_modulated_conv(
        p, cfg, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(style)
    )
    if mode == "up":
        # reference applies blur AFTER the transpose conv inside the module;
        # compare the pre-blur tensor by re-running without blur
        from sdface_gan_tpu.models.stylegan2 import _mod_demod
        from jax import lax

        s, scale, demod_f = _mod_demod(p, cfg, jnp.asarray(style))
        xs = jnp.asarray(np.transpose(x, (0, 2, 3, 1))) * s[:, None, None, :]
        out = lax.conv_general_dilated(
            xs, jnp.flip(jnp.asarray(p["w"]) * scale, (0, 1)), (1, 1),
            ((k - 1, k - 1), (k - 1, k - 1)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if demod_f is not None:
            out = out * demod_f[:, None, None, :]
        ours = out
    elif mode == "down":
        # reference blurs the input first; strip the blur for comparison by
        # comparing our conv-on-blurred against torch conv on same blurred x
        from sdface_gan_tpu.ops.upfirdn2d import blur as fir_blur

        pb = (len(cfg.blur_kernel) - 2) + (k - 1)
        xb = fir_blur(
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
            jnp.asarray(cfg.blur_kernel, jnp.float32),
            ((pb + 1) // 2, pb // 2),
        )
        ref = _torch_modulated_conv(
            np.transpose(np.asarray(xb), (0, 3, 1, 2)), w_oikk, mod_w_torch,
            mod_b, style, demod, mode,
        )
        ours = ours_full
    else:
        ours = ours_full
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, rtol=2e-3, atol=2e-4
    )
