"""Full-chain golden tests vs PyTorch: z + camera -> rendered image.

The per-module golden tests (``test_torch_golden.py``, ``test_torch_parity``)
pin each block in isolation; these tests pin the ASSEMBLY — ray generation,
depth sampling, field evaluation, SDF compositing, the style/latent plumbing
and the StyleGAN2 skip pyramid — by running the reference semantics
(``im2scene/sdf/models/sdf_model.py``: ``VolumeFeatureRenderer.render``
:143-423, ``SirenGenerator`` :101-139, ``Generator.forward`` :1059-1216,
``Decoder.forward`` :883-1056) as a functional torch program over the SAME
weight arrays our importer consumes, and asserting the outputs agree.

This closes the last untested link in the BASELINE "rendered images from
ported weights match the reference" contract at the whole-model level.
Torch runs on CPU in f32; tolerances absorb op-ordering differences only.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdface_gan_tpu.geometry import generate_camera_params  # noqa: E402
from sdface_gan_tpu.models.generator import (  # noqa: E402
    GeneratorConfig,
    generator_forward,
)
from sdface_gan_tpu.models.renderer import RendererConfig  # noqa: E402
from sdface_gan_tpu.utils.torch_import import import_generator_state  # noqa: E402

from test_torch_import import _build_reference_state  # noqa: E402
from test_torch_parity import torch_upfirdn2d  # noqa: E402

# Small but fully-featured shapes: 2 SIREN layers, one decoder block.
DEPTH, WIDTH, STYLE, SIZE, RES, SAMPLES = 2, 32, 16, 32, 16, 6


def _t(state, name):
    return torch.from_numpy(np.asarray(state[name], np.float32))


# ---------------------------------------------------------------------------
# Torch oracle: SIREN field (sdf_model.py:23-139)
# ---------------------------------------------------------------------------

def _lin(x, state, pfx, std=1.0, bias_init=0.0):
    return std * F.linear(x, _t(state, f"{pfx}.weight"), _t(state, f"{pfx}.bias")) + bias_init


def _film(x, style, state, pfx):
    out = F.linear(x, _t(state, f"{pfx}.weight"), _t(state, f"{pfx}.bias"))
    gamma = _lin(style, state, f"{pfx}.gamma", std=15.0, bias_init=30.0)
    beta = _lin(style, state, f"{pfx}.beta", std=0.25)
    shape = (style.shape[0],) + (1,) * (out.ndim - 2) + (-1,)
    return torch.sin(gamma.view(shape) * out + beta.view(shape))


def _siren(x, style, state, net="renderer.network"):
    pts, views = torch.split(x, [3, 3], dim=-1)
    h = pts
    for i in range(DEPTH):
        h = _film(h, style, state, f"{net}.pts_linears.{i}")
    sdf = _lin(h, state, f"{net}.sigma_linear")
    feat = _film(torch.cat([h, views], -1), style, state, f"{net}.views_linears")
    rgb = _lin(feat, state, f"{net}.rgb_linear")
    return torch.cat([rgb, sdf, feat], -1)


# ---------------------------------------------------------------------------
# Torch oracle: volume renderer (sdf_model.py:143-423), test mode (perturb 0)
# ---------------------------------------------------------------------------

def _render(state, c2w, focal, near, far, style):
    res, S = RES, SAMPLES
    lin = torch.linspace(0.5, res - 0.5, res)
    ii = lin.view(1, 1, res).expand(1, res, res)  # varies along W
    jj = lin.view(1, res, 1).expand(1, res, res)  # varies along H
    dirs = torch.stack(
        [
            (ii - res * 0.5) / focal,
            -(jj - res * 0.5) / focal,
            -torch.ones(1, res, res).expand(focal.shape[0], res, res),
        ],
        -1,
    )
    rays_d = torch.sum(dirs[..., None, :] * c2w[:, None, None, :3, :3], -1)
    rays_o = c2w[:, None, None, :3, -1].expand(rays_d.shape)
    viewdirs = rays_d / rays_d.norm(dim=-1, keepdim=True)

    near_ = near.unsqueeze(-1) * torch.ones_like(rays_d[..., :1])  # [B,H,W,1]
    far_ = far.unsqueeze(-1) * torch.ones_like(rays_d[..., :1])
    t_vals = torch.linspace(0.0, 1.0 - 1.0 / S, S).view(1, 1, 1, S)
    z_vals = near_ * (1.0 - t_vals) + far_ * t_vals  # [B,H,W,S]

    pts = rays_o.unsqueeze(3) + rays_d.unsqueeze(3) * z_vals.unsqueeze(-1)
    npts = pts * 2.0 / (far_ - near_).unsqueeze(3)
    in_views = viewdirs.unsqueeze(3).expand(npts.shape)
    raw = _siren(torch.cat([npts, in_views], -1), style, state)
    rgb, sdf, features = torch.split(raw, [3, 1, WIDTH], dim=-1)

    dists = z_vals[..., 1:] - z_vals[..., :-1]
    rays_d_norm = rays_d.unsqueeze(3).norm(dim=-1)  # [B,H,W,1]
    dists = torch.cat([dists, torch.tensor([1e10]).expand(rays_d_norm.shape)], -1)
    dists = dists * rays_d_norm

    beta = _t(state, "renderer.sigmoid_beta")
    sigma = torch.sigmoid(-sdf / beta) / beta
    sigma = 1.0 - torch.exp(-sigma * dists.unsqueeze(-1))
    visibility = torch.cumprod(
        torch.cat([torch.ones_like(sigma[:, :, :, 0:1, :]), 1.0 - sigma + 1e-10], 3), 3
    )[..., :-1, :]
    weights = sigma * visibility
    weights[..., -1, :] = 1.0 - weights[..., :-1, :].sum(3)  # force_background

    rgb_map = -1.0 + 2.0 * torch.sum(weights * torch.sigmoid(rgb), 3)
    feature_map = torch.sum(weights * features, 3)
    xyz = torch.sum(weights * pts, 3)
    mask = weights[..., -1, :]
    return rgb_map, feature_map, sdf, xyz, mask


def _mapping(z, state):
    h = z
    for i in range(3):
        h = F.leaky_relu(F.linear(h, _t(state, f"style.{i}.weight")) + _t(state, f"style.{i}.bias"), 0.2)
    return h


# ---------------------------------------------------------------------------
# Torch oracle: StyleGAN2 decoder (sdf_model.py:429-1056)
# ---------------------------------------------------------------------------

def _make_kernel(k=(1.0, 3.0, 3.0, 1.0)):
    k = np.asarray(k, np.float32)
    k = np.outer(k, k)
    return k / k.sum()


def _equal_linear(x, state, pfx, lr_mul):
    w = _t(state, f"{pfx}.weight")
    b = _t(state, f"{pfx}.bias")
    out = F.linear(x, w * ((1.0 / math.sqrt(w.shape[1])) * lr_mul))
    return F.leaky_relu(out + b * lr_mul, 0.2) * math.sqrt(2.0)


def _decoder_map(x, state, lr_mul=0.01):
    h = x * torch.rsqrt(torch.mean(x**2, dim=1, keepdim=True) + 1e-8)  # PixelNorm
    for i in range(1, 6):
        h = _equal_linear(h, state, f"decoder.style.{i}", lr_mul)
    return h


def _modconv(x, style, state, pfx, demodulate, upsample):
    weight = _t(state, f"{pfx}.weight")  # [1, O, I, k, k]
    mw = _t(state, f"{pfx}.modulation.weight")
    mb = _t(state, f"{pfx}.modulation.bias")
    batch, in_ch, h, w_sp = x.shape
    out_ch, k = weight.shape[1], weight.shape[-1]
    s = F.linear(style, mw * (1.0 / math.sqrt(mw.shape[1])), mb)  # EqualLinear lr_mul=1
    wmod = (1.0 / math.sqrt(in_ch * k * k)) * weight * s.view(batch, 1, in_ch, 1, 1)
    if demodulate:
        demod = torch.rsqrt(wmod.pow(2).sum([2, 3, 4]) + 1e-8)
        wmod = wmod * demod.view(batch, out_ch, 1, 1, 1)
    if upsample:
        x = x.reshape(1, batch * in_ch, h, w_sp)
        wmod = wmod.view(batch, out_ch, in_ch, k, k).transpose(1, 2).reshape(
            batch * in_ch, out_ch, k, k
        )
        out = F.conv_transpose2d(x, wmod, padding=0, stride=2, groups=batch)
        out = out.view(batch, out_ch, out.shape[-2], out.shape[-1])
        p = (4 - 2) - (k - 1)
        return torch.from_numpy(
            torch_upfirdn2d(
                out.numpy(), _make_kernel() * 4.0, 1, 1,
                ((p + 1) // 2 + 1, p // 2 + 1),
            )
        )
    x = x.reshape(1, batch * in_ch, h, w_sp)
    wmod = wmod.reshape(batch * out_ch, in_ch, k, k)
    out = F.conv2d(x, wmod, padding=k // 2, groups=batch)
    return out.view(batch, out_ch, h, w_sp)


def _styled_conv(x, style, noise, state, pfx, upsample=False):
    out = _modconv(x, style, state, f"{pfx}.conv", True, upsample)
    out = out + _t(state, f"{pfx}.noise.weight") * noise
    bias = _t(state, f"{pfx}.activate.bias")
    return F.leaky_relu(out + bias.view(1, -1, 1, 1), 0.2) * math.sqrt(2.0)


def _to_rgb(x, style, skip, state, pfx):
    out = _modconv(x, style, state, f"{pfx}.conv", False, False)
    out = out + _t(state, f"{pfx}.bias")
    if skip is not None:
        skip = torch.from_numpy(
            torch_upfirdn2d(skip.numpy(), _make_kernel() * 4.0, 2, 1, (2, 1))
        )
        out = out + skip
    return out


def _decoder(features, latent, state):
    """features NCHW, latent [B, n_latent, D], noise from stored buffers
    (reference randomize_noise=False path, sdf_model.py:989-993)."""
    noises = [_t(state, f"decoder.noises.noise_{i}") for i in range(3)]
    out = _styled_conv(features, latent[:, 0], noises[0], state, "decoder.conv1")
    skip = _to_rgb(out, latent[:, 1], None, state, "decoder.to_rgb1")
    out = _styled_conv(out, latent[:, 1], noises[1], state, "decoder.convs.0", upsample=True)
    out = _styled_conv(out, latent[:, 2], noises[2], state, "decoder.convs.1")
    return _to_rgb(out, latent[:, 3], skip, state, "decoder.to_rgbs.0")


# ---------------------------------------------------------------------------
# The tests
# ---------------------------------------------------------------------------

def _setup():
    state = _build_reference_state(
        depth=DEPTH, width=WIDTH, style=STYLE, size=SIZE, in_res=RES
    )
    params = import_generator_state(state, renderer_type="sdf", depth=DEPTH)
    cfg = GeneratorConfig(
        size=SIZE, style_dim=STYLE, full_pipeline=True, channel_multiplier=1,
        renderer=RendererConfig(
            type="sdf", out_im_res=RES, n_samples=SAMPLES, style_dim=STYLE,
            width=WIDTH, depth=DEPTH,
        ),
    )
    cams = generate_camera_params(RES, jax.random.PRNGKey(7), batch=2)
    z = np.random.default_rng(3).standard_normal((2, STYLE)).astype(np.float32)
    return state, params, cfg, cams, z


def test_renderer_chain_golden():
    """z + camera -> thumb/features/sdf/xyz/mask matches the reference
    renderer semantics end to end (rays, sampling, field, compositing)."""
    state, params, cfg, cams, z = _setup()

    out = generator_forward(
        params, cfg, [jnp.asarray(z)], cams.extrinsics, cams.focal,
        cams.near, cams.far, key=None, randomize_noise=False,
        return_sdf=True, return_xyz=True,
    )

    style = _mapping(torch.from_numpy(z), state)
    rgb_t, feat_t, sdf_t, xyz_t, mask_t = _render(
        state,
        torch.from_numpy(np.asarray(cams.extrinsics, np.float32)),
        torch.from_numpy(np.asarray(cams.focal, np.float32)),
        torch.from_numpy(np.asarray(cams.near, np.float32)),
        torch.from_numpy(np.asarray(cams.far, np.float32)),
        style,
    )

    np.testing.assert_allclose(np.asarray(out.thumb_rgb), rgb_t.numpy(), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.sdf), sdf_t.numpy(), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.xyz), xyz_t.numpy(), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.mask), mask_t.numpy(), rtol=1e-4, atol=2e-5)


def test_full_generator_golden():
    """The complete pipeline — mapping, renderer, decoder latent plumbing,
    StyledConv/ToRGB pyramid with stored noise buffers — matches torch."""
    state, params, cfg, cams, z = _setup()

    out = generator_forward(
        params, cfg, [jnp.asarray(z)], cams.extrinsics, cams.focal,
        cams.near, cams.far, key=None, randomize_noise=False,
    )
    assert out.rgb.shape == (2, SIZE, SIZE, 3)

    style = _mapping(torch.from_numpy(z), state)
    _, feat_t, _, _, _ = _render(
        state,
        torch.from_numpy(np.asarray(cams.extrinsics, np.float32)),
        torch.from_numpy(np.asarray(cams.focal, np.float32)),
        torch.from_numpy(np.asarray(cams.near, np.float32)),
        torch.from_numpy(np.asarray(cams.far, np.float32)),
        style,
    )
    w = _decoder_map(style, state)
    latent = w.unsqueeze(1).repeat(1, 4, 1)  # n_latent = 4 at these shapes
    img_t = _decoder(feat_t.permute(0, 3, 1, 2).contiguous(), latent, state)

    np.testing.assert_allclose(
        np.transpose(np.asarray(out.rgb), (0, 3, 1, 2)), img_t.numpy(),
        rtol=2e-3, atol=2e-4,
    )


def test_fc_renderer_chain_golden():
    """The --fc ablation path (reference ``FCGenerator``,
    ``sdf_model.py:1599-1670``): NeRF positional encoding, additive style
    injection, ReLU chain, no activation on the views layer — through the
    full renderer chain."""
    RNG = np.random.default_rng(21)
    depth = 3
    state = {}
    for i in range(3):
        l = {"weight": RNG.standard_normal((STYLE, STYLE)).astype(np.float32) * 0.02,
             "bias": RNG.standard_normal((STYLE,)).astype(np.float32) * 0.01}
        state[f"style.{i}.weight"] = l["weight"]
        state[f"style.{i}.bias"] = l["bias"]
    state["renderer.sigmoid_beta"] = np.array([0.1], np.float32)
    net = "renderer.network"

    def _add_lin(name, out_d, in_d, scale=0.1):
        state[f"{name}.weight"] = RNG.standard_normal((out_d, in_d)).astype(np.float32) * scale
        state[f"{name}.bias"] = RNG.standard_normal((out_d,)).astype(np.float32) * 0.05

    _add_lin(f"{net}.x_in", WIDTH, 60)
    _add_lin(f"{net}.style_in", WIDTH, STYLE)
    for i in range(depth - 1):
        _add_lin(f"{net}.pts_linears.{i}", WIDTH, WIDTH)
    _add_lin(f"{net}.views_linears", WIDTH, 24 + WIDTH)
    _add_lin(f"{net}.rgb_linear", 3, WIDTH)
    _add_lin(f"{net}.sigma_linear", 1, WIDTH)

    params = import_generator_state(
        state, renderer_type="fc", full_pipeline=False, depth=depth
    )
    cfg = GeneratorConfig(
        size=RES, style_dim=STYLE, full_pipeline=False,
        renderer=RendererConfig(
            type="fc", out_im_res=RES, n_samples=SAMPLES, style_dim=STYLE,
            width=WIDTH, depth=depth,
        ),
    )
    cams = generate_camera_params(RES, jax.random.PRNGKey(7), batch=2)
    z = np.random.default_rng(5).standard_normal((2, STYLE)).astype(np.float32)
    out = generator_forward(
        params, cfg, [jnp.asarray(z)], cams.extrinsics, cams.focal,
        cams.near, cams.far, key=None, return_sdf=True,
    )

    def _pe(p, L):
        p = p / 2.0
        return torch.cat(
            [torch.cat([torch.sin((2**i) * math.pi * p),
                        torch.cos((2**i) * math.pi * p)], -1) for i in range(L)],
            -1,
        )

    def _fc(x, style):
        pts, views = torch.split(x, [3, 3], dim=-1)
        h = _lin(_pe(pts, 10), state, f"{net}.x_in")
        s = _lin(style, state, f"{net}.style_in")
        h = F.relu(h + s.view(2, 1, 1, 1, -1))
        for i in range(depth - 1):
            h = F.relu(_lin(h, state, f"{net}.pts_linears.{i}"))
        sdf = _lin(h, state, f"{net}.sigma_linear")
        feat = _lin(torch.cat([h, _pe(views, 4)], -1), state, f"{net}.views_linears")
        rgb = _lin(feat, state, f"{net}.rgb_linear")
        return torch.cat([rgb, sdf, feat], -1)

    style = _mapping(torch.from_numpy(z), state)
    # re-run the renderer oracle with the FC field
    res, S = RES, SAMPLES
    c2w = torch.from_numpy(np.asarray(cams.extrinsics, np.float32))
    focal = torch.from_numpy(np.asarray(cams.focal, np.float32))
    near = torch.from_numpy(np.asarray(cams.near, np.float32))
    far = torch.from_numpy(np.asarray(cams.far, np.float32))
    lin = torch.linspace(0.5, res - 0.5, res)
    ii = lin.view(1, 1, res).expand(1, res, res)
    jj = lin.view(1, res, 1).expand(1, res, res)
    dirs = torch.stack(
        [(ii - res * 0.5) / focal, -(jj - res * 0.5) / focal,
         -torch.ones(1, res, res).expand(focal.shape[0], res, res)], -1)
    rays_d = torch.sum(dirs[..., None, :] * c2w[:, None, None, :3, :3], -1)
    rays_o = c2w[:, None, None, :3, -1].expand(rays_d.shape)
    viewdirs = rays_d / rays_d.norm(dim=-1, keepdim=True)
    near_ = near.unsqueeze(-1) * torch.ones_like(rays_d[..., :1])
    far_ = far.unsqueeze(-1) * torch.ones_like(rays_d[..., :1])
    t_vals = torch.linspace(0.0, 1.0 - 1.0 / S, S).view(1, 1, 1, S)
    z_vals = near_ * (1.0 - t_vals) + far_ * t_vals
    pts = rays_o.unsqueeze(3) + rays_d.unsqueeze(3) * z_vals.unsqueeze(-1)
    npts = pts * 2.0 / (far_ - near_).unsqueeze(3)
    in_views = viewdirs.unsqueeze(3).expand(npts.shape)
    raw = _fc(torch.cat([npts, in_views], -1), style)
    rgb, sdf, _feat = torch.split(raw, [3, 1, WIDTH], dim=-1)
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    rays_d_norm = rays_d.unsqueeze(3).norm(dim=-1)
    dists = torch.cat([dists, torch.tensor([1e10]).expand(rays_d_norm.shape)], -1) * rays_d_norm
    beta = _t(state, "renderer.sigmoid_beta")
    sigma = torch.sigmoid(-sdf / beta) / beta
    sigma = 1.0 - torch.exp(-sigma * dists.unsqueeze(-1))
    visibility = torch.cumprod(
        torch.cat([torch.ones_like(sigma[:, :, :, 0:1, :]), 1.0 - sigma + 1e-10], 3), 3
    )[..., :-1, :]
    weights = sigma * visibility
    weights[..., -1, :] = 1.0 - weights[..., :-1, :].sum(3)
    rgb_t = -1.0 + 2.0 * torch.sum(weights * torch.sigmoid(rgb), 3)

    np.testing.assert_allclose(np.asarray(out.thumb_rgb), rgb_t.numpy(), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.sdf), sdf.numpy(), rtol=1e-4, atol=2e-5)


def test_truncation_golden():
    """Truncation interpolates toward the mean latent identically on both
    sides (reference styles_and_noise_forward, sdf_model.py:1139-1154 +
    Decoder truncation at :996-1003)."""
    state, params, cfg, cams, z = _setup()
    rng = np.random.default_rng(11)
    zs = rng.standard_normal((64, STYLE)).astype(np.float32)

    # torch truncation stats + truncated forward
    w_r = _mapping(torch.from_numpy(zs), state)
    mean_r = w_r.mean(0, keepdim=True)
    mean_d = _decoder_map(mean_r, state)  # decoder.mean_latent(renderer_latent)
    style = _mapping(torch.from_numpy(z), state)
    trunc_r = mean_r + 0.5 * (style - mean_r)
    rgb_t, feat_t, _, _, _ = _render(
        state,
        torch.from_numpy(np.asarray(cams.extrinsics, np.float32)),
        torch.from_numpy(np.asarray(cams.focal, np.float32)),
        torch.from_numpy(np.asarray(cams.near, np.float32)),
        torch.from_numpy(np.asarray(cams.far, np.float32)),
        trunc_r,
    )
    # decoder side truncates AGAIN: map the renderer-truncated style through
    # the 5-layer head, then pull toward truncation_latent[1]
    # (sdf_model.py:996-1003)
    w_d = _decoder_map(trunc_r, state)
    w_d = mean_d + 0.5 * (w_d - mean_d)
    latent = w_d.unsqueeze(1).repeat(1, 4, 1)
    img_t = _decoder(feat_t.permute(0, 3, 1, 2).contiguous(), latent, state)

    # ours: mean_latent from the same z pool, truncation 0.5
    from sdface_gan_tpu.models.generator import map_style
    from sdface_gan_tpu.models.stylegan2 import decoder_mean_latent

    r_lat = map_style(params, jnp.asarray(zs))
    mean_r_j = jnp.mean(r_lat, axis=0, keepdims=True)
    mean_d_j = decoder_mean_latent(params["decoder"], cfg.decoder, mean_r_j)
    np.testing.assert_allclose(np.asarray(mean_r_j), mean_r.numpy(), rtol=1e-4, atol=1e-5)
    # NOTE the reference's decoder truncation uses truncation_latent[1] =
    # decoder.mean_latent(renderer_latent MEAN) — mean-of-map vs our
    # map-of-mean must match the torch oracle exactly, so compute it the
    # same way (map the mean).
    out = generator_forward(
        params, cfg, [jnp.asarray(z)], cams.extrinsics, cams.focal,
        cams.near, cams.far, key=None, randomize_noise=False,
        truncation=0.5, truncation_latent=(mean_r_j, mean_d_j),
    )
    assert np.allclose(np.asarray(mean_d_j), mean_d.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.thumb_rgb), rgb_t.numpy(), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out.rgb), (0, 3, 1, 2)), img_t.numpy(),
        rtol=2e-3, atol=2e-4,
    )
