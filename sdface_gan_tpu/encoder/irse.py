"""ir_se-50 backbone + pSp GradualStyleEncoder.

JAX rebuild of ``im2scene/encoder/model_irse.py`` / ``helpers.py`` (the
ArcFace face-recognition backbone: SE-augmented IR bottlenecks) and
``psp_encoders.py:37-122`` (the FPN-style pSp encoder producing 6 style
vectors).  Batch norms carry importable running stats (these nets run
frozen / fine-tuned from pretrained torch weights; ``import_irse_state``
maps a ``model_ir_se50.pth`` state dict onto the tree).  NHWC.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..models.discriminator import _conv, _torch_conv
from ..models.init import uniform

Params = Dict[str, Any]

# ir-50 block plan: (in, depth, num_units) per stage (reference
# ``helpers.py get_blocks(50)``).
IR50_BLOCKS = [(64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3)]


@dataclass(frozen=True)
class IRSEConfig:
    input_size: int = 112      # ArcFace identity-embedding input
    psp_input_size: int = 256  # pSp GradualStyleEncoder input (FPN taps)
    se_reduct: int = 16
    style_count: int = 6
    coarse_ind: int = 1
    middle_ind: int = 3


def _bn(ch: int) -> Params:
    return {
        "scale": jnp.ones((ch,)),
        "bias": jnp.zeros((ch,)),
        "mean": jnp.zeros((ch,)),
        "var": jnp.ones((ch,)),
    }


def _apply_bn(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return (x - p["mean"]) * lax.rsqrt(p["var"] + 1e-5) * p["scale"] + p["bias"]


def _prelu(ch: int) -> Params:
    return {"alpha": jnp.full((ch,), 0.25)}


def _apply_prelu(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, p["alpha"] * x)


def _init_bottleneck(key, in_ch: int, depth: int, stride: int, reduct: int) -> Params:
    # NOTE: stride is NOT stored in the tree (an int leaf would poison
    # jax.grad over encoder params); apply passes it explicitly from the
    # static IR50 block plan (_ir50_strides).
    del stride
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    p: Params = {
        "res_bn1": _bn(in_ch),
        "conv1": _torch_conv(k1, in_ch, depth, 3, bias=False),
        "prelu": _prelu(depth),
        "conv2": _torch_conv(k2, depth, depth, 3, bias=False),
        "res_bn2": _bn(depth),
        "se_fc1": _torch_conv(k3, depth, depth // reduct, 1, bias=False),
        "se_fc2": _torch_conv(k4, depth // reduct, depth, 1, bias=False),
    }
    if in_ch != depth:
        p["shortcut_conv"] = _torch_conv(k5, in_ch, depth, 1, bias=False)
        p["shortcut_bn"] = _bn(depth)
    return p


def _ir50_strides() -> List[int]:
    """Per-block strides of the ir-50 body: 2 on each stage head, else 1."""
    out: List[int] = []
    for _, _, num in IR50_BLOCKS:
        out.extend([2] + [1] * (num - 1))
    return out


def _apply_bottleneck(p: Params, x: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    if "shortcut_conv" in p:
        shortcut = _apply_bn(p["shortcut_bn"], _conv(p["shortcut_conv"], x, stride=stride))
    else:
        shortcut = x[:, ::stride, ::stride, :] if stride > 1 else x  # MaxPool(1, s)
    res = _apply_bn(p["res_bn1"], x)
    res = _conv(p["conv1"], res, padding=1)
    res = _apply_prelu(p["prelu"], res)
    res = _conv(p["conv2"], res, stride=stride, padding=1)
    res = _apply_bn(p["res_bn2"], res)
    # squeeze-excite
    se = jnp.mean(res, axis=(1, 2), keepdims=True)
    se = jax.nn.relu(_conv(p["se_fc1"], se))
    se = jax.nn.sigmoid(_conv(p["se_fc2"], se))
    res = res * se
    return res + shortcut


def init_irse_backbone(key: jax.Array, cfg: IRSEConfig = IRSEConfig()) -> Params:
    keys = iter(jax.random.split(key, 64))
    body = []
    for in_ch, depth, num in IR50_BLOCKS:
        body.append(_init_bottleneck(next(keys), in_ch, depth, 2, cfg.se_reduct))
        for _ in range(num - 1):
            body.append(_init_bottleneck(next(keys), depth, depth, 1, cfg.se_reduct))
    k_fc = next(keys)
    kw, kb = jax.random.split(k_fc)
    fc_in = 512 * 7 * 7
    bound = 1.0 / math.sqrt(fc_in)
    return {
        "input_conv": _torch_conv(next(keys), 3, 64, 3, bias=False),
        "input_bn": _bn(64),
        "input_prelu": _prelu(64),
        "body": body,
        "out_bn": _bn(512),
        "out_fc": {"w": uniform(kw, (fc_in, 512), bound), "b": uniform(kb, (512,), bound)},
        "out_bn1d": _bn(512),
    }


def apply_irse_backbone(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Face-identity embedding [B, 512] from 112^2 crops in [-1, 1]
    (reference ``model_irse.py:10-84``)."""
    h = _conv(p["input_conv"], x, padding=1)
    h = _apply_prelu(p["input_prelu"], _apply_bn(p["input_bn"], h))
    for block, stride in zip(p["body"], _ir50_strides()):
        h = _apply_bottleneck(block, h, stride)
    h = _apply_bn(p["out_bn"], h)
    # NHWC -> torch NCHW flatten order for weight-import parity
    flat = h.transpose(0, 3, 1, 2).reshape(h.shape[0], -1)
    emb = flat @ p["out_fc"]["w"] + p["out_fc"]["b"]
    # final BatchNorm1d (affine) on the embedding
    bn = p["out_bn1d"]
    return (emb - bn["mean"]) * lax.rsqrt(bn["var"] + 1e-5) * bn["scale"] + bn["bias"]


# ---------------------------------------------------------------------------
# pSp GradualStyleEncoder
# ---------------------------------------------------------------------------

def _init_style_block(key, in_c: int, out_c: int, spatial: int) -> Params:
    n_pools = int(np.log2(spatial))
    keys = jax.random.split(key, n_pools + 1)
    kw, kb = jax.random.split(keys[-1])
    bound = 1.0 / math.sqrt(out_c)
    return {
        "convs": [
            _torch_conv(k, in_c if i == 0 else out_c, out_c, 3)
            for i, k in enumerate(keys[:-1])
        ],
        "linear": {"w": uniform(kw, (out_c, out_c), bound), "b": uniform(kb, (out_c,), bound)},
    }


def _apply_style_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    for conv in p["convs"]:
        x = jax.nn.leaky_relu(_conv(conv, x, stride=2, padding=1), 0.2)
    flat = x.reshape(x.shape[0], -1)
    return flat @ p["linear"]["w"] + p["linear"]["b"]


def init_gradual_style_encoder(key: jax.Array, cfg: IRSEConfig = IRSEConfig()) -> Params:
    kb, ks, kl1, kl2 = jax.random.split(key, 4)
    backbone = init_irse_backbone(kb, cfg)
    style_keys = jax.random.split(ks, cfg.style_count)
    styles = []
    # FPN tap resolutions scale with the input (reference hardcodes
    # 16/32/64 for 256^2 inputs, ``psp_encoders.py:62-70``; deriving them
    # as input/16, /8, /4 keeps 256^2 identical and makes other sizes work)
    for i in range(cfg.style_count):
        if i < cfg.coarse_ind:
            spatial = cfg.psp_input_size // 16
        elif i < cfg.middle_ind:
            spatial = cfg.psp_input_size // 8
        else:
            spatial = cfg.psp_input_size // 4
        styles.append(_init_style_block(style_keys[i], 512, 512, spatial))
    return {
        "backbone": backbone,
        "styles": styles,
        "latlayer1": _torch_conv(kl1, 256, 512, 1),
        "latlayer2": _torch_conv(kl2, 128, 512, 1),
    }


def _upsample_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="bilinear")


def apply_gradual_style_encoder(
    p: Params, x: jnp.ndarray, cfg: IRSEConfig = IRSEConfig()
) -> jnp.ndarray:
    """x [B, 256, 256, 3] -> style stack [B, style_count, 512] (reference
    ``psp_encoders.py:97-122``: FPN taps after body blocks 6 / 20 / 23)."""
    bb = p["backbone"]
    h = _conv(bb["input_conv"], x, padding=1)
    h = _apply_prelu(bb["input_prelu"], _apply_bn(bb["input_bn"], h))
    c1 = c2 = c3 = None
    strides = _ir50_strides()
    for i, block in enumerate(bb["body"]):
        h = _apply_bottleneck(block, h, strides[i])
        if i == 6:
            c1 = h
        elif i == 20:
            c2 = h
        elif i == 23:
            c3 = h

    latents: List[jnp.ndarray] = []
    for j in range(cfg.coarse_ind):
        latents.append(_apply_style_block(p["styles"][j], c3))
    p2 = _upsample_to(c3, c2.shape[1], c2.shape[2]) + _conv(p["latlayer1"], c2)
    for j in range(cfg.coarse_ind, cfg.middle_ind):
        latents.append(_apply_style_block(p["styles"][j], p2))
    p1 = _upsample_to(p2, c1.shape[1], c1.shape[2]) + _conv(p["latlayer2"], c1)
    for j in range(cfg.middle_ind, cfg.style_count):
        latents.append(_apply_style_block(p["styles"][j], p1))
    return jnp.stack(latents, axis=1)


def import_irse_state(
    state: Dict[str, np.ndarray], params: Params, partial: bool = False
) -> Params:
    """Map a torch ``model_ir_se50.pth`` state dict onto the backbone tree
    (OIHW -> HWIO convs; BN running stats included).

    ``partial=True`` permits a subtree-only state dict (used by the golden
    tests, which exercise one bottleneck block); without it a state dict
    missing the input layer is an error — silently skipping it would leave
    randomly initialized input weights in a "successfully" imported model.
    """
    if not partial and "input_layer.0.weight" not in state:
        raise KeyError(
            "input_layer.0.weight missing from ir_se state dict; pass "
            "partial=True only for deliberate subtree imports"
        )
    out = jax.tree_util.tree_map(lambda x: x, params)

    def conv_w(name):
        return jnp.asarray(np.transpose(np.asarray(state[name]), (2, 3, 1, 0)))

    def set_bn(dst, prefix):
        dst["scale"] = jnp.asarray(state[f"{prefix}.weight"])
        dst["bias"] = jnp.asarray(state[f"{prefix}.bias"])
        dst["mean"] = jnp.asarray(state[f"{prefix}.running_mean"])
        dst["var"] = jnp.asarray(state[f"{prefix}.running_var"])

    if "input_layer.0.weight" in state:
        out["input_conv"]["w"] = conv_w("input_layer.0.weight")
        set_bn(out["input_bn"], "input_layer.1")
        out["input_prelu"]["alpha"] = jnp.asarray(state["input_layer.2.weight"])
    for i, block in enumerate(out["body"]):
        pre = f"body.{i}"
        set_bn(block["res_bn1"], f"{pre}.res_layer.0")
        block["conv1"]["w"] = conv_w(f"{pre}.res_layer.1.weight")
        block["prelu"]["alpha"] = jnp.asarray(state[f"{pre}.res_layer.2.weight"])
        block["conv2"]["w"] = conv_w(f"{pre}.res_layer.3.weight")
        set_bn(block["res_bn2"], f"{pre}.res_layer.4")
        block["se_fc1"]["w"] = conv_w(f"{pre}.res_layer.5.fc1.weight")
        block["se_fc2"]["w"] = conv_w(f"{pre}.res_layer.5.fc2.weight")
        if "shortcut_conv" in block:
            block["shortcut_conv"]["w"] = conv_w(f"{pre}.shortcut_layer.0.weight")
            set_bn(block["shortcut_bn"], f"{pre}.shortcut_layer.1")
    if "output_layer.0.weight" in state:
        set_bn(out["out_bn"], "output_layer.0")
        out["out_fc"]["w"] = jnp.asarray(np.asarray(state["output_layer.3.weight"]).T)
        out["out_fc"]["b"] = jnp.asarray(state["output_layer.3.bias"])
        set_bn(out["out_bn1d"], "output_layer.4")
    return out
