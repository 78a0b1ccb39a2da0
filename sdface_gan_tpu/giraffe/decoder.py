"""GIRAFFE NeRF decoders.

JAX rebuild of ``im2scene/giraffe/models/decoder.py``:

* :class:`DecoderConfig` / ``apply_giraffe_decoder`` — the 8x128 NeRF MLP
  with additive latent-code injection, a skip connection at layer 4, and a
  view-dependent feature head.  Positional, Gaussian, or hash/SH encodings
  (the latter replace the reference's pure-PyTorch ``HashEmbedder`` /
  python ``SHEncoder``, ``hash_encoding.py:20-174`` — same prime-XOR hash
  via :mod:`sdface_gan_tpu.ops.hash_encoder`, minus the ``pdb.set_trace``
  landmine on out-of-bbox points, which here simply encode to zeros).
* ``SmallDecoderConfig`` — the NGP-style compact MLP used with
  ``--small_net`` (``decoder.py:286-465``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.siren import _torch_linear, apply_linear, positional_encoding
from ..ops.hash_encoder import HashGridSpec, hash_encode
from ..ops.sh_encoder import sh_encode, sh_output_dim

Params = Dict[str, Any]

# Hash-grid geometry for the --i_embed variants (reference
# ``giraffe/config.py:47-96``: finest_res 512, 16 levels, 2 features,
# log2 table 19; bbox hardcoded at ``config.py:64``).
GIRAFFE_HASH_BBOX = np.array(
    [[-1.5373, 1.5373], [-1.3903, 1.3903], [-1.0001, 1.0001]], dtype=np.float32
)


def giraffe_hash_spec(finest_res: int = 512, log2_hashmap_size: int = 19) -> HashGridSpec:
    return HashGridSpec.create(
        num_levels=16,
        level_dim=2,
        base_resolution=16,
        log2_hashmap_size=log2_hashmap_size,
        desired_resolution=finest_res,
    )


@dataclass(frozen=True)
class DecoderConfig:
    hidden_size: int = 128
    n_blocks: int = 8
    n_blocks_view: int = 1
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = True
    n_freq_posenc: int = 10
    n_freq_posenc_views: int = 4
    z_dim: int = 64
    rgb_out_dim: int = 128
    final_sigmoid_activation: bool = False
    downscale_p_by: float = 2.0
    positional_encoding: str = "normal"  # 'normal' | 'gauss' | 'hash'
    gauss_dim_pos: int = 10
    gauss_dim_view: int = 4
    gauss_std: float = 4.0
    hash_spec: Optional[HashGridSpec] = None
    sh_degree: int = 4
    hash_div: float = 15.0  # reference divides pts by 15 pre-hash

    @property
    def dim_embed(self) -> int:
        if self.positional_encoding == "gauss":
            return 3 * self.gauss_dim_pos * 2
        if self.positional_encoding == "hash":
            return (self.hash_spec or giraffe_hash_spec()).output_dim
        return 3 * self.n_freq_posenc * 2

    @property
    def dim_embed_view(self) -> int:
        if self.positional_encoding == "gauss":
            return 3 * self.gauss_dim_view * 2
        if self.positional_encoding == "hash":
            return sh_output_dim(self.sh_degree)
        return 3 * self.n_freq_posenc_views * 2

    @property
    def n_skips(self) -> int:
        return sum(1 for i in range(self.n_blocks - 1) if i in self.skips)


def init_giraffe_decoder(key: jax.Array, cfg: DecoderConfig) -> Params:
    h = cfg.hidden_size
    keys = iter(jax.random.split(key, cfg.n_blocks + 2 * cfg.n_skips + 16))
    p: Params = {
        "fc_in": _torch_linear(next(keys), cfg.dim_embed, h),
        "blocks": [_torch_linear(next(keys), h, h) for _ in range(cfg.n_blocks - 1)],
        "sigma_out": _torch_linear(next(keys), h, 1),
        "fc_z_view": _torch_linear(next(keys), cfg.z_dim, h),
        "feat_view": _torch_linear(next(keys), h, h),
        "fc_view": _torch_linear(next(keys), cfg.dim_embed_view, h),
        "feat_out": _torch_linear(next(keys), h, cfg.rgb_out_dim),
    }
    if cfg.z_dim > 0:
        p["fc_z"] = _torch_linear(next(keys), cfg.z_dim, h)
    if cfg.n_skips > 0:
        p["fc_z_skips"] = [
            _torch_linear(next(keys), cfg.z_dim, h) for _ in range(cfg.n_skips)
        ]
        p["fc_p_skips"] = [
            _torch_linear(next(keys), cfg.dim_embed, h) for _ in range(cfg.n_skips)
        ]
    if cfg.use_viewdirs and cfg.n_blocks_view > 1:
        p["blocks_view"] = [
            _torch_linear(next(keys), cfg.dim_embed_view + h, h)
            for _ in range(cfg.n_blocks_view - 1)
        ]
    if cfg.positional_encoding == "gauss":
        kp, kv = jax.random.split(next(keys))
        p["B_pos"] = cfg.gauss_std * jax.random.normal(kp, (cfg.gauss_dim_pos * 3, 3))
        p["B_view"] = cfg.gauss_std * jax.random.normal(kv, (cfg.gauss_dim_view * 3, 3))
    if cfg.positional_encoding == "hash":
        spec = cfg.hash_spec or giraffe_hash_spec()
        from ..ops.hash_encoder import init_hash_table

        p["hash_table"] = init_hash_table(next(keys), spec)
    return p


def _encode_points(p: Params, cfg: DecoderConfig, x: jnp.ndarray, views: bool) -> jnp.ndarray:
    if cfg.positional_encoding == "gauss":
        B = p["B_view"] if views else p["B_pos"]
        proj = (x / cfg.downscale_p_by) @ (math.pi * B.T)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
    if cfg.positional_encoding == "hash":
        if views:
            return sh_encode(x, degree=cfg.sh_degree)
        spec = cfg.hash_spec or giraffe_hash_spec()
        # reference hash path normalizes by /15 then encodes in [0,1]
        # (decoder.py:149-176); our encoder maps [-bound, bound] -> [0,1],
        # so bound=1 with the same scaled inputs.
        return hash_encode(x / cfg.hash_div, p["hash_table"], spec, bound=1.0)
    # classic NeRF positional encoding with the /downscale pre-scale
    n_freq = cfg.n_freq_posenc_views if views else cfg.n_freq_posenc
    scaled = x * (2.0 / cfg.downscale_p_by)  # siren helper divides by 2
    return positional_encoding(scaled, n_freq)


def apply_giraffe_decoder(
    p: Params,
    cfg: DecoderConfig,
    pts: jnp.ndarray,
    ray_d: Optional[jnp.ndarray],
    z_shape: Optional[jnp.ndarray],
    z_app: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the field: returns (feat [B, N, rgb_out_dim], sigma [B, N]).

    Reference forward: ``decoder.py:216-283``.
    """
    relu = jax.nn.relu
    enc = _encode_points(p, cfg, pts, views=False)
    net = apply_linear(p["fc_in"], enc)
    if cfg.z_dim > 0 and z_shape is not None:
        net = net + apply_linear(p["fc_z"], z_shape)[:, None, :]
    net = relu(net)
    skip_idx = 0
    for idx, layer in enumerate(p["blocks"]):
        net = relu(apply_linear(layer, net))
        if (idx + 1) in cfg.skips and idx < len(p["blocks"]) - 1:
            net = net + apply_linear(p["fc_z_skips"][skip_idx], z_shape)[:, None, :]
            net = net + apply_linear(p["fc_p_skips"][skip_idx], enc)
            skip_idx += 1
    sigma = apply_linear(p["sigma_out"], net)[..., 0]

    net = apply_linear(p["feat_view"], net)
    net = net + apply_linear(p["fc_z_view"], z_app)[:, None, :]
    if cfg.use_viewdirs and ray_d is not None:
        rd = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
        net = net + apply_linear(p["fc_view"], _encode_points(p, cfg, rd, views=True))
        net = relu(net)
        for layer in p.get("blocks_view", []):
            net = relu(apply_linear(layer, net))
    feat = apply_linear(p["feat_out"], net)
    if cfg.final_sigmoid_activation:
        feat = jax.nn.sigmoid(feat)
    return feat, sigma


# ---------------------------------------------------------------------------
# SmallDecoder: NGP-style compact MLP (--small_net, decoder.py:286-465)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SmallDecoderConfig:
    hidden_size: int = 64
    n_blocks: int = 3
    n_blocks_view: int = 4
    geo_feat_dim: int = 15
    z_dim: int = 64
    rgb_out_dim: int = 128
    final_sigmoid_activation: bool = False
    hash_spec: Optional[HashGridSpec] = None
    sh_degree: int = 4
    hash_div: float = 15.0

    @property
    def dim_embed(self) -> int:
        return (self.hash_spec or giraffe_hash_spec()).output_dim

    @property
    def dim_embed_view(self) -> int:
        return sh_output_dim(self.sh_degree)


def init_small_decoder(key: jax.Array, cfg: SmallDecoderConfig) -> Params:
    h = cfg.hidden_size
    keys = iter(jax.random.split(key, cfg.n_blocks + cfg.n_blocks_view + 8))
    from ..ops.hash_encoder import init_hash_table

    sigma_layers = []
    in_dim = cfg.dim_embed
    for i in range(cfg.n_blocks):
        out_dim = 1 + cfg.geo_feat_dim if i == cfg.n_blocks - 1 else h
        sigma_layers.append(_torch_linear(next(keys), in_dim, out_dim))
        in_dim = h
    color_layers = []
    in_dim = cfg.dim_embed_view + cfg.geo_feat_dim
    for i in range(cfg.n_blocks_view):
        out_dim = cfg.rgb_out_dim if i == cfg.n_blocks_view - 1 else h
        color_layers.append(_torch_linear(next(keys), in_dim, out_dim))
        in_dim = h
    return {
        "hash_table": init_hash_table(next(keys), cfg.hash_spec or giraffe_hash_spec()),
        "fc_z": _torch_linear(next(keys), cfg.z_dim, cfg.dim_embed),
        "fc_z_view": _torch_linear(next(keys), cfg.z_dim, cfg.dim_embed_view),
        "sigma_layers": sigma_layers,
        "color_layers": color_layers,
    }


def apply_small_decoder(
    p: Params,
    cfg: SmallDecoderConfig,
    pts: jnp.ndarray,
    ray_d: Optional[jnp.ndarray],
    z_shape: Optional[jnp.ndarray],
    z_app: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NGP-style sigma net + color net (reference ``decoder.py:380-465``)."""
    relu = jax.nn.relu
    spec = cfg.hash_spec or giraffe_hash_spec()
    enc = hash_encode(pts / cfg.hash_div, p["hash_table"], spec, bound=1.0)
    if z_shape is not None:
        enc = enc + apply_linear(p["fc_z"], z_shape)[:, None, :]
    h = enc
    for i, layer in enumerate(p["sigma_layers"]):
        h = apply_linear(layer, h)
        if i < len(p["sigma_layers"]) - 1:
            h = relu(h)
    sigma = h[..., 0]
    geo_feat = h[..., 1:]

    if ray_d is not None:
        rd = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
        denc = sh_encode(rd, degree=cfg.sh_degree)
    else:
        denc = jnp.zeros(pts.shape[:-1] + (cfg.dim_embed_view,))
    if z_app is not None:
        denc = denc + apply_linear(p["fc_z_view"], z_app)[:, None, :]
    c = jnp.concatenate([denc, geo_feat], axis=-1)
    for i, layer in enumerate(p["color_layers"]):
        c = apply_linear(layer, c)
        if i < len(p["color_layers"]) - 1:
            c = relu(c)
    if cfg.final_sigmoid_activation:
        c = jax.nn.sigmoid(c)
    return c, sigma
