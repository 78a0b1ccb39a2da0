"""The full SDF generator: mapping MLP -> volume renderer -> StyleGAN2 decoder.

TPU-native rebuild of the reference ``Generator``
(``im2scene/sdf/models/sdf_model.py:1059-1216``):

* a 3-layer ``MappingLinear`` style head shared by renderer and decoder,
* the :mod:`renderer` volume feature renderer producing a 64x64 thumb RGB
  and 256-d feature map,
* optionally the :mod:`stylegan2` decoder upsampling features to the final
  resolution (``full_pipeline``).

Freezing the renderer in stage B is done with ``lax.stop_gradient`` on the
renderer outputs (the functional analog of the reference's
``torch.set_grad_enabled`` gate at ``sdf_model.py:1174``) plus an optax
mask that excludes renderer params from the optimizer.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .renderer import RendererConfig, RenderOutput, init_renderer, mlp_init_pass, render
from .stylegan2 import (
    DecoderConfig,
    apply_decoder,
    apply_mapping_linear,
    decoder_map_style,
    decoder_mean_latent,
    init_decoder,
    init_mapping_linear,
    make_decoder_latent,
)

Params = Dict[str, Any]


@dataclass(frozen=True)
class GeneratorConfig:
    size: int = 256
    style_dim: int = 256
    full_pipeline: bool = True
    freeze_renderer: bool = False
    channel_multiplier: int = 2
    channel_base: int = 512
    lr_mapping: float = 0.01
    renderer: RendererConfig = RendererConfig()

    @property
    def decoder(self) -> DecoderConfig:
        return DecoderConfig(
            size=self.size,
            style_dim=self.style_dim * 2,
            in_res=self.renderer.out_im_res,
            in_channels=self.renderer.width,
            channel_multiplier=self.channel_multiplier,
            channel_base=self.channel_base,
            lr_mapping=self.lr_mapping,
        )


class GeneratorOutput(NamedTuple):
    rgb: Optional[jnp.ndarray]  # [B, size, size, 3] (full pipeline only)
    thumb_rgb: jnp.ndarray  # [B, res, res, 3]
    xyz: Optional[jnp.ndarray]
    sdf: Optional[jnp.ndarray]
    eikonal_term: Optional[jnp.ndarray]
    mask: Optional[jnp.ndarray]
    latent: Optional[jnp.ndarray]  # decoder per-layer latent (path-reg)
    weights: Optional[jnp.ndarray] = None  # [B, res, res, S] compositing
    s_vals: Optional[jnp.ndarray] = None  # [B, res, res, S] samples in [0,1]


def init_generator(key: jax.Array, cfg: GeneratorConfig) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params: Params = {
        "mapping": [
            init_mapping_linear(k, cfg.style_dim, cfg.style_dim)
            for k in jax.random.split(k1, 3)
        ],
        "renderer": init_renderer(k2, cfg.renderer),
    }
    if cfg.full_pipeline:
        params["decoder"] = init_decoder(k3, cfg.decoder)
    return params


def pack_generator_for_inference(params: Params, cfg: GeneratorConfig) -> Params:
    """One-time load-time repack for NGP serving: add the corner-packed
    hash table (``ops/hash_encoder.py PackPlan``) to the renderer network
    when ``cfg.renderer.ngp_pack_mb`` > 0.  No-op for SIREN/FC or when the
    knob is off; never used in training (checkpoints don't carry the
    packed entry, and the loops never add it)."""
    if cfg.renderer.type != "ngp" or cfg.renderer.ngp_pack_mb <= 0:
        return params
    from .siren import pack_ngp_network_params

    renderer = dict(params["renderer"])
    renderer["network"] = pack_ngp_network_params(
        renderer["network"], cfg.renderer.network_config()
    )
    return dict(params, renderer=renderer)


def map_style(params: Params, z: jnp.ndarray) -> jnp.ndarray:
    """3-layer renderer mapping (reference ``sdf_model.py:1076-1097``)."""
    h = z
    for layer in params["mapping"]:
        h = apply_mapping_linear(layer, h)
    return h


def mean_latent(
    params: Params, cfg: GeneratorConfig, key: jax.Array, n_latent: int = 10000
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Truncation statistics (reference ``mean_latent``,
    ``sdf_model.py:1119-1137``): returns [renderer_mean, decoder_mean]."""
    z = jax.random.normal(key, (n_latent, cfg.style_dim))
    renderer_latent = map_style(params, z)
    renderer_mean = jnp.mean(renderer_latent, axis=0, keepdims=True)
    decoder_mean = None
    if cfg.full_pipeline:
        decoder_mean = decoder_mean_latent(params["decoder"], cfg.decoder, renderer_latent)
    return renderer_mean, decoder_mean


def _mapped_styles(
    params: Params,
    styles: Sequence[jnp.ndarray],
    truncation: float,
    truncation_latent: Optional[jnp.ndarray],
    input_is_latent: bool,
) -> List[jnp.ndarray]:
    """Map + truncate (reference ``styles_and_noise_forward``,
    ``sdf_model.py:1139-1154``)."""
    if not input_is_latent:
        styles = [map_style(params, s) for s in styles]
    if truncation < 1.0 and truncation_latent is not None:
        styles = [truncation_latent + truncation * (s - truncation_latent) for s in styles]
    return list(styles)


def generator_forward(
    params: Params,
    cfg: GeneratorConfig,
    styles: Sequence[jnp.ndarray],
    cam_extrinsics: jnp.ndarray,
    focal: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    key: Optional[jax.Array] = None,
    truncation: float = 1.0,
    truncation_latent: Optional[Tuple[jnp.ndarray, Optional[jnp.ndarray]]] = None,
    input_is_latent: bool = False,
    inject_index: Optional[int] = None,
    return_latents: bool = False,
    return_sdf: bool = False,
    return_xyz: bool = False,
    return_eikonal: bool = False,
    return_weights: bool = False,
    randomize_noise: bool = True,
    decoder_noise: Optional[List[Optional[jnp.ndarray]]] = None,
    renderer_latent: Optional[jnp.ndarray] = None,
) -> GeneratorOutput:
    """Full generator forward (reference ``Generator.forward``,
    ``sdf_model.py:1163-1216``).

    Args:
      styles: list of [B, style_dim] latents (2 => style mixing; the
        renderer always consumes the first).
      cam_extrinsics/focal/near/far: from ``generate_camera_params``.
      key: PRNG key for sampling jitter + decoder noise (None = eval mode).
      truncation_latent: (renderer_mean, decoder_mean) from ``mean_latent``.
    """
    rend_trunc = truncation_latent[0] if truncation_latent is not None else None
    latents = _mapped_styles(params, styles, truncation, rend_trunc, input_is_latent)

    rcfg = cfg.renderer
    if return_sdf or return_xyz:
        rcfg = replace(rcfg, return_sdf=return_sdf, return_xyz=return_xyz)
    if return_weights:
        rcfg = replace(rcfg, return_weights=True)
    rkey = dkey = None
    if key is not None:
        rkey, dkey = jax.random.split(key)

    # The reference slices ``latent[0][:, 0]`` for the renderer
    # (``sdf_model.py:1183-1185``) — dimensionally broken for its own pSp
    # W+ stack (512-d style into a 256-d renderer).  ``renderer_latent``
    # lets an inversion encoder supply a correctly-sized renderer style
    # (see encoder/psp.py) while W+ drives the decoder.
    if renderer_latent is not None:
        latent0 = renderer_latent
    else:
        latent0 = latents[0][:, 0] if (input_is_latent and latents[0].ndim == 3) else latents[0]
    out: RenderOutput = render(
        params["renderer"],
        rcfg,
        focal,
        cam_extrinsics,
        near,
        far,
        latent0,
        key=rkey,
        return_eikonal=return_eikonal,
    )
    if cfg.freeze_renderer:
        out = jax.tree_util.tree_map(lambda t: lax.stop_gradient(t) if t is not None else None, out)

    rgb = None
    dec_latent = None
    if cfg.full_pipeline:
        dcfg = cfg.decoder
        dec_trunc = truncation_latent[1] if truncation_latent is not None else None
        dec_latent = make_decoder_latent(
            params["decoder"],
            dcfg,
            latents,
            inject_index=inject_index,
            truncation=truncation,
            truncation_latent=dec_trunc,
            input_is_latent=input_is_latent,
        )
        rgb = apply_decoder(
            params["decoder"],
            dcfg,
            out.features,
            dec_latent,
            noise=decoder_noise,
            noise_key=dkey if randomize_noise else None,
        )

    return GeneratorOutput(
        rgb=rgb,
        thumb_rgb=out.rgb,
        xyz=out.xyz,
        sdf=out.sdf,
        eikonal_term=out.eikonal_term,
        mask=out.mask,
        latent=dec_latent if return_latents else None,
        weights=out.weights,
        s_vals=out.s_vals,
    )


def generator_init_forward(
    params: Params,
    cfg: GeneratorConfig,
    styles: Sequence[jnp.ndarray],
    cam_extrinsics: jnp.ndarray,
    focal: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    key: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sphere-init pass (reference ``init_forward``, ``sdf_model.py:1156-1161``)."""
    latents = _mapped_styles(params, styles, 1.0, None, False)
    return mlp_init_pass(
        params["renderer"], cfg.renderer, focal, cam_extrinsics, near, far, latents[0], key
    )
