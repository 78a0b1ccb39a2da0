"""GIRAFFE model assembly from the YAML config tree.

Rebuild of ``im2scene/giraffe/config.py:10-136``: translate the yaml
``model.*_kwargs`` blocks into the typed configs, including the hash-
encoding variants selected by ``--i_embed/--small_net``.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Any, Optional

from .bbox import BBoxConfig
from .decoder import DecoderConfig, SmallDecoderConfig, giraffe_hash_spec
from .discriminator import DCDiscConfig
from .generator import GiraffeConfig
from .neural_renderer import NeuralRendererConfig


def _tup(x, default):
    if x is None:
        return default
    return tuple(x)


def giraffe_config_from_yaml(cfg: Any, args: Optional[Any] = None) -> GiraffeConfig:
    model = cfg.get("model", {})
    gen_kw = dict(model.get("generator_kwargs", {}))
    dec_kw = dict(model.get("decoder_kwargs", {}))
    bg_kw = dict(model.get("background_generator_kwargs", {}))
    bbox_kw = dict(model.get("bounding_box_generator_kwargs", {}))
    nr_kw = dict(model.get("neural_renderer_kwargs", {}))
    img_size = cfg.get("data", {}).get("img_size", 64)
    z_dim = model.get("z_dim", 256)
    z_dim_bg = model.get("z_dim_bg", 128)

    i_embed = getattr(args, "i_embed", 0) if args is not None else 0
    small_net = getattr(args, "small_net", 0) if args is not None else 0
    finest_res = getattr(args, "finest_res", 512) if args is not None else 512
    log2_hash = getattr(args, "log2_hashmap_size", 19) if args is not None else 19

    encoding = "hash" if i_embed == 1 else "normal"
    hash_spec = giraffe_hash_spec(finest_res, log2_hash) if i_embed == 1 else None

    decoder = DecoderConfig(
        z_dim=z_dim,
        rgb_out_dim=dec_kw.get("rgb_out_dim", 128),
        hidden_size=dec_kw.get("hidden_size", 128),
        n_blocks=dec_kw.get("n_blocks", 8),
        positional_encoding=encoding,
        hash_spec=hash_spec,
    )
    small = SmallDecoderConfig(
        z_dim=z_dim,
        rgb_out_dim=dec_kw.get("rgb_out_dim", 128),
        hash_spec=hash_spec or giraffe_hash_spec(finest_res, log2_hash),
    )
    background = DecoderConfig(
        z_dim=z_dim_bg,
        hidden_size=bg_kw.get("hidden_size", 64),
        n_blocks=bg_kw.get("n_blocks", 4),
        skips=tuple(bg_kw.get("skips", [])),
        downscale_p_by=bg_kw.get("downscale_p_by", 12.0),
        rgb_out_dim=bg_kw.get("rgb_out_dim", 128),
    )
    bbox = BBoxConfig(
        n_boxes=bbox_kw.get("n_boxes", 1),
        scale_range_min=_tup(bbox_kw.get("scale_range_min"), (0.5, 0.5, 0.5)),
        scale_range_max=_tup(bbox_kw.get("scale_range_max"), (0.5, 0.5, 0.5)),
        translation_range_min=_tup(
            bbox_kw.get("translation_range_min"), (-0.75, -0.75, 0.0)
        ),
        translation_range_max=_tup(
            bbox_kw.get("translation_range_max"), (0.75, 0.75, 0.0)
        ),
        rotation_range=_tup(bbox_kw.get("rotation_range"), (0.0, 1.0)),
        check_collision=bbox_kw.get("check_collison", False),
        collision_padding=bbox_kw.get("collision_padding", 0.1),
        object_on_plane=bbox_kw.get("object_on_plane", False),
    )
    neural_renderer = NeuralRendererConfig(
        n_feat=nr_kw.get("n_feat", 128),
        input_dim=nr_kw.get("input_dim", 128),
        img_size=img_size,
    )
    return GiraffeConfig(
        z_dim=z_dim,
        z_dim_bg=z_dim_bg,
        range_u=_tup(gen_kw.get("range_u"), (0.0, 0.0)),
        range_v=_tup(gen_kw.get("range_v"), (0.25, 0.25)),
        range_radius=_tup(gen_kw.get("range_radius"), (2.732, 2.732)),
        depth_range=_tup(gen_kw.get("depth_range"), (0.5, 6.0)),
        n_ray_samples=gen_kw.get("n_ray_samples", 64),
        resolution_vol=gen_kw.get("resolution_vol", 16),
        fov=gen_kw.get("fov", 49.13),
        bg_rotation_range=_tup(gen_kw.get("backround_rotation_range"), (0.0, 0.0)),
        use_max_composition=gen_kw.get("use_max_composition", False),
        small_decoder=bool(small_net),
        decoder=decoder,
        small=small,
        background=background,
        bbox=bbox,
        neural_renderer=neural_renderer,
    )


def dc_disc_config_from_yaml(cfg: Any) -> DCDiscConfig:
    model = cfg.get("model", {})
    d_kw = dict(model.get("discriminator_kwargs", {}))
    img_size = cfg.get("data", {}).get("img_size", 64)
    return DCDiscConfig(
        in_dim=d_kw.get("in_dim", 3),
        n_feat=d_kw.get("n_feat", 512),
        img_size=img_size,
    )
