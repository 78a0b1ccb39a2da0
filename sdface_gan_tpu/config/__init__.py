from .node import ConfigNode
from .yaml_config import load_config, save_config
from .sdf_options import sdf_defaults, parse_sdf_options, get_vol_render_opt

__all__ = [
    "ConfigNode",
    "load_config",
    "save_config",
    "sdf_defaults",
    "parse_sdf_options",
    "get_vol_render_opt",
]
