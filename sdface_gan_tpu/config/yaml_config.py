"""YAML config loading with recursive ``inherit_from`` semantics.

Contract mirrors the reference loader (``im2scene/config.py:24-68``):
a config may name a parent via ``inherit_from``; otherwise the provided
``default_path`` seeds the tree; the file's own entries are merged on top
recursively.
"""

from __future__ import annotations

import os
from typing import Optional

import yaml

from .node import ConfigNode


def load_config(path: str, default_path: Optional[str] = None) -> ConfigNode:
    """Load a YAML config file, resolving ``inherit_from`` chains.

    Args:
      path: path to the YAML file.
      default_path: fallback base config used when the file has no
        ``inherit_from`` entry (the reference passes ``configs/default.yaml``).
    """
    with open(path, "r") as f:
        cfg_special = yaml.safe_load(f) or {}

    inherit_from = cfg_special.get("inherit_from")
    if inherit_from is not None:
        # Relative inherit paths resolve against cwd first (reference
        # behavior), then against the config file's own directory.
        parent = inherit_from
        if not os.path.isabs(parent) and not os.path.exists(parent):
            candidate = os.path.join(os.path.dirname(path), parent)
            if os.path.exists(candidate):
                parent = candidate
        cfg = load_config(parent, default_path)
    elif default_path is not None:
        with open(default_path, "r") as f:
            cfg = ConfigNode(yaml.safe_load(f) or {})
    else:
        cfg = ConfigNode()

    if not isinstance(cfg, ConfigNode):
        cfg = ConfigNode(cfg)
    cfg.update_recursive(cfg_special)
    return cfg


def default_config_path() -> str:
    """Path to the repo's ``configs/default.yaml`` (the base every config
    inherits, reference ``train.py:66``)."""
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "configs", "default.yaml")


def save_config(cfg: ConfigNode, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=False)
