"""Import reference PyTorch checkpoints (``full_pipeline.pt`` etc.) into
this framework's parameter trees.

Needed for the BASELINE output-fidelity requirement: rendered images from
ported weights must match the reference within fp tolerance.  Mapping:

* torch ``Linear`` [out, in] -> ``{"w": W.T, "b": b}``
* torch conv OIHW -> HWIO
* ModulatedConv2d weight [1, O, I, kh, kw] -> [kh, kw, I, O]
* noise buffers [1, 1, r, r] -> [1, r, r, 1] (NHWC)
* GridEncoder ``embeddings`` [T, C] -> ``hash_table`` unchanged

Layer-name scheme follows the reference ``sdf_model.py`` module tree.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _lin(state, prefix):
    p = {"w": np.asarray(state[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in state:
        p["b"] = np.asarray(state[f"{prefix}.bias"])
    return p


def _film(state, prefix):
    return {
        "w": np.asarray(state[f"{prefix}.weight"]).T,
        "b": np.asarray(state[f"{prefix}.bias"]),
        "gamma": _lin(state, f"{prefix}.gamma"),
        "beta": _lin(state, f"{prefix}.beta"),
    }


def _modconv(state, prefix):
    w = np.asarray(state[f"{prefix}.weight"])[0]  # [O, I, kh, kw]
    return {
        "w": np.transpose(w, (2, 3, 1, 0)),
        "modulation": _lin(state, f"{prefix}.modulation"),
    }


def _styled_conv(state, prefix):
    return {
        "conv": _modconv(state, f"{prefix}.conv"),
        "noise_weight": np.asarray(state[f"{prefix}.noise.weight"]),
        "act_bias": np.asarray(state[f"{prefix}.activate.bias"]),
    }


def _to_rgb(state, prefix):
    return {
        "conv": _modconv(state, f"{prefix}.conv"),
        "bias": np.transpose(np.asarray(state[f"{prefix}.bias"]), (0, 2, 3, 1)),
    }


def import_generator_state(
    state: Dict[str, np.ndarray],
    renderer_type: str = "sdf",
    full_pipeline: bool = True,
    depth: int = 8,
    n_mapping: int = 3,
) -> Dict[str, Any]:
    """Build our generator param tree from a reference ``g_ema`` state dict.

    Args:
      state: numpy-converted torch state dict.
      renderer_type: 'sdf' | 'ngp' | 'fc' (selects the network mapping).
      depth: SIREN depth (pts_linears count = depth for sdf, depth+1 ngp).
    """
    state = {k: np.asarray(v) for k, v in state.items()}
    params: Dict[str, Any] = {
        # reference 'style' Sequential of MappingLinear at indices 0..n-1
        "mapping": [_lin(state, f"style.{i}") for i in range(n_mapping)],
    }

    net = "renderer.network"
    renderer: Dict[str, Any] = {}
    if "renderer.sigmoid_beta" in state:
        renderer["sigmoid_beta"] = state["renderer.sigmoid_beta"]
    if renderer_type == "ngp":
        n_layers = depth + 1 if depth != 8 else 3  # reference D=2 -> 3 layers
        network = {
            "hash_table": state[f"{net}.encoder.embeddings"],
            "input_linear": _lin(state, f"{net}.input_linear"),
            "pts_linears": [
                _film(state, f"{net}.pts_linears.{i}") for i in range(n_layers)
            ],
            "views_linear": _film(state, f"{net}.views_linears"),
            "rgb_linear": _lin(state, f"{net}.rgb_linear"),
            "sigma_linear": _lin(state, f"{net}.sigma_linear"),
        }
    elif renderer_type == "fc":
        network = {
            "x_in": _lin(state, f"{net}.x_in"),
            "style_in": _lin(state, f"{net}.style_in"),
            "pts_linears": [
                _lin(state, f"{net}.pts_linears.{i}") for i in range(depth - 1)
            ],
            "views_linear": _lin(state, f"{net}.views_linears"),
            "rgb_linear": _lin(state, f"{net}.rgb_linear"),
            "sigma_linear": _lin(state, f"{net}.sigma_linear"),
        }
    else:
        network = {
            "pts_linears": [
                _film(state, f"{net}.pts_linears.{i}") for i in range(depth)
            ],
            "views_linear": _film(state, f"{net}.views_linears"),
            "rgb_linear": _lin(state, f"{net}.rgb_linear"),
            "sigma_linear": _lin(state, f"{net}.sigma_linear"),
        }
    renderer["network"] = network
    params["renderer"] = renderer

    if full_pipeline and any(k.startswith("decoder.") for k in state):
        n_map = 1 + max(
            int(k.split(".")[2])
            for k in state
            if k.startswith("decoder.style.") and k.endswith(".weight")
        )
        n_blocks = (
            1
            + max(
                (int(k.split(".")[2]) for k in state if k.startswith("decoder.to_rgbs.")),
                default=-1,
            )
        )
        decoder: Dict[str, Any] = {
            # decoder.style.0 is PixelNorm; EqualLinears start at index 1
            "mapping": [_lin(state, f"decoder.style.{i}") for i in range(1, n_map)],
            "conv1": _styled_conv(state, "decoder.conv1"),
            "to_rgb1": _to_rgb(state, "decoder.to_rgb1"),
            "convs": [
                _styled_conv(state, f"decoder.convs.{i}") for i in range(2 * n_blocks)
            ],
            "to_rgbs": [_to_rgb(state, f"decoder.to_rgbs.{i}") for i in range(n_blocks)],
            "noises": [
                np.transpose(state[f"decoder.noises.noise_{i}"], (0, 2, 3, 1))
                for i in range(2 * n_blocks + 1)
            ],
        }
        params["decoder"] = decoder

    import jax.numpy as jnp
    import jax

    return jax.tree_util.tree_map(jnp.asarray, params)


def load_reference_checkpoint(path: str, key: str = "g_ema", **kwargs) -> Dict[str, Any]:
    """Load a reference ``.pt`` checkpoint file and convert."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt[key] if key in ckpt else ckpt
    state = {k: v.numpy() for k, v in state.items()}
    return import_generator_state(state, **kwargs)
