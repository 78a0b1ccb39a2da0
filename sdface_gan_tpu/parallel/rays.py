"""Ray sharding — the volume renderer's sequence-parallel analog.

The reference scales inference by host-side chunk loops
(``sdf_mesh.py:133-138``, SURVEY.md §2.6); the reference has no
tensor/sequence parallelism at all.  On TPU the per-ray computation is
embarrassingly parallel — the sample-axis cumprod stays local per ray —
so a big render (e.g. the 128^2 x 128-sample surface probe, 2M+ points)
shards its RAY grid across the mesh with ``shard_map`` and needs no
collective at all: each device renders a horizontal band of the image.

Use for single-image / small-batch inference where batch-axis data
parallelism has nothing to shard.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..geometry.rays import base_t_vals, get_rays
from ..models.renderer import RendererConfig, RenderOutput, _apply_network, _integrate


def render_ray_sharded(
    params,
    cfg: RendererConfig,
    focal: jnp.ndarray,
    c2w: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    style: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "data",
) -> RenderOutput:
    """Deterministic (test-mode) render with rays sharded over the mesh.

    The image height must divide the mesh size.  Matches
    :func:`sdface_gan_tpu.models.renderer.render` with ``perturb=0``.
    """
    batch = c2w.shape[0]
    res, s = cfg.out_im_res, cfg.n_samples
    n_dev = mesh.devices.size
    if res % n_dev != 0:
        raise ValueError(f"image height {res} must divide the mesh size {n_dev}")

    rays = get_rays(focal, c2w, res, static_viewdirs=cfg.static_viewdirs)
    if cfg.view_independent:
        rays = rays._replace(viewdirs=jnp.zeros_like(rays.viewdirs))
    near_b = near.reshape(batch, 1, 1, 1)
    far_b = far.reshape(batch, 1, 1, 1)
    t_vals = base_t_vals(s, cfg.offset_sampling).reshape(1, 1, 1, s)
    z_vals = jnp.broadcast_to(
        near_b * (1.0 - t_vals) + far_b * t_vals, (batch, res, res, s)
    )
    scale = jnp.broadcast_to(2.0 / (far_b - near_b), (batch, 1, 1, 1))

    def band(origins, dirs, views, z_band, scale_band, style_loc):
        pts = origins[..., None, :] + dirs[..., None, :] * z_band[..., None]
        normalized = pts * scale_band[..., None] if cfg.z_normalize else pts
        v = jnp.broadcast_to(views[..., None, :], pts.shape)
        parts = _apply_network(params, cfg, normalized, v, style_loc)
        rgb, features, sdf, mask, xyz, _ = _integrate(
            params, cfg, parts, z_band, dirs, pts
        )
        # dict of the non-None outputs: every entry is image-row sharded,
        # and the static cfg fixes the pytree structure for shard_map
        out = {"rgb": rgb}
        if features is not None:
            out["features"] = features
        if sdf is not None:
            out["sdf"] = sdf
        if mask is not None:
            out["mask"] = mask
        if xyz is not None:
            out["xyz"] = xyz
        return out

    spec_ray = P(None, axis_name)  # shard the H (row) axis
    out_keys = ["rgb"]
    if cfg.output_features:
        out_keys.append("features")
    if cfg.return_sdf:
        out_keys.append("sdf")
    if cfg.return_xyz:
        out_keys.extend(["mask", "xyz"])
    # The replication checker (check_rep pre-0.9, check_vma 0.9+) rejects
    # the closed-over replicated params; disable whichever this jax has.
    import inspect

    flag = (
        "check_vma"
        if "check_vma" in inspect.signature(shard_map).parameters
        else "check_rep"
    )
    sharded = shard_map(
        band,
        mesh=mesh,
        in_specs=(spec_ray, spec_ray, spec_ray, spec_ray, P(None), P(None)),
        out_specs={k: spec_ray for k in sorted(out_keys)},
        **{flag: False},
    )
    out = sharded(
        rays.origins, rays.directions, rays.viewdirs, z_vals, scale, style
    )
    return RenderOutput(
        out["rgb"], out.get("features"), out.get("sdf"), out.get("mask"),
        out.get("xyz"), None,
    )


def place_ray_sharded(x: jnp.ndarray, mesh: Mesh, axis_name: str = "data"):
    """Device_put an image-shaped array with rows sharded over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(None, axis_name)))
