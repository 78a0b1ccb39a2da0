"""GIRAFFE render programs (controllable-synthesis visualizations).

Rebuild of ``im2scene/giraffe/rendering.py``: each program fixes the latent
codes and sweeps one control — object rotation, horizontal/depth
translation, appearance/shape slerp, camera elevation — writing a frame
sequence per sample.  Frames are saved as image grids and (when imageio
has an mp4 backend) videos.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.images import save_image_grid
from .bbox import fixed_transformations
from .camera import interpolate_sphere
from .generator import (
    GiraffeConfig,
    LatentCodes,
    fixed_camera,
    giraffe_forward,
    sample_latent_codes,
)

PROGRAMS = (
    "object_rotation",
    "object_translation_horizontal",
    "object_translation_vertical",
    "interpolate_app",
    "interpolate_shape",
    "render_camera_elevation",
    "render_add_objects",
)


def _render(params, cfg, codes, cams, trans):
    img = giraffe_forward(
        params, cfg, latent_codes=codes, camera_matrices=cams,
        transformations=trans, mode="eval",
    )
    return np.asarray(img) * 2.0 - 1.0  # [-1,1] for the grid writer


def render_program(
    params,
    cfg: GiraffeConfig,
    program: str,
    out_dir: str,
    n_samples: int = 4,
    n_steps: int = 16,
    key: Optional[jax.Array] = None,
    save_video: bool = True,
) -> List[np.ndarray]:
    """Run one named program; returns the frame list ([N, H, W, 3] each)."""
    if program not in PROGRAMS:
        raise ValueError(f"unknown render program {program}; options: {PROGRAMS}")
    os.makedirs(out_dir, exist_ok=True)
    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    codes = sample_latent_codes(k1, cfg, n_samples, tmp=0.65)
    cams = fixed_camera(cfg, n_samples)
    n_boxes = cfg.n_boxes

    frames: List[np.ndarray] = []
    for step in range(n_steps):
        t = step / max(n_steps - 1, 1)
        step_codes = codes
        step_cams = cams
        if program == "object_rotation":
            # reference sweeps r in [0, 1] (rendering.py object_rotation)
            trans = fixed_transformations(
                cfg.bbox, n_samples, val_r=[t] * n_boxes,
                val_s=[[0.5] * 3] * n_boxes, val_t=[[0.5] * 3] * n_boxes,
            )
        elif program == "object_translation_horizontal":
            trans = fixed_transformations(
                cfg.bbox, n_samples, val_r=[0.0] * n_boxes,
                val_s=[[0.5] * 3] * n_boxes, val_t=[[t, 0.5, 0.5]] * n_boxes,
            )
        elif program == "object_translation_vertical":
            trans = fixed_transformations(
                cfg.bbox, n_samples, val_r=[0.0] * n_boxes,
                val_s=[[0.5] * 3] * n_boxes, val_t=[[0.5, t, 0.5]] * n_boxes,
            )
        elif program in ("interpolate_app", "interpolate_shape"):
            k2, sub = jax.random.split(k2)
            codes2 = sample_latent_codes(sub, cfg, n_samples, tmp=0.65)
            if program == "interpolate_app":
                z_app = interpolate_sphere(codes.z_app_obj, codes2.z_app_obj, t)
                step_codes = codes._replace(z_app_obj=z_app)
            else:
                z_shape = interpolate_sphere(codes.z_shape_obj, codes2.z_shape_obj, t)
                step_codes = codes._replace(z_shape_obj=z_shape)
            trans = fixed_transformations(cfg.bbox, n_samples)
        elif program == "render_camera_elevation":
            step_cams = fixed_camera(cfg, n_samples, val_v=t)
            trans = fixed_transformations(cfg.bbox, n_samples)
        elif program == "render_add_objects":
            # reveal one more object per segment (reference CLEVR/cars
            # add-object programs): mask boxes beyond the current count
            trans = fixed_transformations(
                cfg.bbox, n_samples,
                val_s=[[0.5] * 3] * n_boxes,
                val_t=[[(j + 1) / (n_boxes + 1), 0.5, 0.5] for j in range(n_boxes)],
                val_r=[0.0] * n_boxes,
            )
            n_visible = 1 + int(t * (n_boxes - 1) + 1e-6) if n_boxes > 1 else 1
            mask = jnp.tile(
                (jnp.arange(n_boxes) < n_visible).astype(jnp.float32)[None],
                (n_samples, 1),
            )
            img = giraffe_forward(
                params, cfg, latent_codes=step_codes, camera_matrices=step_cams,
                transformations=trans, mode="eval", object_mask=mask,
            )
            frames.append(np.asarray(img) * 2.0 - 1.0)
            continue
        frames.append(_render(params, cfg, step_codes, step_cams, trans))

    # contact-sheet grid: samples x steps
    sheet = np.concatenate(frames, axis=0)
    save_image_grid(sheet, os.path.join(out_dir, f"{program}.png"), nrow=n_samples)
    if save_video:
        try:
            import imageio

            with imageio.get_writer(
                os.path.join(out_dir, f"{program}.mp4"), fps=8
            ) as w:
                for f in frames:
                    row = np.concatenate(list((f + 1) * 127.5), axis=1).astype(np.uint8)
                    w.append_data(row)
        except Exception as e:  # no ffmpeg backend in minimal images
            print(f"video export skipped ({e})")
    return frames


def extract_giraffe_mesh(
    params,
    cfg: GiraffeConfig,
    codes: Optional[LatentCodes] = None,
    resolution: int = 128,
    bbox_extent: float = 1.0,
    level: float = 0.005,
    key: Optional[jax.Array] = None,
):
    """GIRAFFE density -> marching-cubes mesh (reference
    ``extract_mesh.py:9-114``): evaluate sigma of object 0 on a dense grid
    over the unit box, convert to alpha ``1 - exp(-sigma * step)``, and
    triangulate at the given level."""
    from ..geometry.mesh import Mesh
    from ..native import marching_cubes
    from .decoder import apply_giraffe_decoder
    from .generator import _apply_decoder

    key = key if key is not None else jax.random.PRNGKey(0)
    if codes is None:
        codes = sample_latent_codes(key, cfg, 1, tmp=0.65)

    lin = jnp.linspace(-bbox_extent, bbox_extent, resolution)
    gx, gy, gz = jnp.meshgrid(lin, lin, lin, indexing="ij")
    pts = jnp.stack([gx, gy, gz], -1).reshape(1, -1, 3)

    chunk = 65536
    sigmas = []
    for i in range(0, pts.shape[1], chunk):
        p = pts[:, i : i + chunk]
        _, sigma = _apply_decoder(
            params["decoder"], cfg, p, p, codes.z_shape_obj[:, 0], codes.z_app_obj[:, 0]
        )
        sigmas.append(np.asarray(sigma))
    sigma = np.concatenate(sigmas, axis=1).reshape(resolution, resolution, resolution)
    step = 2.0 * bbox_extent / resolution
    alpha = 1.0 - np.exp(-np.maximum(sigma, 0.0) * step)
    verts, faces = marching_cubes(alpha, level)
    verts = verts / (resolution - 1) * 2.0 * bbox_extent - bbox_extent
    return Mesh(verts=verts.astype(np.float32), faces=faces.astype(np.int32))
