"""GIRAFFE render programs (controllable-synthesis visualizations).

Rebuild of ``im2scene/giraffe/rendering.py``: each program fixes the latent
codes and sweeps one control — object rotation, horizontal/depth
translation, appearance/shape slerp, camera elevation — writing a frame
sequence per sample.  Frames are saved as image grids and (when imageio
has an mp4 backend) videos.
"""

from __future__ import annotations

import os
from dataclasses import replace
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.images import save_image_grid
from .bbox import fixed_transformations, sample_transformations
from .camera import interpolate_sphere
from .generator import (
    GiraffeConfig,
    LatentCodes,
    fixed_camera,
    giraffe_forward,
    sample_latent_codes,
)

# Every program name the reference's render_full_visualization dispatches
# (rendering.py:39-77), plus the generic "render_add_objects" reveal and
# the shape-mode background interpolation the reference parameterizes but
# never names.
PROGRAMS = (
    "object_rotation",
    "object_translation_horizontal",
    "object_translation_vertical",
    "interpolate_app",
    "interpolate_app_bg",
    "interpolate_shape",
    "interpolate_shape_bg",
    "object_translation_circle",
    "render_camera_elevation",
    "render_add_objects",
    "render_add_cars",
    "render_add_clevr10",
    "render_add_clevr6",
)

# Scripted add-object layouts (reference rendering.py:404-585): fixed
# fractional scale/translation/rotation tables; objects are revealed
# cumulatively.  The TPU build renders every step with ONE compiled
# program (all boxes present, invisible ones masked to zero density —
# identical compositing math) instead of recompiling per object count.
_ADD_LAYOUTS = {
    # cars5 (rendering.py:404-462): 6 cars on a 2x3 grid, s pinned below
    # range min, camera at v=0, reveal 1..6
    "render_add_cars": dict(
        n_objs=6,
        val_s=[[-1.0, -1.0, -1.0]] * 6,
        val_t=[
            [-0.7, -0.8, 0.0], [-0.7, 0.5, 0.0], [-0.7, 1.8, 0.0],
            [1.5, -0.8, 0.0], [1.5, 0.5, 0.0], [1.5, 1.8, 0.0],
        ],
        val_r=[0.5] * 6,
        reveal=tuple(range(1, 7)),
    ),
    # clevr10 (rendering.py:464-524): 12 objects placed in vertical pairs
    # over a 3x2 grid, revealed two at a time
    "render_add_clevr10": dict(
        n_objs=12,
        val_s=[[0.0, 0.0, 0.0]] * 12,
        val_t=[
            coord
            for i in range(6)
            for coord in (
                [(0.0, 0.5, 1.0)[i % 3], 0.0 if i < 3 else 0.8, 0.0],
                [(0.0, 0.5, 1.0)[i % 3], (0.0 if i < 3 else 0.8) + 0.4, 0.0],
            )
        ],
        val_r=[0.0] * 12,
        reveal=tuple(range(2, 13, 2)),
    ),
    # clevr6 (rendering.py:526-585): 6 objects on a 2x3 grid, reveal 1..6
    "render_add_clevr6": dict(
        n_objs=6,
        val_s=[[0.0, 0.0, 0.0]] * 6,
        val_t=[
            [0.2 if i % 2 == 0 else 0.8, (0.0, 0.0, 0.5, 0.5, 1.0, 1.0)[i], 0.0]
            for i in range(6)
        ],
        val_r=[0.0] * 6,
        reveal=tuple(range(1, 7)),
    ),
}


def _render(params, cfg, codes, cams, trans):
    img = giraffe_forward(
        params, cfg, latent_codes=codes, camera_matrices=cams,
        transformations=trans, mode="eval",
    )
    return np.asarray(img) * 2.0 - 1.0  # [-1,1] for the grid writer


def _scripted_add_objects(
    params, cfg: GiraffeConfig, program: str, key: jax.Array, n_samples: int
) -> List[np.ndarray]:
    """The scripted cars5/clevr10/clevr6 reveal sequences
    (reference rendering.py:404-585)."""
    lay = _ADD_LAYOUTS[program]
    n_objs = lay["n_objs"]
    scfg = replace(cfg, bbox=replace(cfg.bbox, n_boxes=n_objs),
                   sample_object_existance=False)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    tmp = 0.65
    codes = LatentCodes(
        tmp * jax.random.normal(k1, (n_samples, n_objs, cfg.z_dim)),
        tmp * jax.random.normal(k2, (n_samples, n_objs, cfg.z_dim)),
        tmp * jax.random.normal(k3, (n_samples, cfg.z_dim_bg)),
        tmp * jax.random.normal(k4, (n_samples, cfg.z_dim_bg)),
    )
    cams = fixed_camera(scfg, n_samples, val_v=0.0)
    trans = fixed_transformations(
        scfg.bbox, n_samples, val_s=lay["val_s"], val_t=lay["val_t"],
        val_r=lay["val_r"],
    )
    frames = []
    for count in lay["reveal"]:
        mask = jnp.tile(
            (jnp.arange(n_objs) < count).astype(jnp.float32)[None],
            (n_samples, 1),
        )
        img = giraffe_forward(
            params, scfg, latent_codes=codes, camera_matrices=cams,
            transformations=trans, mode="eval", object_mask=mask,
        )
        frames.append(np.asarray(img) * 2.0 - 1.0)
    return frames


def render_program(
    params,
    cfg: GiraffeConfig,
    program: str,
    out_dir: str,
    n_samples: int = 4,
    n_steps: int = 16,
    key: Optional[jax.Array] = None,
    save_video: bool = True,
    codes: Optional[LatentCodes] = None,
    export_meshes: bool = False,
    mesh_resolution: int = 64,
) -> List[np.ndarray]:
    """Run one named program; returns the frame list ([N, H, W, 3] each).

    ``codes`` overrides the sampled latent codes — the hook for the
    reference's VAE real-image conditioning (``render.py:25-52`` encodes
    real images and replaces the object latents).  ``export_meshes``
    additionally writes one marching-cubes ``.ply`` per identity during
    ``object_rotation`` (reference rendering.py:134-141).
    """
    if program not in PROGRAMS:
        raise ValueError(f"unknown render program {program}; options: {PROGRAMS}")
    os.makedirs(out_dir, exist_ok=True)
    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    if program in _ADD_LAYOUTS:
        frames = _scripted_add_objects(params, cfg, program, k1, n_samples)
        _save_outputs(frames, out_dir, program, n_samples, save_video)
        return frames

    if codes is None:
        codes = sample_latent_codes(k1, cfg, n_samples, tmp=0.65)
    n_samples = int(codes.z_shape_obj.shape[0])
    cams = fixed_camera(cfg, n_samples)
    n_boxes = cfg.n_boxes
    # interpolation programs slerp toward ONE fixed target (reference
    # render_interpolation: a fixed pair per segment, w in [0, 1]); only
    # the programs that use these sample them (keys are dedicated, so
    # laziness changes no other program's randomness)
    codes2 = (
        sample_latent_codes(k2, cfg, n_samples, tmp=0.65)
        if program.startswith("interpolate_")
        else None
    )
    # circle program with >2 boxes keeps random transforms for the rest
    # (reference rendering.py:322-370)
    circle_trans = (
        sample_transformations(k3, cfg.bbox, n_samples)
        if program == "object_translation_circle" and n_boxes > 2
        else None
    )
    # object_rotation sweeps the full range only when the config allows a
    # full turn (reference rendering.py:86-90)
    full_rot = cfg.bbox.rotation_range == (0.0, 1.0)
    r_scale = (0.0, 1.0) if full_rot else (0.1, 0.9)

    frames: List[np.ndarray] = []
    for step in range(n_steps):
        t = step / max(n_steps - 1, 1)
        step_codes = codes
        step_cams = cams
        if program == "object_rotation":
            r = r_scale[0] + t * (r_scale[1] - r_scale[0])
            trans = fixed_transformations(
                cfg.bbox, n_samples, val_r=[r] * n_boxes,
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
        elif program in ("interpolate_app", "interpolate_shape",
                         "interpolate_app_bg", "interpolate_shape_bg"):
            if program == "interpolate_app":
                step_codes = codes._replace(
                    z_app_obj=interpolate_sphere(codes.z_app_obj, codes2.z_app_obj, t)
                )
            elif program == "interpolate_shape":
                step_codes = codes._replace(
                    z_shape_obj=interpolate_sphere(
                        codes.z_shape_obj, codes2.z_shape_obj, t
                    )
                )
            elif program == "interpolate_app_bg":
                step_codes = codes._replace(
                    z_app_bg=interpolate_sphere(codes.z_app_bg, codes2.z_app_bg, t)
                )
            else:
                step_codes = codes._replace(
                    z_shape_bg=interpolate_sphere(
                        codes.z_shape_bg, codes2.z_shape_bg, t
                    )
                )
            trans = fixed_transformations(cfg.bbox, n_samples)
        elif program == "object_translation_circle":
            # last box orbits: t = (cos, sin)(2 pi t) * 0.5 + 0.5
            ci = float(np.cos(2 * np.pi * t) * 0.5 + 0.5)
            si = float(np.sin(2 * np.pi * t) * 0.5 + 0.5)
            if circle_trans is None:
                base_t = [[0.5, 0.5, 0.0]] * (n_boxes - 1)
                trans = fixed_transformations(
                    cfg.bbox, n_samples, val_s=[[0.0] * 3] * n_boxes,
                    val_t=base_t + [[ci, si, 0.0]], val_r=[0.0] * n_boxes,
                )
            else:
                s10, t10, r10 = circle_trans
                _, ti, _ = fixed_transformations(
                    cfg.bbox, n_samples, val_s=[[0.0] * 3],
                    val_t=[[ci, si, 0.0]], val_r=[0.0],
                )
                trans = (s10, t10.at[:, -1:].set(ti), r10)
        elif program == "render_camera_elevation":
            # reference sweeps v in [0.1, 0.9] (rendering.py:372-400)
            step_cams = fixed_camera(cfg, n_samples, val_v=0.1 + t * 0.8)
            trans = fixed_transformations(cfg.bbox, n_samples)
        elif program == "render_add_objects":
            # reveal one more object per segment (generic variant of the
            # scripted cars/clevr programs): mask boxes beyond the count
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

    if program == "object_rotation" and export_meshes:
        # one isosurface per identity (reference rendering.py:134-141
        # exports a .ply per latent after the rotation sweep)
        for i in range(n_samples):
            codes_i = LatentCodes(
                codes.z_shape_obj[i : i + 1], codes.z_app_obj[i : i + 1],
                codes.z_shape_bg[i : i + 1], codes.z_app_bg[i : i + 1],
            )
            mesh = extract_giraffe_mesh(
                params, cfg, codes=codes_i, resolution=mesh_resolution
            )
            mesh.export_ply(os.path.join(out_dir, f"{i:02d}_rotation.ply"))

    _save_outputs(frames, out_dir, program, n_samples, save_video)
    return frames


def _save_outputs(
    frames: List[np.ndarray], out_dir: str, program: str, n_samples: int,
    save_video: bool,
) -> None:
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
