"""Mesh extraction utilities for SDF volumes.

Rebuild of the reference mesh path (``im2scene/sdf/models/sdf_utils.py:
160-331`` + ``sdf_mesh.py:132-182``):

* :func:`align_volume` — warp the axis-aligned SDF sample volume into the
  camera frustum (the renderer samples along diverging rays, so the raw
  [H, W, D] volume is a frustum, not a cube).
* :func:`extract_mesh_with_marching_cubes` — zero-isosurface via the
  native C++ marching cubes (:mod:`sdface_gan_tpu.native`), with the
  reference's 0.24 world scale and normal-direction fixes.
* :func:`xyz2mesh` — Delaunay depth-map mesh from the renderer's surface
  point cloud.
* OBJ / PLY export (replaces the reference's trimesh dependency).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class Mesh:
    """Host-side triangle mesh."""

    verts: np.ndarray  # [V, 3] float32
    faces: np.ndarray  # [F, 3] int32

    def export_obj(self, path: str) -> None:
        with open(path, "w") as f:
            for v in self.verts:
                f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
            for face in self.faces:
                f.write(f"f {face[0] + 1} {face[1] + 1} {face[2] + 1}\n")

    def export_ply(self, path: str) -> None:
        with open(path, "wb") as f:
            header = (
                "ply\nformat binary_little_endian 1.0\n"
                f"element vertex {len(self.verts)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                f"element face {len(self.faces)}\n"
                "property list uchar int vertex_indices\nend_header\n"
            )
            f.write(header.encode())
            f.write(np.ascontiguousarray(self.verts, dtype="<f4").tobytes())
            counts = np.full((len(self.faces), 1), 3, dtype=np.uint8)
            body = np.empty(
                (len(self.faces),), dtype=[("n", "u1"), ("idx", "<i4", (3,))]
            )
            body["n"] = counts[:, 0]
            body["idx"] = self.faces.astype("<i4")
            f.write(body.tobytes())


def align_volume(
    volume: jnp.ndarray, near: float = 0.88, far: float = 1.12
) -> jnp.ndarray:
    """Frustum-align an SDF sample volume (reference ``align_volume``,
    ``sdf_utils.py:162-183``).

    volume: [B, H, W, D, C] sampled along camera rays; per-depth the (x, y)
    extent is rescaled by ``far/near -> 1`` so the output is a regular cube
    volume.  Trilinear resampling with border clamping (torch
    ``grid_sample(padding_mode='border', align_corners=True)`` semantics);
    out-of-frustum cells are set to 1 (outside the surface) so marching
    cubes sees no spurious zero crossings.
    """
    b, h, w, d, c = volume.shape
    yy = jnp.linspace(-1.0, 1.0, h).reshape(h, 1, 1)
    xx = jnp.linspace(-1.0, 1.0, w).reshape(1, w, 1)
    zz = jnp.linspace(-1.0, 1.0, d).reshape(1, 1, d)
    adjust = jnp.linspace(far / near, 1.0, d).reshape(1, 1, d)

    gy = jnp.broadcast_to(yy * adjust, (h, w, d))
    gx = jnp.broadcast_to(xx * adjust, (h, w, d))
    gz = jnp.broadcast_to(zz, (h, w, d))
    oob = (
        (jnp.abs(gy) > 1.0) | (jnp.abs(gx) > 1.0) | (jnp.abs(gz) > 1.0)
    )[None, :, :, :, None]

    # normalized [-1,1] -> voxel coords, align_corners=True
    iy = (gy + 1.0) * 0.5 * (h - 1)
    ix = (gx + 1.0) * 0.5 * (w - 1)
    iz = (gz + 1.0) * 0.5 * (d - 1)
    coords = jnp.stack([iy, ix, iz])  # [3, h, w, d]

    def sample_one(vol_hwd: jnp.ndarray) -> jnp.ndarray:
        # 'nearest' edge handling == border padding (coords clamped).
        return jax.scipy.ndimage.map_coordinates(
            vol_hwd, list(coords), order=1, mode="nearest"
        )

    vol_bc = volume.transpose(0, 4, 1, 2, 3).reshape(b * c, h, w, d)
    out = jax.vmap(sample_one)(vol_bc)
    out = out.reshape(b, c, h, w, d).transpose(0, 2, 3, 4, 1)
    return jnp.where(oob, 1.0, out)


def extract_mesh_with_marching_cubes(sdf: np.ndarray, level: float = 0.0) -> Mesh:
    """Triangulate an SDF volume (reference ``sdf_utils.py:187-205``).

    sdf: [B, H, W, D, 1] (host numpy); uses volume [0].  Vertices are
    mapped to the reference's world convention: centered, scaled by 0.24,
    with y/z flipped to fix normal orientation.
    """
    from ..native import marching_cubes

    _, h, w, d, _ = sdf.shape
    vol = np.ascontiguousarray(np.swapaxes(np.asarray(sdf)[0, ..., 0], 0, 1))
    verts, faces = marching_cubes(vol, level)
    verts = verts.copy()
    verts[:, 0] = (verts[:, 0] / float(w) - 0.5) * 0.24
    verts[:, 1] = (verts[:, 1] / float(h) - 0.5) * 0.24
    verts[:, 2] = (verts[:, 2] / float(d) - 0.5) * 0.24
    verts[:, 1] *= -1
    verts[:, 2] *= -1
    return Mesh(verts=verts, faces=faces.astype(np.int32))


def xyz2mesh(xyz: np.ndarray) -> Mesh:
    """Depth-map Delaunay mesh from a surface point cloud (reference
    ``sdf_utils.py:209-223``).

    xyz: [1, H, W, 3] world-space surface points (channel-last).
    """
    from scipy.spatial import Delaunay

    _, h, w, _ = xyz.shape
    x, y = np.meshgrid(np.arange(h), np.arange(w))
    tri = Delaunay(
        np.concatenate((x.reshape(h * w, 1), y.reshape(h * w, 1)), axis=1)
    )
    faces = tri.simplices.copy()
    faces[:, [0, 1]] = faces[:, [1, 0]]  # invert normals
    verts = np.asarray(xyz)[0].reshape(h * w, 3)
    return Mesh(verts=verts.astype(np.float32), faces=faces.astype(np.int32))
