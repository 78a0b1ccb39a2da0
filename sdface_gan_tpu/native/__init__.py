"""Native (C++) runtime components, loaded via ctypes.

Two components replace native pieces of the reference stack:

* ``recordstore`` — mmap'd key-value dataset container standing in for
  LMDB (``sdf_utils.py:404-444``, ``prepare_data.py:52-63``); same logical
  key scheme (``f"{size}-{idx:05d}"`` -> encoded image bytes, ``length``).
* ``marching_cubes`` — isosurface extraction standing in for
  scikit-image's (``sdf_utils.py:188-205``).

Compiled on first import with g++ (cached as ``_native.so`` next to the
sources); the compute path stays JAX/XLA — these are host-runtime pieces.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "_native.so"
_SOURCES = ["recordstore.cpp", "marching_cubes.cpp", "rasterizer.cpp"]

_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    srcs = [str(_DIR / s) for s in _SOURCES]
    newest_src = max(os.path.getmtime(s) for s in srcs + [str(_DIR / "mc_tables.h")])
    if _SO.exists() and os.path.getmtime(_SO) >= newest_src:
        return
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        *srcs, "-o", str(_SO),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _build()
        _lib = ctypes.CDLL(str(_SO))
        L = _lib
        L.rs_writer_open.restype = ctypes.c_void_p
        L.rs_writer_open.argtypes = [ctypes.c_char_p]
        L.rs_writer_put.restype = ctypes.c_int
        L.rs_writer_put.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint64
        ]
        L.rs_writer_close.restype = ctypes.c_int
        L.rs_writer_close.argtypes = [ctypes.c_void_p]
        L.rs_reader_open.restype = ctypes.c_void_p
        L.rs_reader_open.argtypes = [ctypes.c_char_p]
        L.rs_reader_count.restype = ctypes.c_int64
        L.rs_reader_count.argtypes = [ctypes.c_void_p]
        L.rs_reader_size.restype = ctypes.c_int64
        L.rs_reader_size.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        L.rs_reader_get.restype = ctypes.c_void_p
        L.rs_reader_get.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint64)
        ]
        L.rs_reader_key.restype = ctypes.c_char_p
        L.rs_reader_key.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        L.rs_reader_close.restype = None
        L.rs_reader_close.argtypes = [ctypes.c_void_p]
        L.mc_run.restype = ctypes.c_void_p
        L.mc_run.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_float,
        ]
        L.mc_num_verts.restype = ctypes.c_int64
        L.mc_num_verts.argtypes = [ctypes.c_void_p]
        L.mc_num_faces.restype = ctypes.c_int64
        L.mc_num_faces.argtypes = [ctypes.c_void_p]
        L.mc_copy.restype = None
        L.mc_copy.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        L.mc_free.restype = None
        L.mc_free.argtypes = [ctypes.c_void_p]
        L.raster_mesh.restype = ctypes.c_int64
        L.raster_mesh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
    return _lib


class RecordWriter:
    """Append-only writer for the native record store."""

    def __init__(self, path: str):
        os.makedirs(path, exist_ok=True)
        self._h = lib().rs_writer_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open record store for writing: {path}")

    def put(self, key: str, value: bytes) -> None:
        rc = lib().rs_writer_put(self._h, key.encode(), value, len(value))
        if rc != 0:
            raise IOError(f"write failed for key {key}")

    def close(self) -> None:
        if self._h:
            lib().rs_writer_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class RecordReader:
    """Zero-copy mmap reader for the native record store.

    Thread-safe lifecycle: the C side's reads are const (index immutable,
    values served from a read-only mmap), but ``close`` munmaps and frees
    the handle — a close racing a ``get`` in another thread is a
    use-after-free.  A per-reader lock serializes handle access (the copy
    out of the mmap via ``string_at`` happens under the lock), and every
    call after ``close`` raises ``ValueError`` instead of dereferencing a
    NULL handle.
    """

    def __init__(self, path: str):
        self._lock = threading.Lock()
        self._h = lib().rs_reader_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open record store: {path}")

    def _handle(self):
        if not self._h:
            raise ValueError("record reader is closed")
        return self._h

    def __len__(self) -> int:
        with self._lock:
            return int(lib().rs_reader_count(self._handle()))

    def keys(self):
        for i in range(len(self)):
            with self._lock:
                key = lib().rs_reader_key(self._handle(), i)
            if key is None:
                return
            yield key.decode()

    def get(self, key: str) -> Optional[bytes]:
        n = ctypes.c_uint64()
        with self._lock:
            ptr = lib().rs_reader_get(self._handle(), key.encode(), ctypes.byref(n))
            if not ptr:
                return None
            return ctypes.string_at(ptr, n.value)

    def close(self) -> None:
        with self._lock:
            if self._h:
                lib().rs_reader_close(self._h)
                self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def raster_mesh(
    verts_px: np.ndarray,
    faces: np.ndarray,
    vert_attr: np.ndarray,
    h: int,
    w: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Z-buffer rasterize a mesh carrying one scalar attribute per vertex.

    verts_px: [V, 3] pre-projected (x_pix, y_pix, depth>0); faces [F, 3];
    vert_attr [V].  Returns (attr [h, w], depth [h, w] with 1e30 = empty).
    """
    v = np.ascontiguousarray(verts_px, dtype=np.float32)
    f = np.ascontiguousarray(faces, dtype=np.int32)
    a = np.ascontiguousarray(vert_attr, dtype=np.float32)
    attr = np.zeros((h, w), dtype=np.float32)
    depth = np.zeros((h, w), dtype=np.float32)
    lib().raster_mesh(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(v), len(f), h, w,
        attr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return attr, depth


def marching_cubes(
    grid: np.ndarray, level: float = 0.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the `level` isosurface of a [nx, ny, nz] float volume.

    Returns (verts [V, 3] float32 in voxel coordinates, faces [F, 3] int32).
    Same convention as skimage.measure.marching_cubes (used by the
    reference at ``sdf_utils.py:195``): surface where the field crosses
    ``level``, vertices linearly interpolated along cell edges.
    """
    g = np.ascontiguousarray(grid, dtype=np.float32)
    if g.ndim != 3:
        raise ValueError(f"expected 3D volume, got {g.shape}")
    h = lib().mc_run(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        g.shape[0], g.shape[1], g.shape[2], float(level),
    )
    if not h:
        raise ValueError("marching cubes failed (volume too small?)")
    try:
        nv = lib().mc_num_verts(h)
        nf = lib().mc_num_faces(h)
        verts = np.empty((nv, 3), dtype=np.float32)
        faces = np.empty((nf, 3), dtype=np.int32)
        if nv:
            lib().mc_copy(
                h,
                verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
        return verts, faces
    finally:
        lib().mc_free(h)
