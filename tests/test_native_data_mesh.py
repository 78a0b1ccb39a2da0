"""Native record store, data pipeline, and mesh-extraction tests."""

import os

import numpy as np
import pytest
from PIL import Image

from sdface_gan_tpu.data import DataLoader, MultiResolutionDataset, prepare_data
from sdface_gan_tpu.geometry.mesh import (
    Mesh,
    align_volume,
    extract_mesh_with_marching_cubes,
    xyz2mesh,
)
from sdface_gan_tpu.native import RecordReader, RecordWriter, marching_cubes


# ------------------------------------------------------------- record store
def test_record_store_roundtrip(tmp_path):
    path = str(tmp_path / "store")
    with RecordWriter(path) as w:
        for i in range(5):
            w.put(f"k{i}", bytes([i]) * (i + 1))
        w.put("length", b"5")
    with RecordReader(path) as r:
        assert len(r) == 6
        for i in range(5):
            assert r.get(f"k{i}") == bytes([i]) * (i + 1)
        assert r.get("nope") is None
        assert list(r.keys())[:2] == ["k0", "k1"]


# ------------------------------------------------------------ data pipeline
def _make_image_dir(tmp_path, n=6, size=40):
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"{i:03d}.png")
    return str(d)


def test_prepare_and_dataset_and_loader(tmp_path):
    in_dir = _make_image_dir(tmp_path)
    store = str(tmp_path / "store")
    n = prepare_data(in_dir, store, sizes=(16, 32), n_workers=1)
    assert n == 6

    ds = MultiResolutionDataset(store, resolution=32, nerf_resolution=16)
    assert len(ds) == 6
    img, thumb = ds[0]
    assert img.shape == (32, 32, 3) and thumb.shape == (16, 16, 3)
    assert img.dtype == np.float32
    assert img.min() >= -1.0 and img.max() <= 1.0

    with DataLoader(ds, batch_size=4, seed=1) as loader:
        it = iter(loader)
        imgs, thumbs = next(it)
        assert imgs.shape == (4, 32, 32, 3)
        assert thumbs.shape == (4, 16, 16, 3)
        imgs2, _ = next(it)
        assert imgs2.shape == (4, 32, 32, 3)
    ds.close()


def test_loader_per_host_sharding(tmp_path):
    """Two hosts with the same seed must partition each global batch:
    disjoint slices whose union is the single-host batch (the reference's
    DistributedSampler contract, ``sdf_utils.py:44-52``)."""
    in_dir = _make_image_dir(tmp_path)
    store = str(tmp_path / "store")
    prepare_data(in_dir, store, sizes=(16, 32), n_workers=1)
    ds = MultiResolutionDataset(store, resolution=32, nerf_resolution=16)

    def first_batch(host_id, num_hosts, batch=4):
        with DataLoader(ds, batch_size=batch, seed=7, shuffle=True,
                        host_id=host_id, num_hosts=num_hosts) as loader:
            imgs, thumbs = next(iter(loader))
        return imgs

    full = first_batch(0, 1)
    h0 = first_batch(0, 2)
    h1 = first_batch(1, 2)
    assert h0.shape == (2, 32, 32, 3) and h1.shape == (2, 32, 32, 3)
    # hflip randomness differs per worker rng, so compare by nearest match
    # on the un-flipped or flipped image content
    def matches(a, bank):
        return any(
            np.allclose(a, b) or np.allclose(a, b[:, ::-1]) for b in bank
        )
    for row in list(h0) + list(h1):
        assert matches(row, [f for f in full] + [f[:, ::-1] for f in full])
    # disjoint: no h0 row equals an h1 row (distinct dataset indices)
    for a in h0:
        assert not matches(a, list(h1))

    import pytest as _pytest
    with _pytest.raises(ValueError):
        DataLoader(ds, batch_size=5, host_id=0, num_hosts=2)
    ds.close()


def test_loader_reader_shutdown_stress(tmp_path):
    """100x: tear the dataset down while a loader worker is mid-read.

    Round-1 flaw: the prefetch worker was a never-joined daemon that could
    segfault when ``RecordReader.close`` munmapped the store under a live
    ``get`` (observed as a pytest-killing SIGSEGV).  Now ``close`` and
    ``get`` are serialized, post-close access raises, and the loader joins
    its workers deterministically."""
    import threading

    in_dir = _make_image_dir(tmp_path, n=8, size=24)
    store = str(tmp_path / "store")
    prepare_data(in_dir, store, sizes=(16,), n_workers=1)

    for trial in range(100):
        ds = MultiResolutionDataset(store, resolution=16, nerf_resolution=16)
        loader = DataLoader(ds, batch_size=2, seed=trial, prefetch=2)
        it = iter(loader)
        next(it)
        if trial % 2 == 0:
            # the safe order: join workers, then close the reader
            loader.close()
            ds.close()
        else:
            # the hostile order: munmap the store while the worker runs
            closer = threading.Thread(target=ds.close)
            closer.start()
            closer.join()
            loader.close()
        # post-close access fails loudly instead of dereferencing NULL
        with pytest.raises(ValueError):
            ds.reader.get("16-00000")
        # idempotent close
        ds.close()
        loader.close()


def test_loader_worker_death_raises_at_consumer(tmp_path):
    """A worker killed by dataset teardown must surface as an exception at
    the consumer, not an eternal q.get() hang."""
    in_dir = _make_image_dir(tmp_path, n=8, size=24)
    store = str(tmp_path / "store")
    prepare_data(in_dir, store, sizes=(16,), n_workers=1)
    ds = MultiResolutionDataset(store, resolution=16, nerf_resolution=16)
    loader = DataLoader(ds, batch_size=2, seed=0, prefetch=1)
    it = iter(loader)
    next(it)
    ds.close()  # worker's next __getitem__ raises ValueError
    with pytest.raises(RuntimeError, match="worker died"):
        for _ in range(16):  # drain whatever was prefetched first
            next(it)
    loader.close()


def test_dataset_hflip_consistency(tmp_path):
    """img and thumb must be flipped together (thumb derives from the
    flipped image, reference sdf_utils.py:436-441)."""
    in_dir = _make_image_dir(tmp_path, n=1, size=32)
    store = str(tmp_path / "store")
    prepare_data(in_dir, store, sizes=(16, 32), n_workers=1)
    ds = MultiResolutionDataset(store, resolution=32, nerf_resolution=32, hflip=True)
    rng_flip = np.random.default_rng(3)  # first random() > 0.5 -> flip
    while rng_flip.random() <= 0.5:
        rng_flip = np.random.default_rng(int(rng_flip.integers(1 << 30)))
    # fetch flipped and unflipped variants
    img_f, thumb_f = ds.__getitem__(0, np.random.default_rng(3))
    ds2 = MultiResolutionDataset(store, resolution=32, nerf_resolution=32, hflip=False)
    img0, _ = ds2[0]
    # thumb at same resolution as img -> when flipped, thumb == flipped img
    if not np.allclose(img_f, img0):
        np.testing.assert_allclose(img_f, img0[:, ::-1])
        np.testing.assert_allclose(thumb_f, img_f, atol=2e-2)
    ds.close()
    ds2.close()


# ------------------------------------------------------------ marching cubes
def test_marching_cubes_sphere_closed():
    n = 32
    lin = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    sdf = np.sqrt(x**2 + y**2 + z**2) - 0.5
    verts, faces = marching_cubes(sdf, 0.0)
    assert len(verts) > 100 and len(faces) > 100
    world = verts / (n - 1) * 2 - 1
    r = np.linalg.norm(world, axis=1)
    assert abs(float(r.mean()) - 0.5) < 0.02
    assert float(r.std()) < 0.01
    # closed surface: each edge shared by exactly two triangles
    from collections import Counter

    edges = Counter()
    for f in faces:
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            edges[(min(a, b), max(a, b))] += 1
    assert set(edges.values()) == {2}


def test_extract_mesh_scaling_and_export(tmp_path):
    n = 24
    lin = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    sdf = (np.sqrt(x**2 + y**2 + z**2) - 0.5)[None, ..., None]
    mesh = extract_mesh_with_marching_cubes(sdf)
    # verts centered at 0, max extent ~ 0.24 * 0.25 (r=0.5 of [-1,1] range)
    assert np.abs(mesh.verts.mean(0)).max() < 0.02
    assert np.abs(mesh.verts).max() < 0.12
    obj = str(tmp_path / "m.obj")
    ply = str(tmp_path / "m.ply")
    mesh.export_obj(obj)
    mesh.export_ply(ply)
    assert os.path.getsize(obj) > 100
    assert os.path.getsize(ply) > 100
    # obj roundtrip line count
    lines = open(obj).read().splitlines()
    assert sum(l.startswith("v ") for l in lines) == len(mesh.verts)
    assert sum(l.startswith("f ") for l in lines) == len(mesh.faces)


def test_align_volume_identity_center():
    """The depth-center plane (adjust ~ mid) only rescales xy; the far
    plane (adjust == 1) is passed through unchanged."""
    import jax.numpy as jnp

    b, h, w, d, c = 1, 9, 9, 5, 1
    vol = np.random.default_rng(0).standard_normal((b, h, w, d, c)).astype(np.float32)
    out = np.asarray(align_volume(jnp.asarray(vol)))
    assert out.shape == vol.shape
    # last depth slice has adjustment coeff exactly 1 -> identity there
    np.testing.assert_allclose(out[0, :, :, -1, 0], vol[0, :, :, -1, 0], atol=1e-5)
    assert np.all(np.isfinite(out))


def test_xyz2mesh_grid():
    h = w = 8
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    xyz = np.stack([xx, yy, np.zeros_like(xx)], -1)[None]
    mesh = xyz2mesh(xyz)
    assert mesh.verts.shape == (64, 3)
    assert mesh.faces.shape[1] == 3 and len(mesh.faces) >= 2 * (h - 1) * (w - 1) - 2


# ------------------------------------------------------ noise projection
def test_rasterizer_covers_triangle():
    from sdface_gan_tpu.native import raster_mesh

    verts = np.array([[2.0, 2.0, 1.0], [14.0, 2.0, 1.0], [2.0, 14.0, 1.0]],
                     np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    attr, depth = raster_mesh(verts, faces, np.array([1.0, 2.0, 3.0], np.float32),
                              16, 16)
    valid = depth < 1e29
    assert 40 < valid.sum() < 100  # half of a 12x12 bbox
    # attribute interpolates within the vertex range
    vals = attr[valid]
    assert vals.min() >= 1.0 - 1e-4 and vals.max() <= 3.0 + 1e-4
    # nearer triangle wins the z-buffer
    verts2 = np.vstack([verts, verts * np.array([1, 1, 0.5])])
    faces2 = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    attr2, depth2 = raster_mesh(verts2, faces2,
                                np.array([1, 2, 3, 9, 9, 9], np.float32), 16, 16)
    assert np.allclose(attr2[depth2 < 1e29], 9.0)


def test_noise_projection_anchored_to_surface():
    from sdface_gan_tpu.geometry.mesh import Mesh
    from sdface_gan_tpu.models.noise_projection import NoiseProjector, subdivide
    from sdface_gan_tpu.geometry.cameras import generate_camera_params
    import jax.numpy as jnp

    # sphere mesh at the face-volume scale (world radius ~0.1)
    n = 24
    lin = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    from sdface_gan_tpu.native import marching_cubes

    verts, faces = marching_cubes(np.sqrt(x**2 + y**2 + z**2) - 0.6, 0.0)
    verts = (verts / (n - 1) * 2 - 1) * 0.1
    mesh = Mesh(verts=verts, faces=faces.astype(np.int32))

    proj = NoiseProjector(mesh, seed=0)
    cams = generate_camera_params(64, None, batch=1,
                                  locations=jnp.zeros((1, 2)))
    extr = np.asarray(cams.extrinsics[0])
    n1 = proj.project(extr, 64)
    n2 = proj.project(extr, 64)
    # deterministic for the same camera
    np.testing.assert_allclose(n1, n2)
    assert n1.shape == (64, 64, 1)
    # the sphere should cover a central region of the frame
    center = n1[24:40, 24:40, 0]
    edge = n1[:4, :4, 0]
    assert np.std(center) > 0  # projected vertex noise present

    # subdivision quadruples faces
    v2, f2 = subdivide(mesh.verts, mesh.faces)
    assert len(f2) == 4 * len(mesh.faces)
    assert len(v2) > len(mesh.verts)
