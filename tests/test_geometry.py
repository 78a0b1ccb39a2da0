import math

import jax
import jax.numpy as jnp
import numpy as np

from sdface_gan_tpu.geometry import (
    generate_camera_params,
    get_rays,
    points_along_rays,
    sample_depths,
    z_normalize_points,
)


def test_camera_params_shapes_and_intrinsics():
    cams = generate_camera_params(64, jax.random.PRNGKey(0), batch=4)
    assert cams.extrinsics.shape == (4, 3, 4)
    assert cams.focal.shape == (4, 1, 1)
    assert cams.near.shape == (4, 1, 1)
    # focal = 0.5 * res / tan(fov) with fov 6 degrees (sdf_utils.py:109)
    expected = 0.5 * 64 / math.tan(6 * math.pi / 180)
    np.testing.assert_allclose(np.asarray(cams.focal), expected, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cams.near), 0.88, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cams.far), 1.12, rtol=1e-6)


def test_camera_rotation_is_orthonormal_and_looks_at_origin():
    cams = generate_camera_params(64, jax.random.PRNGKey(3), batch=8)
    r = np.asarray(cams.extrinsics[:, :, :3])
    eye = np.einsum("bij,bkj->bik", r, r)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    # camera location is on the unit sphere
    t = np.asarray(cams.extrinsics[:, :, 3])
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, rtol=1e-5)
    # the -z camera axis points at the origin: z_col == normalize(t)
    z_col = r[:, :, 2]
    np.testing.assert_allclose(z_col, t / np.linalg.norm(t, axis=-1, keepdims=True), atol=1e-5)


def test_camera_sweep_mode():
    cams = generate_camera_params(64, jax.random.PRNGKey(0), batch=2, sweep=True)
    assert cams.extrinsics.shape == (16, 3, 4)
    azims = np.asarray(cams.viewpoint[:8, 0])
    np.testing.assert_allclose(azims, np.linspace(-0.3, 0.3, 8), atol=1e-6)
    # same elevation within an identity
    elevs = np.asarray(cams.viewpoint[:8, 1])
    assert np.allclose(elevs, elevs[0])


def test_camera_locations_override():
    locs = jnp.array([[0.1, 0.05], [-0.2, 0.0]])
    cams = generate_camera_params(128, locations=locs)
    np.testing.assert_allclose(np.asarray(cams.viewpoint), np.asarray(locs), atol=1e-6)


def test_ray_directions_center_pixel():
    """The central ray of an identity camera at (0,0,1) looks along -z."""
    cams = generate_camera_params(64, locations=jnp.zeros((1, 2)))
    rays = get_rays(cams.focal, cams.extrinsics, 64)
    assert rays.directions.shape == (1, 64, 64, 3)
    # center 4 pixels average direction ~ (0, 0, -1)
    center = np.array(rays.directions[0, 31:33, 31:33].mean((0, 1)))
    center = center / np.linalg.norm(center)
    np.testing.assert_allclose(center, [0, 0, -1], atol=1e-2)
    np.testing.assert_allclose(np.asarray(rays.origins[0, 0, 0]), [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rays.viewdirs), axis=-1), 1.0, rtol=1e-5
    )


def test_depth_sampling_bounds_and_monotonicity():
    near = jnp.full((2, 4, 4, 1), 0.88)
    far = jnp.full((2, 4, 4, 1), 1.12)
    for offset in (True, False):
        z = sample_depths(near, far, 24, jax.random.PRNGKey(0), offset_sampling=offset)
        assert z.shape == (2, 4, 4, 24)
        zn = np.asarray(z)
        assert zn.min() >= 0.88 - 1e-6 and zn.max() <= 1.12 + 1e-6
        assert np.all(np.diff(zn, axis=-1) > 0)

    # deterministic when perturb = 0
    z0 = sample_depths(near, far, 24, None, offset_sampling=True, perturb=0.0)
    t = np.linspace(0, 1 - 1 / 24, 24)
    np.testing.assert_allclose(np.asarray(z0[0, 0, 0]), 0.88 * (1 - t) + 1.12 * t, rtol=1e-6)


def test_points_and_z_normalize():
    cams = generate_camera_params(16, locations=jnp.zeros((1, 2)))
    rays = get_rays(cams.focal, cams.extrinsics, 16)
    near = cams.near[:, None] * jnp.ones_like(rays.directions[..., :1])
    far = cams.far[:, None] * jnp.ones_like(rays.directions[..., :1])
    z = sample_depths(near, far, 8, None, perturb=0.0)
    pts = points_along_rays(rays.origins, rays.directions, z)
    assert pts.shape == (1, 16, 16, 8, 3)
    # points should hover near the origin (within ~0.2 for fov 6, radius .12)
    assert float(jnp.abs(pts).max()) < 0.3
    npts = z_normalize_points(pts, near, far)
    # normalized z coordinate within ~[-1, 1]
    assert float(jnp.abs(npts[..., 2]).max()) <= 1.0 + 1e-4
