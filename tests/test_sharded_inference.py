"""Sharded inference-surface parity: the production eval/sdf_mesh/serving
paths now run data-parallel (VERDICT r2 task 3) — outputs on the 8-device
mesh must equal single-device outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdface_gan_tpu.geometry import generate_camera_params
from sdface_gan_tpu.models.generator import (
    GeneratorConfig,
    generator_forward,
    init_generator,
    map_style,
)
from sdface_gan_tpu.models.renderer import RendererConfig
from sdface_gan_tpu.parallel import data_parallel_jit, make_mesh, replicate

GCFG = GeneratorConfig(
    size=16, style_dim=16, full_pipeline=True, channel_multiplier=1,
    renderer=RendererConfig(type="sdf", out_im_res=8, n_samples=4,
                            style_dim=16, width=16, depth=1, perturb=0.0),
)

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@needs_mesh
def test_eval_sampling_mesh_matches_single_device():
    """The eval.py generation path: batch-sharded z/cams, replicated params."""
    params = init_generator(jax.random.PRNGKey(0), GCFG)
    z = jax.random.normal(jax.random.PRNGKey(1), (8, GCFG.style_dim))
    cams = generate_camera_params(8, jax.random.PRNGKey(2), batch=8)

    def _sample(p, z, extr, focal, near, far):
        out = generator_forward(p, GCFG, [z], extr, focal, near, far,
                                randomize_noise=False)
        return out.rgb

    ref = jax.jit(_sample)(params, z, cams.extrinsics, cams.focal,
                           cams.near, cams.far)
    mesh = make_mesh()
    sharded = data_parallel_jit(_sample, mesh, batch_argnums=(1, 2, 3, 4, 5))
    out = sharded(replicate(params, mesh), z, cams.extrinsics, cams.focal,
                  cams.near, cams.far)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


@needs_mesh
def test_surface_probe_ray_sharded_matches_single_device():
    """The sdf_mesh.py 128^3-probe path (shrunk): truncated mapped style ->
    render_ray_sharded with return_sdf/return_xyz vs the plain renderer."""
    from sdface_gan_tpu.models.renderer import render
    from sdface_gan_tpu.parallel.rays import render_ray_sharded

    surf = RendererConfig(type="sdf", out_im_res=16, n_samples=8,
                          style_dim=16, width=16, depth=1, perturb=0.0,
                          static_viewdirs=True, return_sdf=True,
                          return_xyz=True)
    gcfg = GeneratorConfig(size=16, style_dim=16, full_pipeline=False,
                           renderer=surf)
    params = init_generator(jax.random.PRNGKey(0), gcfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 16))
    style = map_style(params, z)
    front = generate_camera_params(16, None, batch=1,
                                   locations=jnp.zeros((1, 2)))

    ref = render(params["renderer"], surf, front.focal, front.extrinsics,
                 front.near, front.far, style)
    mesh = make_mesh()
    out = jax.jit(lambda: render_ray_sharded(
        params["renderer"], surf, front.focal, front.extrinsics, front.near,
        front.far, style, mesh))()
    assert out.sdf is not None and out.xyz is not None and out.mask is not None
    np.testing.assert_allclose(np.asarray(out.sdf), np.asarray(ref.sdf),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.xyz), np.asarray(ref.xyz),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.mask), np.asarray(ref.mask),
                               rtol=1e-3, atol=1e-4)


@needs_mesh
def test_serving_sampler_accepts_mesh():
    """SDFaceSampler(mesh=...) shards the sample batch and matches the
    single-device sampler bit-for-tolerance."""
    from sdface_gan_tpu.serving import SDFaceSampler

    params = init_generator(jax.random.PRNGKey(0), GCFG)
    single = SDFaceSampler(params, GCFG, batch=8, truncation=0.7)
    mesh = make_mesh()
    sharded = SDFaceSampler(params, GCFG, batch=8, truncation=0.7, mesh=mesh)
    a = single.sample(seed=3)
    b = sharded.sample(seed=3)
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-4)

    with pytest.raises(ValueError, match="divide"):
        SDFaceSampler(params, GCFG, batch=3, mesh=mesh)
