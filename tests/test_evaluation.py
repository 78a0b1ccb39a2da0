"""FID/KID machinery tests (architecture shapes + metric math).

No pretrained Inception weights ship in this environment (zero egress);
these tests validate the network's structure and the statistics pipeline.
Numerical parity with pytorch-fid is a weight-import concern
(``import_torch_state_dict``) exercised when a checkpoint is provided.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdface_gan_tpu.evaluation import (
    calculate_activation_statistics,
    calculate_frechet_distance,
    calculate_kid,
    compute_activations,
    fid_from_activations,
    load_stats_npz,
)
from sdface_gan_tpu.evaluation.inception import (
    POOL3_DIM,
    inception_pool3,
    init_inception,
)


@pytest.fixture(scope="module")
def inc_params():
    return init_inception(jax.random.PRNGKey(0))


def test_inception_pool3_shape(inc_params):
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 299, 299, 3)) * 2 - 1
    acts = inception_pool3(inc_params, x, resize_input=False)
    assert acts.shape == (2, POOL3_DIM)
    assert bool(jnp.all(jnp.isfinite(acts)))


def test_compute_activations_batching(inc_params):
    imgs = [np.random.default_rng(i).uniform(-1, 1, (3, 75, 75, 3)).astype(np.float32)
            for i in range(3)]
    acts = compute_activations(inc_params, imgs, batch_size=4)
    assert acts.shape == (9, POOL3_DIM)


def test_fused_on_device_scoring_matches_streaming(inc_params):
    """eval.py --no_dump fuses generation + inception in one program; its
    activations must equal the streaming path's (generate, transfer,
    re-feed) for identical images — the fusion is a transfer optimization,
    not a numerical change."""
    imgs = np.random.default_rng(0).uniform(-1, 1, (4, 32, 32, 3)).astype(
        np.float32
    )
    streamed = compute_activations(inc_params, [imgs], batch_size=4)
    fused = np.asarray(
        jax.jit(lambda p, x: inception_pool3(p, x))(inc_params, imgs)
    )
    np.testing.assert_allclose(fused, streamed, rtol=1e-4, atol=1e-4)


def test_frechet_distance_identity_and_shift():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((500, 16))
    mu, sigma = calculate_activation_statistics(a)
    assert calculate_frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)
    # pure mean shift: FID == ||delta||^2
    delta = np.full(16, 0.5)
    d = calculate_frechet_distance(mu, sigma, mu + delta, sigma)
    assert d == pytest.approx(float(delta @ delta), rel=1e-4)


def test_fid_orders_distributions():
    rng = np.random.default_rng(1)
    base = rng.standard_normal((800, 32))
    near = rng.standard_normal((800, 32)) * 1.05
    far = rng.standard_normal((800, 32)) + 3.0
    assert fid_from_activations(base, near) < fid_from_activations(base, far)


def test_kid_orders_distributions():
    rng = np.random.default_rng(2)
    base = rng.standard_normal((400, 32))
    same = rng.standard_normal((400, 32))
    far = rng.standard_normal((400, 32)) + 2.0
    kid_same, _ = calculate_kid(base, same, n_subsets=10, subset_size=100)
    kid_far, _ = calculate_kid(base, far, n_subsets=10, subset_size=100)
    assert kid_same < kid_far
    assert kid_same == pytest.approx(0.0, abs=0.05)


def test_stats_npz_roundtrip(tmp_path):
    mu = np.arange(4.0)
    sigma = np.eye(4)
    p = str(tmp_path / "stats.npz")
    np.savez(p, mu=mu, sigma=sigma)
    mu2, s2 = load_stats_npz(p)
    np.testing.assert_allclose(mu2, mu)
    np.testing.assert_allclose(s2, sigma)
