"""Double-backprop goldens vs torch autograd: the R1 and path-length
regularizers' PARAMETER gradients (grad-of-grad) must match the
reference's ``create_graph=True`` formulations
(``im2scene/sdf/models/sdf_losses.py:34-40,53-65``) on shared weights.

SURVEY.md §7 ranks the double-backprop trio as hard part #1; the eikonal
leg is pinned by finite differences and the jvp cross-check
(test_models.py) — these pin the other two against torch itself."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdface_gan_tpu.losses.gan_losses import (  # noqa: E402
    d_logits_and_r1,
    d_r1_loss,
    g_path_regularize,
)

RNG = np.random.default_rng(0)


def test_r1_param_grads_match_torch():
    """d(R1)/d(D params) through the double backprop: conv D, torch
    autograd.grad(create_graph=True) vs our grad-of-vjp closure."""
    w1 = RNG.standard_normal((8, 3, 3, 3)).astype(np.float32) * 0.2
    b1 = RNG.standard_normal((8,)).astype(np.float32) * 0.1
    w2 = RNG.standard_normal((1, 8 * 8 * 8)).astype(np.float32) * 0.05
    x = RNG.standard_normal((4, 3, 8, 8)).astype(np.float32)

    # ---- torch (reference d_r1_loss, sdf_losses.py:34-40)
    tw1 = torch.tensor(w1, requires_grad=True)
    tb1 = torch.tensor(b1, requires_grad=True)
    tw2 = torch.tensor(w2, requires_grad=True)
    tx = torch.tensor(x, requires_grad=True)
    h = F.leaky_relu(F.conv2d(tx, tw1, tb1, padding=1), 0.2)
    pred = F.linear(h.reshape(4, -1), tw2)
    (grad_real,) = torch.autograd.grad(pred.sum(), tx, create_graph=True)
    r1_t = grad_real.pow(2).reshape(4, -1).sum(1).mean()
    r1_t.backward()
    tg = [tw1.grad.numpy(), tb1.grad.numpy(), tw2.grad.numpy()]

    # ---- ours
    params = {"w1": jnp.asarray(w1), "b1": jnp.asarray(b1), "w2": jnp.asarray(w2)}
    xs = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))

    def d_fn(p, img):
        w = jnp.transpose(p["w1"], (2, 3, 1, 0))
        h = jax.lax.conv_general_dilated(
            img, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["b1"]
        h = jax.nn.leaky_relu(h, 0.2)
        # flatten in torch's (c, h, w) order for weight-sharing with tw2
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(4, -1)
        return h @ p["w2"].T

    def r1_of(p):
        return d_r1_loss(lambda img: d_fn(p, img), xs)

    jg = jax.grad(r1_of)(params)
    # the one-forward variant must agree with the plain one
    def r1_of2(p):
        return d_logits_and_r1(lambda img: d_fn(p, img), xs)[1]

    jg2 = jax.grad(r1_of2)(params)

    ours = [np.transpose(np.asarray(jg["w1"]), (0, 1, 2, 3)),
            np.asarray(jg["b1"]), np.asarray(jg["w2"])]
    np.testing.assert_allclose(ours[0], tg[0], rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(ours[1], tg[1], rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(ours[2], tg[2], rtol=2e-3, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jg), jax.tree_util.tree_leaves(jg2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_path_reg_param_grads_match_torch():
    """d(path penalty)/d(G params): torch g_path_regularize (incl. the
    detached running mean, sdf_losses.py:63) vs ours, same noise."""
    B, NL, D, H = 3, 4, 6, 4
    w = RNG.standard_normal((H * H, NL * D)).astype(np.float32) * 0.3
    lat = RNG.standard_normal((B, NL, D)).astype(np.float32)
    noise = (RNG.standard_normal((B, H, H, 1)).astype(np.float32)
             / math.sqrt(H * H))
    mean_pl = 0.37

    # ---- torch (reference g_path_regularize, sdf_losses.py:53-65)
    tw = torch.tensor(w, requires_grad=True)
    tlat = torch.tensor(lat, requires_grad=True)
    timg = torch.tanh(F.linear(tlat.reshape(B, -1), tw)).reshape(B, 1, H, H)
    tnoise = torch.tensor(np.transpose(noise, (0, 3, 1, 2)))
    (grad,) = torch.autograd.grad((timg * tnoise).sum(), tlat, create_graph=True)
    path_lengths = torch.sqrt(grad.pow(2).sum(2).mean(1))
    path_mean = mean_pl + 0.01 * (path_lengths.mean() - mean_pl)
    penalty_t = (path_lengths - path_mean.detach()).pow(2).mean()
    penalty_t.backward()
    tg_w = tw.grad.numpy()

    # ---- ours
    def penalty_of(wj):
        def img_fn(l):
            return jnp.tanh(l.reshape(B, -1) @ wj.T).reshape(B, H, H, 1)

        pen, _, _ = g_path_regularize(
            img_fn, jnp.asarray(lat), jnp.asarray(mean_pl), noise=jnp.asarray(noise)
        )
        return pen

    pen = penalty_of(jnp.asarray(w))
    np.testing.assert_allclose(float(pen), float(penalty_t), rtol=1e-5, atol=1e-7)
    jg_w = jax.grad(penalty_of)(jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(jg_w), tg_w, rtol=2e-4, atol=2e-6)
