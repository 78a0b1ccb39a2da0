"""Unit tests for the named TPU ops against independent references.

Golden references:
  * fused_leaky_relu / upfirdn2d: straight numpy re-derivations of the
    reference's CPU fallbacks (sdf_op.py:105-117, 273-314).
  * sh_encode: scipy real spherical harmonics (convention-adjusted).
  * hash_encode: a naive numpy reimplementation of the CUDA kernel math.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdface_gan_tpu.ops import (
    HashGridSpec,
    fused_leaky_relu,
    hash_encode,
    init_hash_table,
    make_kernel,
    sh_encode,
    upfirdn2d,
)


# ---------------------------------------------------------------- fused act
def test_fused_leaky_relu_matches_reference_semantics():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 5, 8)).astype(np.float32)
    b = rng.standard_normal((8,)).astype(np.float32)
    out = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
    ref = x + b.reshape(1, 1, 1, 8)
    ref = np.where(ref >= 0, ref, 0.2 * ref) * math.sqrt(2.0)
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_fused_leaky_relu_scale1():
    x = jnp.array([-1.0, 2.0])
    out = fused_leaky_relu(x, None, scale=1.0)
    np.testing.assert_allclose(np.asarray(out), [-0.2, 2.0], rtol=1e-6)


# ---------------------------------------------------------------- upfirdn2d
def _upfirdn2d_numpy(x_nhwc, kernel, up, down, pad0, pad1):
    """Direct numpy port of the reference upfirdn2d_native (sdf_op.py:273-314)."""
    b, h, w, c = x_nhwc.shape
    kh, kw = kernel.shape
    x = np.transpose(x_nhwc, (0, 3, 1, 2)).reshape(-1, h, w)
    # zero-stuff
    up_out = np.zeros((x.shape[0], h * up, w * up), x.dtype)
    up_out[:, ::up, ::up] = x
    # pad (supports negative = crop)
    ph0, ph1, pw0, pw1 = pad0, pad1, pad0, pad1
    padded = np.pad(
        up_out,
        ((0, 0), (max(ph0, 0), max(ph1, 0)), (max(pw0, 0), max(pw1, 0))),
    )
    padded = padded[
        :,
        max(-ph0, 0) : padded.shape[1] - max(-ph1, 0),
        max(-pw0, 0) : padded.shape[2] - max(-pw1, 0),
    ]
    # correlate with flipped kernel == convolve
    kf = kernel[::-1, ::-1]
    oh = padded.shape[1] - kh + 1
    ow = padded.shape[2] - kw + 1
    out = np.zeros((padded.shape[0], oh, ow), x.dtype)
    for i in range(kh):
        for j in range(kw):
            out += kf[i, j] * padded[:, i : i + oh, j : j + ow]
    out = out[:, ::down, ::down]
    return np.transpose(out.reshape(b, c, out.shape[1], out.shape[2]), (0, 2, 3, 1))


@pytest.mark.parametrize(
    "up,down,pad",
    [(1, 1, (2, 1)), (2, 1, (2, 1)), (1, 2, (2, 1)), (2, 2, (1, 1)), (1, 1, (0, 0))],
)
def test_upfirdn2d_matches_native(up, down, pad):
    rng = np.random.default_rng(42)
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    k = np.asarray(make_kernel([1.0, 3.0, 3.0, 1.0]))
    out = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=up, down=down, pad=pad))
    ref = _upfirdn2d_numpy(x, np.asarray(k), up, down, pad[0], pad[1])
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_upfirdn2d_gradients_flow():
    k = make_kernel([1.0, 3.0, 3.0, 1.0]) * 4  # upsample kernel
    f = lambda x: jnp.sum(upfirdn2d(x, k, up=2, down=1, pad=(2, 1)) ** 2)
    x = jnp.ones((1, 4, 4, 2))
    g = jax.grad(f)(x)
    assert g.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(g)))


# ---------------------------------------------------------------- SH encode
@pytest.mark.parametrize("degree", list(range(1, 9)))
def test_sh_encode_against_scipy(degree):
    """All degrees 1..8 (reference shencoder supports degree <= 8,
    sphere_harmonics.py:70) against scipy's spherical harmonics.

    The encoder's convention equals sqrt(2) * Re/Im of scipy's
    Condon-Shortley-phased complex Y_l^{|m|} (torch-ngp shencoder.cu
    convention: band 1 is (-y, z, -x)), components ordered m = -l..l."""
    scipy = pytest.importorskip("scipy.special")
    rng = np.random.default_rng(1)
    d = rng.standard_normal((64, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = np.asarray(sh_encode(jnp.asarray(d), degree=degree))
    assert out.shape == (64, degree * degree)

    theta = np.arccos(np.clip(d[:, 2], -1, 1))
    phi = np.arctan2(d[:, 1], d[:, 0])

    def real_sh(l, m):
        # scipy >= 1.15 renamed sph_harm(m, l, phi, theta) ->
        # sph_harm_y(l, m, theta, phi).
        if hasattr(scipy, "sph_harm_y"):
            sh = scipy.sph_harm_y(l, abs(m), theta, phi)
        else:
            sh = scipy.sph_harm(abs(m), l, phi, theta)
        if m > 0:
            return np.sqrt(2) * sh.real
        if m < 0:
            return np.sqrt(2) * sh.imag
        return sh.real

    i = 0
    for l in range(degree):
        for m in range(-l, l + 1):
            np.testing.assert_allclose(
                out[:, i], real_sh(l, m), rtol=1e-4, atol=2e-6,
                err_msg=f"degree={degree} l={l} m={m}",
            )
            i += 1


def test_sh_encode_degree4_closed_form():
    rng = np.random.default_rng(1)
    d = rng.standard_normal((64, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = np.asarray(sh_encode(jnp.asarray(d), degree=4))
    x, y, z = d[:, 0], d[:, 1], d[:, 2]
    np.testing.assert_allclose(out[:, 0], 0.28209479177387814, rtol=1e-5)
    np.testing.assert_allclose(out[:, 1], -0.48860251190291987 * y, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(out[:, 2], 0.48860251190291987 * z, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(out[:, 6], 0.94617469575755997 * z**2 - 0.31539156525251999, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(out[:, 4], 1.0925484305920792 * x * y, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(out[:, 10], 2.8906114426405538 * x * y * z, rtol=1e-4, atol=1e-6)


def test_sh_encode_shapes_and_grad():
    d = jnp.ones((2, 4, 3)) / math.sqrt(3.0)
    out = sh_encode(d, degree=4)
    assert out.shape == (2, 4, 16)
    g = jax.grad(lambda v: jnp.sum(sh_encode(v, 4) ** 2))(d)
    assert g.shape == d.shape


# -------------------------------------------------------------- hash encode
_PRIMES = (1, 2654435761, 805459861)


def _hash_encode_numpy(x, table, spec, bound):
    """Naive numpy port of kernel_grid (gridencoder.cu:88-200)."""
    x01 = (x + bound) / (2 * bound)
    n = x01.shape[0]
    out = np.zeros((n, spec.num_levels * spec.level_dim), np.float32)
    for i in range(n):
        if np.any(x01[i] < 0) or np.any(x01[i] > 1):
            continue
        for lvl in range(spec.num_levels):
            scale = spec.level_scale(lvl)
            res = spec.level_resolution(lvl)
            side = res if spec.align_corners else res + 1
            size = spec.level_table_size(lvl)
            pos = x01[i] * scale + (0.0 if spec.align_corners else 0.5)
            pg = np.floor(pos).astype(np.uint64)
            frac = pos - np.floor(pos)
            acc = np.zeros(spec.level_dim, np.float32)
            for c in range(8):
                w = 1.0
                corner = pg.copy()
                for d in range(3):
                    if (c >> d) & 1:
                        corner[d] += 1
                        w *= frac[d]
                    else:
                        w *= 1 - frac[d]
                if side**3 > size:
                    idx = np.uint32(0)
                    for d in range(3):
                        idx ^= np.uint32((int(corner[d]) * _PRIMES[d]) & 0xFFFFFFFF)
                else:
                    idx = np.uint32(corner[0] + corner[1] * side + corner[2] * side * side)
                idx = int(idx) % size
                acc += w * table[spec.offsets[lvl] + idx]
            out[i, lvl * spec.level_dim : (lvl + 1) * spec.level_dim] = acc
    return out


def test_hash_spec_offsets_match_reference_layout():
    spec = HashGridSpec.create(desired_resolution=4096)
    # per_level_scale from desired resolution (grid.py:100-102)
    assert abs(spec.per_level_scale - 2 ** (math.log2(4096 / 16) / 15)) < 1e-12
    # first level: res 16 -> (16+1)^3 = 4913 -> ceil to 8 -> 4920
    assert spec.offsets[1] - spec.offsets[0] == int(np.ceil(17**3 / 8) * 8)
    # hashed levels capped at 2^19
    assert spec.level_table_size(spec.num_levels - 1) == 2**19
    assert spec.output_dim == 32


def test_hash_encode_matches_numpy():
    spec = HashGridSpec.create(num_levels=4, base_resolution=4, desired_resolution=64)
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, spec, std=1.0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-2.0, maxval=2.0)
    out = np.asarray(hash_encode(x, table, spec, bound=2.0))
    ref = _hash_encode_numpy(np.asarray(x), np.asarray(table), spec, 2.0)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-5)


def test_hash_encode_oob_zero():
    spec = HashGridSpec.create(num_levels=2, base_resolution=4, desired_resolution=8)
    table = init_hash_table(jax.random.PRNGKey(0), spec, std=1.0)
    x = jnp.array([[3.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    out = hash_encode(x, table, spec, bound=2.0)
    assert bool(jnp.all(out[0] == 0.0))
    assert not bool(jnp.all(out[1] == 0.0))


def test_hash_encode_grads():
    """Both table grads (scatter-add) and input grads (eikonal path) exist."""
    spec = HashGridSpec.create(num_levels=4, base_resolution=4, desired_resolution=64)
    table = init_hash_table(jax.random.PRNGKey(0), spec, std=1.0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-0.9, maxval=0.9)

    gt = jax.grad(lambda t: jnp.sum(hash_encode(x, t, spec) ** 2))(table)
    assert gt.shape == table.shape
    assert float(jnp.sum(jnp.abs(gt))) > 0

    gx = jax.grad(lambda v: jnp.sum(hash_encode(v, table, spec) ** 2))(x)
    assert gx.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(gx)))

    # finite-difference check of input grads along one coordinate
    def f(v):
        return float(jnp.sum(hash_encode(v, table, spec) ** 2))

    eps = 1e-3
    x0 = np.asarray(x)
    dx = np.zeros_like(x0)
    dx[3, 1] = eps
    fd = (f(jnp.asarray(x0 + dx)) - f(jnp.asarray(x0 - dx))) / (2 * eps)
    np.testing.assert_allclose(fd, float(gx[3, 1]), rtol=5e-2, atol=1e-3)


def test_hash_encode_vjp_sorted_matches_autodiff():
    """The sort+segment-sum table gradient (bench_ngp.py candidate
    backward) must equal autodiff's scatter-add exactly, incl. OOB points
    and duplicate hash collisions."""
    from sdface_gan_tpu.ops import hash_encode_vjp_sorted

    # tiny hash table forces collisions (duplicate keys in one segment)
    spec = HashGridSpec.create(
        num_levels=4, base_resolution=4, desired_resolution=64, log2_hashmap_size=7
    )
    table = init_hash_table(jax.random.PRNGKey(0), spec, std=1.0)
    # include OOB points (|x| > bound=1) — their cotangent must be dropped
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1.3, maxval=1.3)
    cot = jax.random.normal(jax.random.PRNGKey(2), (64, spec.output_dim))

    ref = jax.grad(lambda t: jnp.vdot(hash_encode(x, t, spec), cot))(table)
    got = hash_encode_vjp_sorted(x, table, spec, cot)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    # batched-prefix shapes flatten identically
    got2 = hash_encode_vjp_sorted(
        x.reshape(4, 16, 3), table, spec, cot.reshape(4, 16, -1)
    )
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_hash_table_total_variation():
    """TV regularizer (differentiable analog of kernel_grad_tv,
    gridencoder.cu:507): zero on a constant table, positive and
    differentiable on a random one, and smaller for smoother tables."""
    from sdface_gan_tpu.ops import hash_table_total_variation

    spec = HashGridSpec.create(num_levels=4, base_resolution=4, desired_resolution=64)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-0.9, maxval=0.9)

    const = jnp.ones_like(init_hash_table(jax.random.PRNGKey(0), spec))
    assert float(hash_table_total_variation(const, spec, x)) == 0.0

    rough = init_hash_table(jax.random.PRNGKey(0), spec, std=1.0)
    tv_rough = float(hash_table_total_variation(rough, spec, x))
    tv_smooth = float(hash_table_total_variation(rough * 0.1, spec, x))
    assert tv_rough > 0
    assert tv_smooth < tv_rough

    g = jax.grad(lambda t: hash_table_total_variation(t, spec, x))(rough)
    assert g.shape == rough.shape
    assert float(jnp.sum(jnp.abs(g))) > 0


# ------------------------------------------------------- fast_sin + pallas
def test_fast_sin_accuracy():
    from sdface_gan_tpu.ops.transcendental import fast_cos, fast_sin

    x = jnp.linspace(-100.0, 100.0, 200001)
    # f32 round-based range reduction loses ~1e-5 at |x|~100 (inherent to
    # f32, not the polynomial)
    np.testing.assert_allclose(
        np.asarray(fast_sin(x)), np.sin(np.asarray(x)), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(fast_cos(x)), np.cos(np.asarray(x)), atol=2e-5
    )


def test_fused_siren_kernel_matches_reference():
    from sdface_gan_tpu.models.siren import (
        SirenConfig,
        apply_siren_generator,
        init_siren_generator,
    )
    from sdface_gan_tpu.ops.siren_kernel import siren_field_fused

    cfg = SirenConfig(depth=3, width=256, style_dim=64)
    p = init_siren_generator(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (2, 700, 3)) * 0.5
    views = jax.random.normal(jax.random.PRNGKey(2), (2, 700, 3))
    style = jax.random.normal(jax.random.PRNGKey(3), (2, 64))
    ref = apply_siren_generator(p, cfg, pts, views, style)
    out = siren_field_fused(p, pts, views, style, depth=3, width=256,
                            interpret=True, dot_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_fused_siren_kernel_bf16_default_quality():
    """The kernel's PRODUCTION configuration (bf16 weight packing and
    point stream — the default dot_dtype) must be at least as close to
    the f32 ground truth as the XLA bf16 path is.

    Element-wise agreement between the two bf16 paths is NOT expected:
    they round at different points (the kernel keeps f32 accumulators;
    the XLA path stores bf16 activations) and the gamma~30 FiLM
    modulation amplifies rounding into sine-phase differences.  Quality
    vs f32 is the meaningful contract.
    """
    from sdface_gan_tpu.models.siren import (
        SirenConfig,
        apply_siren_generator,
        init_siren_generator,
    )
    from sdface_gan_tpu.ops.siren_kernel import siren_field_fused

    cfg = SirenConfig(depth=3, width=256, style_dim=64)
    p = init_siren_generator(jax.random.PRNGKey(0), cfg)
    p16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), p)
    pts = jax.random.normal(jax.random.PRNGKey(1), (2, 700, 3)) * 0.5
    views = jax.random.normal(jax.random.PRNGKey(2), (2, 700, 3))
    style = jax.random.normal(jax.random.PRNGKey(3), (2, 64))
    truth = np.asarray(apply_siren_generator(p, cfg, pts, views, style))
    xla16 = np.asarray(
        apply_siren_generator(p16, cfg, pts, views, style)
    ).astype(np.float32)
    kern16 = np.asarray(
        siren_field_fused(p16, pts, views, style, depth=3, width=256,
                          interpret=True)  # dot_dtype defaults to bf16
    ).astype(np.float32)
    err_xla = np.mean(np.abs(xla16 - truth))
    err_kern = np.mean(np.abs(kern16 - truth))
    assert err_kern <= 1.2 * err_xla + 1e-4, (err_kern, err_xla)
    assert err_kern < 0.05, err_kern


def test_hash_encode_packed_bit_exact():
    """Corner-packed inference tables (ops/hash_encoder.py PackPlan): a
    pure repack of the trained table, so fully-packed output must be
    BIT-exact vs hash_encode, and a partial pack (some levels over budget,
    falling back to the 8-corner gather) must agree too."""
    from sdface_gan_tpu.ops.hash_encoder import (
        hash_encode_packed,
        pack_hash_table,
        plan_packing,
    )

    # small hash table -> top levels hashed with collisions
    spec = HashGridSpec.create(
        num_levels=4, base_resolution=4, desired_resolution=64, log2_hashmap_size=7
    )
    table = init_hash_table(jax.random.PRNGKey(0), spec, std=1.0)
    # include OOB points: packed path must zero them identically
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3), minval=-1.2, maxval=1.2)
    ref = np.asarray(hash_encode(x, table, spec))

    # full pack, f32: bit-exact
    plan = plan_packing(spec, max_bytes=1 << 30, bytes_per_el=4)
    assert plan.packed_levels == (0, 1, 2, 3)
    packed = pack_hash_table(table, plan, dtype=jnp.float32)
    got = np.asarray(hash_encode_packed(x, table, packed, plan))
    np.testing.assert_array_equal(got, ref)

    # partial pack (budget covers only the small levels) + mixed fallback
    small = plan_packing(spec, max_bytes=30_000, bytes_per_el=4)
    assert 0 < len(small.packed_levels) < spec.num_levels
    packed_s = pack_hash_table(table, small, dtype=jnp.float32)
    got_s = np.asarray(hash_encode_packed(x, table, packed_s, small))
    np.testing.assert_array_equal(got_s, ref)

    # bf16 pack: serving precision, tolerance-level agreement
    packed_h = pack_hash_table(table, plan, dtype=jnp.bfloat16)
    got_h = np.asarray(hash_encode_packed(x, table, packed_h, plan))
    np.testing.assert_allclose(got_h, ref, rtol=2e-2, atol=2e-2)
