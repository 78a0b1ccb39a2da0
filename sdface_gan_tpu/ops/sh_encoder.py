"""Real spherical-harmonics direction encoding.

TPU-native equivalent of the reference CUDA op
(``im2scene/sdf/models/shencoder/src/shencoder.cu``; wrapper
``sphere_harmonics.py:61-86``): encodes unit-cube direction vectors into
the first ``degree**2`` real SH basis values.

A custom kernel buys nothing on TPU — the closed-form polynomials are a
handful of VPU ops that XLA fuses straight into the consuming matmul, and
the analytic input gradient the CUDA op hand-codes falls out of autodiff.

Degrees 1..4 (the reference always uses degree=4 at
``sdf_model.py:1512-1531``) are implemented; constants are the standard
real-SH normalizations, validated against scipy in tests/test_ops_sh.py.
"""

from __future__ import annotations

import jax.numpy as jnp

MAX_DEGREE = 4


def sh_encode(dirs: jnp.ndarray, degree: int = 4, size: float = 1.0) -> jnp.ndarray:
    """Encode directions into real SH basis values.

    Args:
      dirs: [..., 3] directions in [-size, size]^3 (typically unit vectors).
      degree: number of SH bands; output has ``degree**2`` channels.
      size: input half-range (reference divides inputs by ``size``).

    Returns:
      [..., degree**2] basis values.
    """
    if not (1 <= degree <= MAX_DEGREE):
        raise NotImplementedError(
            f"sh_encode supports degree in [1, {MAX_DEGREE}], got {degree}"
        )
    d = dirs / size
    x, y, z = d[..., 0], d[..., 1], d[..., 2]

    comps = [jnp.full_like(x, 0.28209479177387814)]  # l=0
    if degree >= 2:  # l=1
        comps += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:  # l=2
        xy, yz, xz = x * y, y * z, x * z
        x2, y2, z2 = x * x, y * y, z * z
        comps += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (x2 - y2),
        ]
    if degree >= 4:  # l=3
        x2, y2, z2 = x * x, y * y, z * z
        comps += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * x * y * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    return jnp.stack(comps, axis=-1)


def sh_output_dim(degree: int) -> int:
    return degree * degree
