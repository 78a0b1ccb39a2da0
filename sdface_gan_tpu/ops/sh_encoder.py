"""Real spherical-harmonics direction encoding.

TPU-native equivalent of the reference CUDA op
(``im2scene/sdf/models/shencoder/src/shencoder.cu``; wrapper
``sphere_harmonics.py:61-86``, which supports degree <= 8): encodes
direction vectors into the first ``degree**2`` real SH basis values.

A custom kernel buys nothing on TPU — the closed-form polynomials are a
handful of VPU ops that XLA fuses straight into the consuming matmul, and
the analytic input gradient the CUDA op hand-codes falls out of autodiff.

Rather than transcribing the CUDA kernel's unrolled polynomial table, the
basis is generated from the standard real-SH recurrences (evaluated on
Python floats at trace time, so the compiled program is still a flat
polynomial per component):

* ``C_m + i S_m = (x + i y)^m`` gives ``sin^m(theta) * (cos, sin)(m phi)``
  as polynomials in x, y;
* semi-normalized associated Legendre values ``P_l^m / sin^m(theta)`` via
  the three-term recurrence in z;
* normalization ``K(l, m) = sqrt((2l+1)/(4 pi) * (l-m)!/(l+m)!)`` with the
  Condon–Shortley phase ``(-1)^m`` (the torch-ngp/shencoder convention:
  band 1 is ``(-y, z, -x)``), components ordered ``m = -l .. l``.

Validated against scipy's spherical harmonics for every degree 1..8 in
``tests/test_ops.py``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

MAX_DEGREE = 8


def _k(l: int, m: int) -> float:
    """SH normalization constant K(l, m)."""
    return math.sqrt(
        (2 * l + 1) / (4.0 * math.pi)
        * math.factorial(l - m) / math.factorial(l + m)
    )


def sh_encode(dirs: jnp.ndarray, degree: int = 4, size: float = 1.0) -> jnp.ndarray:
    """Encode directions into real SH basis values.

    Args:
      dirs: [..., 3] directions in [-size, size]^3 (typically unit vectors).
      degree: number of SH bands (1..8); output has ``degree**2`` channels.
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
    lmax = degree - 1

    # (x + iy)^m: C[m] = sin^m(theta) cos(m phi), S[m] = sin^m(theta) sin(m phi)
    C = [jnp.ones_like(x)]
    S = [jnp.zeros_like(x)]
    for m in range(1, lmax + 1):
        C.append(x * C[m - 1] - y * S[m - 1])
        S.append(x * S[m - 1] + y * C[m - 1])

    # P[(l, m)] = P_l^m(z) / sin^m(theta)  (the sin^m factor lives in C/S),
    # WITHOUT the Condon-Shortley phase (applied in the final assembly):
    #   P_m^m     = (2m-1)!!
    #   P_{m+1}^m = (2m+1) z P_m^m
    #   P_l^m     = ((2l-1) z P_{l-1}^m - (l+m-1) P_{l-2}^m) / (l - m)
    P = {(0, 0): jnp.ones_like(z)}
    for m in range(0, lmax + 1):
        if m > 0:
            P[(m, m)] = (2 * m - 1) * P[(m - 1, m - 1)]
        if m + 1 <= lmax:
            P[(m + 1, m)] = (2 * m + 1) * z * P[(m, m)]
        for l in range(m + 2, lmax + 1):
            P[(l, m)] = (
                (2 * l - 1) * z * P[(l - 1, m)] - (l + m - 1) * P[(l - 2, m)]
            ) / (l - m)

    comps = []
    for l in range(0, lmax + 1):
        for m in range(-l, l + 1):
            am = abs(m)
            if m == 0:
                comps.append(_k(l, 0) * P[(l, 0)])
            else:
                coef = (-1.0) ** am * math.sqrt(2.0) * _k(l, am)
                circ = S[am] if m < 0 else C[am]
                comps.append(coef * circ * P[(l, am)])
    return jnp.stack(comps, axis=-1)


def sh_output_dim(degree: int) -> int:
    return degree * degree
