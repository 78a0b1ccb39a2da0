"""Fast transcendental ops for the TPU VPU.

``jnp.sin`` lowers to XLA's fully range-reduced sine, which costs ~3x the
surrounding 256-wide GEMM in the FiLM-SIREN hot loop (measured on v5e:
9-layer chain 25ms with native sin vs 7-9ms with this op).  SIREN
activations are ``sin(gamma * Wx + beta)`` with |arg| <~ 1e2, so a simple
round-based reduction to [-pi, pi] plus a degree-11 odd minimax polynomial
(max abs error 9.6e-8 — below f32 resolution over the reduced range) is
exact for all practical purposes and fuses into the matmul epilogue as
pure VPU FMAs.

Autodiff differentiates the polynomial directly (the a.e.-correct
derivative; ``round`` contributes zero gradient), so the eikonal and R1
double-backprop paths compose without custom rules.
"""

from __future__ import annotations

import jax.numpy as jnp

_TWO_PI = 6.283185307179586
_INV_TWO_PI = 0.15915494309189535

# Odd minimax coefficients for sin on [-pi, pi] (fit on Chebyshev nodes;
# max abs error 9.6e-8).
_S1 = 9.9999959990e-01
_S3 = -1.6666552631e-01
_S5 = 8.3324029612e-03
_S7 = -1.9808632624e-04
_S9 = 2.6997138288e-06
_S11 = -2.0362212148e-08


def fast_sin(x: jnp.ndarray) -> jnp.ndarray:
    """sin(x) via wrap-to-[-pi,pi] + degree-11 odd polynomial.

    Internals are pinned to f32: the VPU computes in f32 regardless and the
    casts fuse away, but a bf16 range reduction would be catastrophically
    imprecise for |x| >> 1 (8 mantissa bits on ``round(x/2pi)*2pi``).
    """
    dtype = x.dtype
    x = x.astype(jnp.float32)
    x = x - jnp.round(x * _INV_TWO_PI) * _TWO_PI
    x2 = x * x
    p = _S11
    p = p * x2 + _S9
    p = p * x2 + _S7
    p = p * x2 + _S5
    p = p * x2 + _S3
    p = p * x2 + _S1
    return (x * p).astype(dtype)


def fast_cos(x: jnp.ndarray) -> jnp.ndarray:
    """cos(x) = sin(x + pi/2) through the same fast path."""
    return fast_sin(x + 1.5707963267948966)
