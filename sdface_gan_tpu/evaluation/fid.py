"""FID + KID computation.

Rebuild of the reference FID core (``im2scene/eval.py:22-192``) with the
broken in-script tail fixed (SURVEY.md §3.2: the reference's ``eval.py``
dereferences a ``None`` fid_dict and reads ``.shape`` off a list; the
operative protocol was an external CLI).  Here the full protocol —
activations -> statistics -> Frechet distance, plus KID (polynomial-kernel
MMD, the ``torch-fidelity`` default the README calls for) — runs
in-process: activations batch on device, statistics on host.
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .inception import inception_pool3


def compute_activations(
    params,
    images: Iterable[np.ndarray],
    batch_size: int = 50,
) -> np.ndarray:
    """pool3 activations for an iterable of [N, H, W, 3] arrays in [-1, 1]."""
    fn = jax.jit(lambda p, x: inception_pool3(p, x))
    outs = []
    pending: list = []
    n_pending = 0

    def flush(chunk: np.ndarray) -> None:
        # accept fp16 host buffers (eval.py stores them to halve RAM)
        outs.append(np.asarray(fn(params, jnp.asarray(chunk, dtype=jnp.float32))))

    for arr in images:
        pending.append(np.asarray(arr))
        n_pending += len(arr)
        while n_pending >= batch_size:
            flat = np.concatenate(pending, axis=0)
            flush(flat[:batch_size])
            rest = flat[batch_size:]
            pending = [rest] if len(rest) else []
            n_pending = len(rest)
    if n_pending:
        flush(np.concatenate(pending, axis=0))
    return np.concatenate(outs, axis=0)


def calculate_activation_statistics(acts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of activations (reference ``eval.py:163-192``)."""
    mu = np.mean(acts, axis=0)
    sigma = np.cov(acts, rowvar=False)
    return mu, sigma


def calculate_frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray,
    mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """Frechet distance with the sqrtm stabilization of the reference
    (``im2scene/eval.py:107-160``): offset the diagonal if sqrtm produces
    non-finite values; strip negligible imaginary parts."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real

    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


def calculate_kid(
    acts1: np.ndarray,
    acts2: np.ndarray,
    n_subsets: int = 100,
    subset_size: int = 1000,
    seed: int = 0,
) -> Tuple[float, float]:
    """Kernel Inception Distance (polynomial kernel MMD^2, torch-fidelity
    defaults: kernel (x.y/d + 1)^3, 100 subsets of 1000).

    Returns (mean, std) across subsets.
    """
    rng = np.random.default_rng(seed)
    n = min(len(acts1), len(acts2))
    m = min(subset_size, n)
    d = acts1.shape[1]
    scores = []
    for _ in range(n_subsets):
        x = acts1[rng.choice(len(acts1), m, replace=False)].astype(np.float64)
        y = acts2[rng.choice(len(acts2), m, replace=False)].astype(np.float64)
        kxx = (x @ x.T / d + 1.0) ** 3
        kyy = (y @ y.T / d + 1.0) ** 3
        kxy = (x @ y.T / d + 1.0) ** 3
        sum_kxx = (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
        sum_kyy = (kyy.sum() - np.trace(kyy)) / (m * (m - 1))
        sum_kxy = kxy.mean()
        scores.append(sum_kxx + sum_kyy - 2 * sum_kxy)
    return float(np.mean(scores)), float(np.std(scores))


def fid_from_activations(acts1: np.ndarray, acts2: np.ndarray) -> float:
    mu1, s1 = calculate_activation_statistics(acts1)
    mu2, s2 = calculate_activation_statistics(acts2)
    return calculate_frechet_distance(mu1, s1, mu2, s2)


def load_stats_npz(
    path: str, expect_img_size: "int | None" = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Load precomputed (mu, sigma) stats (reference ``fid_file`` .npz).

    ``expect_img_size``: the resolution of the images being scored.  Stats
    written by ``calc_fid_stats.py`` record their ``img_size``; comparing
    activations of differently-sized inputs silently produces garbage FID
    (the inception resize path differs), so a recorded mismatch warns.
    """
    with np.load(path) as f:
        if expect_img_size is not None and "img_size" in f:
            stored = int(f["img_size"])
            if stored != expect_img_size:
                import warnings

                warnings.warn(
                    f"FID stats in {path} were computed at img_size={stored} "
                    f"but the scored images are {expect_img_size}px — the "
                    "resulting FID is not meaningful; regenerate the stats "
                    f"with --img_size {expect_img_size}."
                )
        if "mu" in f:
            return f["mu"], f["sigma"]
        return f["m"], f["s"]
