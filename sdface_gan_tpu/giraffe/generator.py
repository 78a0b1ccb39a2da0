"""GIRAFFE compositional-NeRF generator.

JAX rebuild of ``im2scene/giraffe/models/generator.py``: latent codes for
objects + background, sphere-sampled cameras, per-object bounding-box
transforms, per-object + background NeRF evaluation, density composition,
volume weights, 16^2 feature map, and the neural-renderer upsampler.

The whole forward is one jittable program: every object's field evaluates
as a batched MLP over [B, N*S, ·] points (MXU GEMMs), the object loop is a
static Python unroll over ``n_boxes + 1`` (XLA pipelines it), and the
compositing/cumprod stays local per ray.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .bbox import BBoxConfig, sample_transformations, transform_points_to_box
from .camera import (
    arange_pixels,
    get_camera_mat,
    get_camera_pose,
    get_random_pose,
    get_rotation_matrix,
    image_points_to_world,
    origin_to_world,
)
from .decoder import (
    DecoderConfig,
    SmallDecoderConfig,
    apply_giraffe_decoder,
    apply_small_decoder,
    init_giraffe_decoder,
    init_small_decoder,
)
from .neural_renderer import (
    NeuralRendererConfig,
    apply_neural_renderer,
    init_neural_renderer,
)

Params = Dict[str, Any]


@dataclass(frozen=True)
class GiraffeConfig:
    z_dim: int = 256
    z_dim_bg: int = 128
    range_u: Tuple[float, float] = (0.0, 0.0)
    range_v: Tuple[float, float] = (0.25, 0.25)
    range_radius: Tuple[float, float] = (2.732, 2.732)
    depth_range: Tuple[float, float] = (0.5, 6.0)
    n_ray_samples: int = 64
    resolution_vol: int = 16
    fov: float = 49.13
    bg_rotation_range: Tuple[float, float] = (0.0, 0.0)
    use_max_composition: bool = False
    sample_object_existance: bool = False  # CLEVR-style object dropout
    small_decoder: bool = False
    decoder: DecoderConfig = field(default_factory=lambda: DecoderConfig(z_dim=256))
    small: SmallDecoderConfig = field(default_factory=lambda: SmallDecoderConfig(z_dim=256))
    background: DecoderConfig = field(
        default_factory=lambda: DecoderConfig(
            z_dim=128, hidden_size=64, n_blocks=4, skips=(), downscale_p_by=12.0
        )
    )
    bbox: BBoxConfig = field(default_factory=BBoxConfig)
    neural_renderer: Optional[NeuralRendererConfig] = field(
        default_factory=NeuralRendererConfig
    )

    @property
    def n_boxes(self) -> int:
        return self.bbox.n_boxes


class LatentCodes(NamedTuple):
    z_shape_obj: jnp.ndarray  # [B, n_boxes, z_dim]
    z_app_obj: jnp.ndarray  # [B, n_boxes, z_dim]
    z_shape_bg: jnp.ndarray  # [B, z_dim_bg]
    z_app_bg: jnp.ndarray  # [B, z_dim_bg]


def init_giraffe(key: jax.Array, cfg: GiraffeConfig) -> Params:
    kd, kb, kn = jax.random.split(key, 3)
    if cfg.small_decoder:
        dec = init_small_decoder(kd, cfg.small)
    else:
        dec = init_giraffe_decoder(kd, cfg.decoder)
    p: Params = {
        "decoder": dec,
        "background": init_giraffe_decoder(kb, cfg.background),
    }
    if cfg.neural_renderer is not None:
        p["neural_renderer"] = init_neural_renderer(kn, cfg.neural_renderer)
    return p


def sample_latent_codes(
    key: jax.Array, cfg: GiraffeConfig, batch_size: int, tmp: float = 1.0
) -> LatentCodes:
    """Reference ``get_latent_codes`` (``generator.py:145-160``)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n = cfg.n_boxes
    return LatentCodes(
        tmp * jax.random.normal(k1, (batch_size, n, cfg.z_dim)),
        tmp * jax.random.normal(k2, (batch_size, n, cfg.z_dim)),
        tmp * jax.random.normal(k3, (batch_size, cfg.z_dim_bg)),
        tmp * jax.random.normal(k4, (batch_size, cfg.z_dim_bg)),
    )


def sample_random_camera(
    key: jax.Array, cfg: GiraffeConfig, batch_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    camera_mat = jnp.tile(get_camera_mat(cfg.fov), (batch_size, 1, 1))
    world_mat = get_random_pose(key, cfg.range_u, cfg.range_v, cfg.range_radius, batch_size)
    return camera_mat, world_mat


def fixed_camera(
    cfg: GiraffeConfig, batch_size: int, val_u=0.5, val_v=0.5, val_r=0.5
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    camera_mat = jnp.tile(get_camera_mat(cfg.fov), (batch_size, 1, 1))
    world_mat = get_camera_pose(
        cfg.range_u, cfg.range_v, cfg.range_radius, val_u, val_v, val_r, batch_size
    )
    return camera_mat, world_mat


def sample_bg_rotation(key: jax.Array, cfg: GiraffeConfig, batch_size: int) -> jnp.ndarray:
    if cfg.bg_rotation_range == (0.0, 0.0):
        return jnp.tile(jnp.eye(3)[None], (batch_size, 1, 1))
    r0, r1 = cfg.bg_rotation_range
    val = r0 + jax.random.uniform(key, ()) * (r1 - r0)
    a = val * 2.0 * jnp.pi
    c, s = jnp.cos(a), jnp.sin(a)
    r = jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    return jnp.tile(r[None], (batch_size, 1, 1))


def sample_object_existence(
    key: jax.Array, cfg: GiraffeConfig, batch_size: int
) -> jnp.ndarray:
    """Per-sample object-existence mask [B, n_boxes] (reference
    ``get_object_existance``, ``generator.py:382-415`` — CLEVR-2345
    hard-coded count probabilities; other box counts fall back to uniform
    over 2..n).  Runs inside jit (categorical + top-k selection)."""
    n = cfg.n_boxes
    kc, ks = jax.random.split(key)
    if n == 5:
        probs = jnp.array([0.19456788, 0.24355003, 0.25269547, 0.30918661])
    else:
        probs = jnp.ones(max(n - 1, 1)) / max(n - 1, 1)
    counts = 2 + jax.random.categorical(kc, jnp.log(probs), shape=(batch_size,))
    counts = jnp.clip(counts, 0, n)
    scores = jax.random.uniform(ks, (batch_size, n))
    rank = jnp.argsort(jnp.argsort(-scores, axis=-1), axis=-1)
    return (rank < counts[:, None]).astype(jnp.float32)


def _add_noise_to_interval(di: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Stratified jitter (reference ``add_noise_to_interval``,
    ``generator.py:292-298``)."""
    mid = 0.5 * (di[..., 1:] + di[..., :-1])
    high = jnp.concatenate([mid, di[..., -1:]], -1)
    low = jnp.concatenate([di[..., :1], mid], -1)
    noise = jax.random.uniform(key, low.shape)
    return low + (high - low) * noise


def _apply_decoder(p, cfg: GiraffeConfig, pts, rays, z_shape, z_app):
    if cfg.small_decoder:
        return apply_small_decoder(p, cfg.small, pts, rays, z_shape, z_app)
    return apply_giraffe_decoder(p, cfg.decoder, pts, rays, z_shape, z_app)


def _composite(cfg: GiraffeConfig, sigma: jnp.ndarray, feat: jnp.ndarray):
    """Density composition across objects (reference ``composite_function``,
    ``generator.py:349-367``).  sigma: [K, B, N, S]; feat: [K, B, N, S, F]."""
    k = sigma.shape[0]
    if k == 1:
        return sigma[0], feat[0]
    if cfg.use_max_composition:
        ind = jnp.argmax(sigma, axis=0)
        sigma_sum = jnp.max(sigma, axis=0)
        feat_w = jnp.take_along_axis(feat, ind[None, ..., None], axis=0)[0]
        return sigma_sum, feat_w
    denom = jnp.sum(sigma, axis=0, keepdims=True)
    denom = jnp.where(denom == 0.0, 1e-4, denom)
    w = sigma / denom
    return jnp.sum(sigma, axis=0), jnp.sum(feat * w[..., None], axis=0)


def calc_volume_weights(
    z_vals: jnp.ndarray, ray_vector: jnp.ndarray, sigma: jnp.ndarray,
    last_dist: float = 1e10,
) -> jnp.ndarray:
    """Alpha-compositing weights (reference ``calc_volume_weights``,
    ``generator.py:370-380``).  z_vals/sigma: [B, N, S]; rays [B, N, 3]."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.full_like(z_vals[..., :1], last_dist)], -1)
    dists = dists * jnp.linalg.norm(ray_vector, axis=-1, keepdims=True)
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    trans = jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1)
    return alpha * jnp.cumprod(trans, axis=-1)[..., :-1]


def volume_render_image(
    params: Params,
    cfg: GiraffeConfig,
    latent_codes: LatentCodes,
    camera_matrices: Tuple[jnp.ndarray, jnp.ndarray],
    transformations: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    bg_rotation: jnp.ndarray,
    key: Optional[jax.Array] = None,
    mode: str = "training",
    not_render_background: bool = False,
    only_render_background: bool = False,
    return_alpha_map: bool = False,
    object_mask: Optional[jnp.ndarray] = None,
):
    """Reference ``volume_render_image`` (``generator.py:417-542``).
    ``object_mask`` [B, n_boxes] in {0,1} zeroes the density of masked
    objects (object-existence sampling / add-objects render program).

    Returns the feature map [B, res, res, F] (NHWC), plus per-object alpha
    maps when ``return_alpha_map``.
    """
    res = cfg.resolution_vol
    n_steps = cfg.n_ray_samples
    n_points = res * res
    batch_size = latent_codes.z_shape_obj.shape[0]
    training = mode == "training" and key is not None

    pixels = arange_pixels(res, batch_size)  # y already inverted
    pixels_world = image_points_to_world(pixels, *camera_matrices)
    camera_world = origin_to_world(n_points, *camera_matrices)
    ray_vector = pixels_world - camera_world

    d0, d1 = cfg.depth_range
    di = d0 + jnp.linspace(0.0, 1.0, n_steps).reshape(1, 1, -1) * (d1 - d0)
    di = jnp.tile(di, (batch_size, n_points, 1))
    if training:
        key, sub = jax.random.split(key)
        di = _add_noise_to_interval(di, sub)

    n_boxes = 0 if only_render_background else cfg.n_boxes
    render_bg = not not_render_background

    feats, sigmas = [], []
    s, t, r = transformations
    for i in range(n_boxes):
        p_local = transform_points_to_box(pixels_world, s, t, r, i)
        c_local = transform_points_to_box(camera_world, s, t, r, i)
        ray_i = p_local - c_local
        p_i = c_local[:, :, None, :] + di[..., None] * ray_i[:, :, None, :]
        r_i = jnp.broadcast_to(ray_i[:, :, None, :], p_i.shape)
        p_flat = p_i.reshape(batch_size, -1, 3)
        r_flat = r_i.reshape(batch_size, -1, 3)
        feat_i, sigma_i = _apply_decoder(
            params["decoder"], cfg, p_flat, r_flat,
            latent_codes.z_shape_obj[:, i], latent_codes.z_app_obj[:, i],
        )
        if training:
            key, sub = jax.random.split(key)
            sigma_i = sigma_i + jax.random.normal(sub, sigma_i.shape)
        # mask out points outside the (padded) unit box (generator.py:472-476)
        padd = 0.1
        inside = jnp.all((p_flat <= 1.0 + padd) & (p_flat >= -1.0 - padd), axis=-1)
        sigma_i = jnp.where(inside, sigma_i, 0.0)
        if object_mask is not None:
            sigma_i = sigma_i * object_mask[:, i][:, None]
        sigmas.append(sigma_i.reshape(batch_size, n_points, n_steps))
        feats.append(feat_i.reshape(batch_size, n_points, n_steps, -1))

    if render_bg:
        cam_bg = jnp.einsum("bij,bnj->bni", bg_rotation, camera_world)
        pix_bg = jnp.einsum("bij,bnj->bni", bg_rotation, pixels_world)
        ray_bg = pix_bg - cam_bg
        p_bg = cam_bg[:, :, None, :] + di[..., None] * ray_bg[:, :, None, :]
        r_bg = jnp.broadcast_to(ray_bg[:, :, None, :], p_bg.shape)
        feat_bg, sigma_bg = apply_giraffe_decoder(
            params["background"], cfg.background,
            p_bg.reshape(batch_size, -1, 3), r_bg.reshape(batch_size, -1, 3),
            latent_codes.z_shape_bg, latent_codes.z_app_bg,
        )
        if training:
            key, sub = jax.random.split(key)
            sigma_bg = sigma_bg + jax.random.normal(sub, sigma_bg.shape)
        sigmas.append(sigma_bg.reshape(batch_size, n_points, n_steps))
        feats.append(feat_bg.reshape(batch_size, n_points, n_steps, -1))

    sigma = jax.nn.relu(jnp.stack(sigmas, axis=0))  # [K, B, N, S]
    feat = jnp.stack(feats, axis=0)

    sigma_sum, feat_weighted = _composite(cfg, sigma, feat)
    weights = calc_volume_weights(di, ray_vector, sigma_sum)
    feat_map = jnp.sum(weights[..., None] * feat_weighted, axis=-2)  # [B, N, F]

    # x-major flat order -> [B, x, y, F] -> [B, h(y), w(x), F]
    feat_map = feat_map.reshape(batch_size, res, res, -1).transpose(0, 2, 1, 3)

    if return_alpha_map:
        acc_maps = []
        for i in range(sigma.shape[0] - 1):
            w_obj = calc_volume_weights(di, ray_vector, sigma[i], last_dist=0.0)
            acc = jnp.sum(w_obj, axis=-1)  # [B, N]
            acc_maps.append(acc.reshape(batch_size, res, res, 1).transpose(0, 2, 1, 3))
        return feat_map, jnp.concatenate(acc_maps, axis=-1)
    return feat_map


def giraffe_forward(
    params: Params,
    cfg: GiraffeConfig,
    key: Optional[jax.Array] = None,
    batch_size: int = 32,
    latent_codes: Optional[LatentCodes] = None,
    camera_matrices: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    transformations: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
    bg_rotation: Optional[jnp.ndarray] = None,
    mode: str = "training",
    not_render_background: bool = False,
    only_render_background: bool = False,
    return_alpha_map: bool = False,
    object_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full generator forward (reference ``Generator.forward``,
    ``generator.py:89-137``).  Returns [B, img_size, img_size, 3] in [0, 1]
    (or the alpha map when requested)."""
    if key is not None:
        key, k1, k2, k3, k4, k5, krender = jax.random.split(key, 7)
    else:
        k1 = k2 = k3 = k4 = k5 = krender = None
    if object_mask is None and cfg.sample_object_existance and k5 is not None:
        b = latent_codes.z_shape_obj.shape[0] if latent_codes is not None else batch_size
        object_mask = sample_object_existence(k5, cfg, b)
    if latent_codes is None:
        latent_codes = sample_latent_codes(k1, cfg, batch_size)
    batch_size = latent_codes.z_shape_obj.shape[0]
    if camera_matrices is None:
        camera_matrices = sample_random_camera(k2, cfg, batch_size)
    if transformations is None:
        transformations = sample_transformations(k3, cfg.bbox, batch_size)
    if bg_rotation is None:
        bg_rotation = (
            sample_bg_rotation(k4, cfg, batch_size)
            if k4 is not None
            else jnp.tile(jnp.eye(3)[None], (batch_size, 1, 1))
        )

    if return_alpha_map:
        _, alpha = volume_render_image(
            params, cfg, latent_codes, camera_matrices, transformations,
            bg_rotation, key=krender, mode=mode, return_alpha_map=True,
            not_render_background=not_render_background,
            object_mask=object_mask,
        )
        return alpha

    feat_map = volume_render_image(
        params, cfg, latent_codes, camera_matrices, transformations,
        bg_rotation, key=krender, mode=mode,
        not_render_background=not_render_background,
        only_render_background=only_render_background,
        object_mask=object_mask,
    )
    if cfg.neural_renderer is not None and "neural_renderer" in params:
        return apply_neural_renderer(params["neural_renderer"], cfg.neural_renderer, feat_map)
    return feat_map
