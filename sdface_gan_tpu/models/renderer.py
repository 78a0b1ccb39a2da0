"""SDF volume feature renderer.

TPU-native rebuild of the reference ``VolumeFeatureRenderer``
(``im2scene/sdf/models/sdf_model.py:143-423``): camera rays -> depth
samples -> point network (SIREN / NGP-SIREN / FC) -> SDF-to-density ->
alpha compositing -> 64x64 thumb RGB + feature map.

TPU-first design decisions:
* Channel-LAST everywhere ([B, H, W, C] / [B, P, C]); no NCHW permutes.
* The [B, H, W, S] sample tensor is flattened to one [B, H*W*S, C] axis so
  the whole field evaluation is a handful of MXU-sized GEMMs.
* ``jnp.cumprod`` along the sample axis does the visibility product; the
  sample dim stays local per ray, so sharding rays across devices needs no
  collective (SURVEY.md §2.6).
* The eikonal term is a ``jax.vjp`` pullback through the field — it nests
  under ``jax.grad`` for the G-step (double backprop) without the
  reference's ``create_graph=True`` autograd surgery.
* Randomness is explicit (PRNG keys in), so the whole render step jits.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry.rays import base_t_vals, get_rays
from .siren import (
    FCConfig,
    NGPSirenConfig,
    SirenConfig,
    apply_fc_generator_parts,
    apply_ngp_siren_generator_parts,
    apply_siren_generator_parts,
    init_fc_generator,
    init_ngp_siren_generator,
    init_siren_generator,
)

Params = Dict[str, Any]


@dataclass(frozen=True)
class RendererConfig:
    """Static renderer options (reference ``SDFOptions`` rendering group +
    ``VolumeFeatureRenderer.__init__``, ``sdf_model.py:143-205``)."""

    type: str = "sdf"  # 'sdf' | 'ngp' | 'fc'
    out_im_res: int = 64
    n_samples: int = 24
    style_dim: int = 256
    width: int = 256
    depth: int = 8
    offset_sampling: bool = True
    static_viewdirs: bool = False
    z_normalize: bool = True
    with_sdf: bool = True
    force_background: bool = True
    output_features: bool = True
    return_xyz: bool = False
    return_sdf: bool = False
    # Also return the compositing weights [B,H,W,S] and normalized sample
    # positions (for the distortion prior, losses/geometry_losses.py).
    return_weights: bool = False
    # Zero the view-direction branch of the field network.  The reference
    # always conditions rgb on view dirs (sdf_model.py:123-130) — correct
    # for real faces (specularities) but on synthetic data it lets ANY 2D
    # surface act as a light field that paints pose-consistent images with
    # no geometry (two such collapses measured, docs/TRAINING_RUN.md).
    # With rgb view-independent, each world point has ONE color, so
    # pose-varied data can only be explained by parallax — i.e. geometry.
    view_independent: bool = False
    perturb: float = 1.0
    raw_noise_std: float = 0.0
    # Inference fast path: fused Pallas SIREN kernel (ops/siren_kernel.py).
    # Training keeps the XLA path (autodiff through eikonal/R1).
    use_fused_kernel: bool = False
    # Rematerialize the field network in backward passes: the 9-layer
    # [B*H*W*S, width] activation chain is ~1 GB/layer at training shapes,
    # and the eikonal VJP doubles it — without remat the stage-A G step
    # exceeds HBM.  Trades ~1 extra forward for O(layers) less memory.
    remat: bool = True
    # NGP hash-grid geometry (type='ngp' only; reference hardcodes these at
    # sdf_model.py:1534-1545).  The TPU NGP path is gather/scatter
    # latency-bound (docs/PERFORMANCE.md), so num_levels is the main
    # throughput knob — see configs/256res/ffhq_256_sdf_ngp_tpu.yaml.
    ngp_num_levels: int = 16
    ngp_level_dim: int = 2
    ngp_finest_res: int = 4096
    ngp_log2_hashmap_size: int = 19
    # Corner-packed inference tables, MB budget (0 = off).  Serving-side
    # only: the encode uses the packed table when the loaded params carry
    # one (pack_generator_for_inference); training never packs.  64 is the
    # measured-optimal budget on the tuned grid
    # (scripts/bench_packed_gather.py: 1.49x the encode; bigger loses).
    ngp_pack_mb: int = 0
    # Background model.  'lastsample' (reference semantics): the final
    # depth sample gets an infinite-width bin (sdf_model.py:240 `self.inf`),
    # so it absorbs all leftover visibility — an implicit learnable
    # background ("dome") the network paints per view.  That dome is also
    # an adversarial shortcut: on easy/narrow-pose data the GAN can erase
    # the SDF geometry entirely and paint images on the dome
    # (docs/TRAINING_RUN.md).  'white' / 'gray' / 'black' composite the
    # leftover visibility onto a FIXED color (the pi-GAN / GRAF
    # convention): only real density can produce non-background pixels,
    # so geometry formation is structurally guaranteed.
    bg_mode: str = "lastsample"
    # How to compute d sdf / d pts for the eikonal term:
    # * 'vjp' — reverse-mode pullback (reference semantics, one backward);
    #   under the outer param grad this is reverse-over-reverse.
    # * 'jvp' — three forward-mode tangents (the gradient is only
    #   3-dimensional); O(1) activation memory, and the outer grad becomes
    #   reverse-over-forward.  Same values; measured trade-off in
    #   docs/PERFORMANCE.md.
    eikonal_mode: str = "vjp"
    # Eikonal point budget.  0 = reference semantics: the pullback runs
    # over ALL B*res^2*S rendered points (training_utils.py:410-424), so
    # the G step's reverse-over-reverse covers the full field graph — the
    # measured stage-A bottleneck (docs/PERFORMANCE.md).  M > 0 instead
    # penalizes ||grad sdf|| - 1 at M FRESH frustum points per batch
    # element (random pixel ray x random depth, the VolSDF/IGR practice):
    # the main render stays a plain forward and the second-order graph
    # shrinks from B*98k points to B*M.  The eikonal loss is an
    # expectation over the same point distribution either way.
    eikonal_subsample: int = 0

    @property
    def feature_out_size(self) -> int:
        # reference sdf_model.py:191: width unless ngp (then style_dim)
        return self.width if self.type != "ngp" else self.style_dim

    def network_config(self):
        if self.type == "ngp":
            from ..ops.hash_encoder import HashGridSpec

            return NGPSirenConfig(
                width=self.style_dim,
                style_dim=self.style_dim,
                output_features=self.output_features,
                grid=HashGridSpec.create(
                    num_levels=self.ngp_num_levels,
                    level_dim=self.ngp_level_dim,
                    desired_resolution=self.ngp_finest_res,
                    log2_hashmap_size=self.ngp_log2_hashmap_size,
                ),
                pack_mb=self.ngp_pack_mb,
            )
        if self.type == "fc":
            return FCConfig(
                depth=self.depth,
                width=self.width,
                style_dim=self.style_dim,
                output_features=self.output_features,
            )
        return SirenConfig(
            depth=self.depth,
            width=self.width,
            style_dim=self.style_dim,
            output_features=self.output_features,
        )


class RenderOutput(NamedTuple):
    rgb: jnp.ndarray  # [B, H, W, 3] in [-1, 1]
    features: Optional[jnp.ndarray]  # [B, H, W, F]
    sdf: Optional[jnp.ndarray]  # [B, H, W, S, 1] raw SDF samples
    mask: Optional[jnp.ndarray]  # [B, H, W, 1] background probability
    xyz: Optional[jnp.ndarray]  # [B, H, W, 3] expected surface points
    eikonal_term: Optional[jnp.ndarray]  # d sdf / d pts: [B, H, W, S, 3]
    # ([B, M, 3] under eikonal_subsample — consumers only reduce over it)
    weights: Optional[jnp.ndarray] = None  # [B, H, W, S] compositing weights
    s_vals: Optional[jnp.ndarray] = None  # [B, H, W, S] samples in [0, 1]


def init_renderer(key: jax.Array, cfg: RendererConfig) -> Params:
    knet, _ = jax.random.split(key)
    net_cfg = cfg.network_config()
    if cfg.type == "ngp":
        network = init_ngp_siren_generator(knet, net_cfg)
    elif cfg.type == "fc":
        network = init_fc_generator(knet, net_cfg)
    else:
        network = init_siren_generator(knet, net_cfg)
    params: Params = {"network": network}
    if cfg.with_sdf:
        # learnable beta of sigma = sigmoid(-sdf/beta)/beta (sdf_model.py:163)
        params["sigmoid_beta"] = jnp.full((1,), 0.1, dtype=jnp.float32)
    return params


def _apply_network(
    params: Params, cfg: RendererConfig, pts: jnp.ndarray, views: jnp.ndarray, style: jnp.ndarray
):
    """Evaluate the field on [B, H, W, S, 3] inputs via one flat GEMM axis.

    Returns ``(rgb [B,H,W,S,3], sdf [B,H,W,S,1], features [B,H,W,S,F]|None)``
    as separate tensors — the reference's channel-concat contract
    (``sdf_model.py:247-250``) would force the consumer to slice features at
    lane offset 4, a relayout of the multi-GB tensor on TPU (8x128 tiling).
    """
    b, h, w, s, _ = pts.shape
    flat_pts = pts.reshape(b, h * w * s, 3)
    flat_views = views.reshape(b, h * w * s, 3)
    net_cfg = cfg.network_config()
    # (Casting pts/views to the weight dtype here — to halve the padded
    # [N, 3] streams in bf16 serving — was measured ~1.5% SLOWER end to
    # end: the early cast moves the f32->bf16 boundary out of the first
    # matmul's fusion.  Leave the casts at the per-layer matmuls.)
    if cfg.use_fused_kernel and cfg.type == "sdf" and cfg.output_features:
        from ..ops.siren_kernel import siren_field_fused_parts

        rgb, sdf, feat = siren_field_fused_parts(
            params["network"], flat_pts, flat_views, style,
            depth=cfg.depth, width=cfg.width,
            # Pallas on CPU only runs in interpret mode (tests / dev boxes)
            interpret=jax.default_backend() == "cpu",
        )
    else:
        def net(net_params, fp, fv, st):
            if cfg.type == "ngp":
                return apply_ngp_siren_generator_parts(net_params, net_cfg, fp, fv, st)
            if cfg.type == "fc":
                return apply_fc_generator_parts(net_params, net_cfg, fp, fv, st)
            return apply_siren_generator_parts(net_params, net_cfg, fp, fv, st)

        if cfg.remat:
            net = jax.checkpoint(net)
        rgb, sdf, feat = net(params["network"], flat_pts, flat_views, style)
    return (
        rgb.reshape(b, h, w, s, -1),
        sdf.reshape(b, h, w, s, 1),
        feat.reshape(b, h, w, s, -1) if feat is not None else None,
    )


def _sample_z_vals(
    cfg: RendererConfig,
    near: jnp.ndarray,
    far: jnp.ndarray,
    batch: int,
    key: Optional[jax.Array],
) -> jnp.ndarray:
    """Depth sampling (reference ``render_rays``, ``sdf_model.py:326-340``).

    near/far: [B, 1, 1, 1] broadcastable against [B, H, W, S].
    """
    res, s = cfg.out_im_res, cfg.n_samples
    t_vals = base_t_vals(s, cfg.offset_sampling).reshape(1, 1, 1, s)
    z_vals = near * (1.0 - t_vals) + far * t_vals  # [B,1,1,S] or broadcast
    z_vals = jnp.broadcast_to(z_vals, (batch, res, res, s))
    if cfg.perturb <= 0.0 or key is None:
        return z_vals
    if cfg.offset_sampling:
        upper = jnp.concatenate(
            [z_vals[..., 1:], jnp.broadcast_to(far, z_vals[..., :1].shape)], -1
        )
        lower = jax.lax.stop_gradient(z_vals)
        t_rand = jax.random.uniform(key, (batch, res, res))[..., None]
    else:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
        lower = jnp.concatenate([z_vals[..., :1], mids], -1)
        t_rand = jax.random.uniform(key, z_vals.shape)
    return lower + (upper - lower) * t_rand


def _integrate(
    params: Params,
    cfg: RendererConfig,
    parts: Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]],
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    pts: jnp.ndarray,
    noise_key: Optional[jax.Array] = None,
):
    """Alpha compositing (reference ``volume_integration``,
    ``sdf_model.py:236-301``).

    ``parts`` is the network output ``(rgb, sdf, features)`` — separate
    tensors, see :func:`_apply_network`.  Returns (rgb, features, sdf,
    mask, xyz).  Compositing runs in f32 regardless of the network compute
    dtype: the sigmoid(-sdf/beta)/beta transform and the visibility cumprod
    are precision-sensitive (beta anneals toward ~1e-3 during training).
    Only the SMALL tensors are cast, though — upcasting the [B,H,W,S,F]
    features would materialize gigabytes; ``weights_f32 * features_bf16``
    promotes elementwise to identical f32 values (bf16->f32 is exact) and
    fuses into one read of the bf16 tensor.
    """
    rgb, sdf, features = parts
    z_vals = z_vals.astype(jnp.float32)
    dists = z_vals[..., 1:] - z_vals[..., :-1]  # [B,H,W,S-1]
    rays_d_norm = jnp.linalg.norm(rays_d.astype(jnp.float32), axis=-1)  # [B,H,W]
    if cfg.bg_mode == "lastsample":
        # infinite last bin: the final sample absorbs leftover visibility
        last = jnp.broadcast_to(jnp.asarray(1e10, z_vals.dtype), rays_d_norm.shape)[..., None]
    else:
        # fixed background: the last sample is an ordinary bin and leftover
        # visibility composites onto a constant color after integration
        last = dists[..., -1:]
    dists = jnp.concatenate([dists, last], -1) * rays_d_norm[..., None]  # [B,H,W,S]

    rgb = rgb.astype(jnp.float32)
    sdf = sdf.astype(jnp.float32)
    if not cfg.output_features:
        features = None

    # The per-ray scalar chain (sigma/alpha/visibility/weights) runs as
    # [B,H,W,S] — a trailing singleton channel would lane-pad every tensor
    # 128x on TPU (8x128 tiling) and the cumprod makes O(log S) passes over
    # it; squeezed, the whole chain is a few MB of physical traffic.
    sdf_s = sdf[..., 0]  # [B,H,W,S]
    if cfg.with_sdf:
        beta = params["sigmoid_beta"].astype(jnp.float32)
        sigma = jax.nn.sigmoid(-sdf_s / beta) / beta
        alpha = 1.0 - jnp.exp(-sigma * dists)
    else:
        noise = 0.0
        if cfg.raw_noise_std > 0.0 and noise_key is not None:
            noise = cfg.raw_noise_std * jax.random.normal(noise_key, sdf_s.shape)
        alpha = 1.0 - jnp.exp(-jax.nn.softplus(sdf_s + noise) * dists)

    # visibility T_i = prod_{j<i} (1 - alpha_j); cumprod over the LOCAL
    # sample axis — ray sharding needs no collective here.
    trans = jnp.concatenate(
        [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1
    )
    visibility = jnp.cumprod(trans, axis=-1)[..., :-1]
    weights = alpha * visibility  # [B,H,W,S]

    if cfg.force_background and cfg.bg_mode == "lastsample":
        last = 1.0 - jnp.sum(weights[..., :-1], axis=-1, keepdims=True)
        weights = jnp.concatenate([weights[..., :-1], last], axis=-1)

    w_exp = weights[..., None]  # [B,H,W,S,1] broadcast against channels
    rgb_map = -1.0 + 2.0 * jnp.sum(w_exp * jax.nn.sigmoid(rgb), axis=-2)
    if cfg.bg_mode != "lastsample":
        # composite leftover visibility onto the fixed background color
        bg_level = {"white": 1.0, "gray": 0.5, "black": 0.0}[cfg.bg_mode]
        leftover = 1.0 - jnp.sum(weights, axis=-1, keepdims=True)  # [B,H,W,1]
        rgb_map = rgb_map + 2.0 * bg_level * leftover
    feature_map = (
        jnp.sum(w_exp * features, axis=-2) if cfg.output_features else None
    )
    xyz = jnp.sum(w_exp * pts, axis=-2) if cfg.return_xyz else None
    if cfg.return_xyz:
        # background probability: leftover transmittance under a fixed
        # background, the infinite last sample's weight otherwise
        mask = (
            leftover if cfg.bg_mode != "lastsample" else weights[..., -1:]
        )
    else:
        mask = None
    sdf_out = sdf if cfg.return_sdf else None
    weights_out = weights if cfg.return_weights else None
    return rgb_map, feature_map, sdf_out, mask, xyz, weights_out


def _subsampled_eikonal(
    params: Params,
    cfg: RendererConfig,
    focal: jnp.ndarray,
    c2w: jnp.ndarray,
    near_b: jnp.ndarray,
    far_b: jnp.ndarray,
    style: jnp.ndarray,
    key: jax.Array,
) -> jnp.ndarray:
    """d sdf / d pts at M fresh frustum points per batch element.

    Points are drawn as (random continuous pixel) x (random depth in
    [near, far]) through the live camera — the same distribution the
    rendered samples cover, without tying the second-order pass to the
    B*res^2*S render graph.  View dirs are zeros: the SDF head never
    consumes them (``SirenGenerator``: sigma_linear taps the pts chain,
    ``sdf_model.py:122-126``), and the rgb/feature outputs are discarded.
    The gradient is taken wrt WORLD points with z-normalization applied
    inside, matching the reference's ``pts.requires_grad`` placement
    (``sdf_model.py:345-349``).
    """
    m = cfg.eikonal_subsample
    batch = c2w.shape[0]
    res = cfg.out_im_res
    kuv, kt = jax.random.split(key)
    uv = jax.random.uniform(kuv, (batch, m, 2)) * res  # continuous pixels
    focal2 = focal.reshape(batch, 1)
    dirs = jnp.stack(
        [
            (uv[..., 0] - res * 0.5) / focal2,
            -(uv[..., 1] - res * 0.5) / focal2,
            -jnp.ones((batch, m)),
        ],
        axis=-1,
    )  # [B, M, 3] camera-frame ray dirs
    rays_d = jnp.einsum("bmi,bji->bmj", dirs, c2w[:, :3, :3])
    origins = c2w[:, None, :3, -1]
    t = near_b.reshape(batch, 1) + (far_b - near_b).reshape(batch, 1) * (
        jax.random.uniform(kt, (batch, m))
    )
    pts_e = origins + rays_d * t[..., None]  # [B, M, 3] world points

    scale = (2.0 / (far_b - near_b)).reshape(batch, 1, 1)
    views0 = jnp.zeros_like(pts_e)

    def sdf_at(p):
        normalized = p * scale if cfg.z_normalize else p
        # _apply_network wants [B, H, W, S, 3]; fold M into the sample dim
        _, sdf, _ = _apply_network(
            params, cfg, normalized[:, None, None, :, :], views0[:, None, None, :, :], style
        )
        return sdf

    sdf_p, vjp_fn = jax.vjp(sdf_at, pts_e)
    return vjp_fn(jnp.ones_like(sdf_p))[0]  # [B, M, 3]


def render(
    params: Params,
    cfg: RendererConfig,
    focal: jnp.ndarray,
    c2w: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    style: jnp.ndarray,
    key: Optional[jax.Array] = None,
    return_eikonal: bool = False,
) -> RenderOutput:
    """Full render pass (reference ``render``/``render_rays``/``forward``,
    ``sdf_model.py:303-423``).

    Args:
      focal/near/far: [B, 1, 1].
      c2w: [B, 3, 4].
      style: [B, style_dim] post-mapping latent.
      key: PRNG key for stratified jitter (None => deterministic / test mode).
    """
    batch = c2w.shape[0]
    rays = get_rays(focal, c2w, cfg.out_im_res, static_viewdirs=cfg.static_viewdirs)
    viewdirs = rays.viewdirs

    near_b = near.reshape(batch, 1, 1, 1)
    far_b = far.reshape(batch, 1, 1, 1)
    zkey = nkey = ekey = None
    if key is not None:
        zkey, nkey, ekey = jax.random.split(key, 3)
    z_vals = _sample_z_vals(cfg, near_b, far_b, batch, zkey)
    pts = rays.origins[..., None, :] + rays.directions[..., None, :] * z_vals[..., None]
    if cfg.view_independent:
        viewdirs = jnp.zeros_like(viewdirs)
    views = jnp.broadcast_to(viewdirs[..., None, :], pts.shape)

    def field(p):
        normalized = p * 2.0 / (far_b - near_b)[..., None] if cfg.z_normalize else p
        return _apply_network(params, cfg, normalized, views, style)

    if return_eikonal and cfg.eikonal_subsample > 0:
        # Subsampled eikonal: plain forward for rendering, second-order
        # graph only over M fresh frustum points (see the config comment).
        # A missing key must NOT silently fall back to the full-graph vjp:
        # the configs pairing eikonal_subsample with no_remat would then
        # compile the un-rematerialized reverse-over-reverse and OOM.
        if ekey is None:
            raise ValueError(
                "eikonal_subsample > 0 requires render(..., key=...) for "
                "the frustum-point draw"
            )
        parts = field(pts)
        eikonal_term = _subsampled_eikonal(
            params, cfg, focal, c2w, near_b, far_b, style, ekey
        )
    elif return_eikonal and cfg.eikonal_mode == "jvp":
        # forward-mode: the field is pointwise in pts, so three unit
        # tangents recover the full (B,H,W,S,3) gradient exactly; no
        # activation chain is kept alive for a pullback.  linearize runs
        # the forward ONCE and replays the linearized network per tangent.
        parts, lin = jax.linearize(field, pts)
        cols = []
        for i in range(3):
            e = jnp.zeros((1, 1, 1, 1, 3)).at[..., i].set(1.0)
            cols.append(lin(jnp.broadcast_to(e, pts.shape))[1])
        eikonal_term = jnp.concatenate(cols, axis=-1)  # [B,H,W,S,3]
    elif return_eikonal:
        parts, vjp_fn = jax.vjp(field, pts)
        rgb_p, sdf_p, feat_p = parts
        cot = (
            jnp.zeros_like(rgb_p),
            jnp.ones_like(sdf_p),
            jnp.zeros_like(feat_p) if feat_p is not None else None,
        )
        eikonal_term = vjp_fn(cot)[0]  # d sdf / d pts, [B,H,W,S,3]
    else:
        parts = field(pts)
        eikonal_term = None

    rgb_map, feature_map, sdf_out, mask, xyz, weights = _integrate(
        params, cfg, parts, z_vals, rays.directions, pts, noise_key=nkey
    )
    s_vals = None
    if cfg.return_weights:
        s_vals = ((z_vals - near_b) / (far_b - near_b)).astype(jnp.float32)
    return RenderOutput(
        rgb_map, feature_map, sdf_out, mask, xyz, eikonal_term, weights, s_vals
    )


def mlp_init_pass(
    params: Params,
    cfg: RendererConfig,
    focal: jnp.ndarray,
    c2w: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    style: jnp.ndarray,
    key: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sphere-init regression pass (reference ``mlp_init_pass``,
    ``sdf_model.py:380-409``): returns (sdf, target) where
    ``target = ||pts|| - (far - near)/4`` — stratified samples always."""
    batch = c2w.shape[0]
    res, s = cfg.out_im_res, cfg.n_samples
    rays = get_rays(focal, c2w, res, static_viewdirs=cfg.static_viewdirs)

    near_b = near.reshape(batch, 1, 1, 1)
    far_b = far.reshape(batch, 1, 1, 1)
    t_vals = base_t_vals(s, cfg.offset_sampling).reshape(1, 1, 1, s)
    z_vals = jnp.broadcast_to(near_b * (1.0 - t_vals) + far_b * t_vals, (batch, res, res, s))
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
    lower = jnp.concatenate([z_vals[..., :1], mids], -1)
    t_rand = jax.random.uniform(key, z_vals.shape)
    z_vals = lower + (upper - lower) * t_rand

    pts = rays.origins[..., None, :] + rays.directions[..., None, :] * z_vals[..., None]
    views = jnp.broadcast_to(rays.viewdirs[..., None, :], pts.shape)
    normalized = pts * 2.0 / (far_b - near_b)[..., None] if cfg.z_normalize else pts
    _, sdf, _ = _apply_network(params, cfg, normalized, views, style)
    sdf = sdf[..., 0]
    target = jnp.linalg.norm(jax.lax.stop_gradient(pts), axis=-1) - (far_b - near_b) / 4.0
    return sdf, target
