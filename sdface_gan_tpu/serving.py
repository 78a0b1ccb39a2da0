"""Serving API: a compiled, warmed sampler around a trained generator.

Production inference entry point (the reference has only ad-hoc eval
scripts).  Wraps the full-pipeline generator with:

* one-time truncation-statistics computation (``mean_latent``),
* a single jitted sample function (optionally using the fused Pallas
  SIREN kernel) with fixed batch shape for stable compilation,
* convenience camera handling (random poses, explicit angles, sweeps).

Example:
    sampler = SDFaceSampler.from_checkpoint("out/ffhq256_sdf", batch=16)
    imgs = sampler.sample(seed=0)              # [16, 256, 256, 3] in [-1,1]
    imgs = sampler.sample(azim=0.3, elev=0.1)  # fixed viewpoint
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .geometry.cameras import generate_camera_params
from .models.generator import (
    GeneratorConfig,
    generator_forward,
    init_generator,
    mean_latent,
)
from .models.renderer import RendererConfig


class SDFaceSampler:
    def __init__(
        self,
        params,
        cfg: GeneratorConfig,
        batch: int = 16,
        truncation: float = 0.7,
        use_fused_kernel: bool = False,
        seed: int = 0,
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — params are replicated
        and the sample batch is sharded on its leading dim (GSPMD data
        parallelism), so a v5e-8 serves 8x the single-chip throughput.
        ``batch`` must divide the mesh size."""
        # use_fused_kernel=False is the measured-faster default: on v5e the
        # XLA SIREN field runs 53 ms vs 76 ms for the Pallas fused kernel
        # (batch 32, bf16) — XLA interleaves the sine epilogue with MXU
        # tiles; the kernel serializes them (see README Performance).
        if use_fused_kernel and cfg.renderer.type == "sdf":
            cfg = replace(cfg, renderer=replace(cfg.renderer, use_fused_kernel=True))
        # NGP: corner-packed inference tables (renderer.ngp_pack_mb > 0) —
        # one-time host-side repack, measured 1.55x serving end-to-end at
        # the 64 MB budget (docs/PERFORMANCE.md, scripts/bench_packed_gather.py).
        from .models.generator import pack_generator_for_inference

        params = pack_generator_for_inference(params, cfg)
        self.cfg = cfg
        self.batch = batch
        self.truncation = truncation
        self.mesh = mesh
        if mesh is not None:
            from .parallel import replicate

            if batch % mesh.devices.size:
                raise ValueError(
                    f"batch {batch} must divide the {mesh.devices.size}-device mesh"
                )
            params = replicate(params, mesh)
        self.params = params
        self._trunc = jax.jit(mean_latent, static_argnums=1)(
            params, cfg, jax.random.PRNGKey(seed)
        )

        def _sample(params, z, extr, focal, near, far, key):
            out = generator_forward(
                params, self.cfg, [z], extr, focal, near, far, key=key,
                truncation=self.truncation, truncation_latent=self._trunc,
                randomize_noise=False,
            )
            return out.rgb if out.rgb is not None else out.thumb_rgb

        if mesh is not None:
            from .parallel import data_parallel_jit

            # z + camera tensors batch-sharded, params replicated
            self._fn = data_parallel_jit(_sample, mesh,
                                         batch_argnums=(1, 2, 3, 4, 5))
        else:
            self._fn = jax.jit(_sample)

    @classmethod
    def from_checkpoint(
        cls,
        out_dir: str,
        name: str = "full_pipeline",
        cfg: Optional[GeneratorConfig] = None,
        **kwargs,
    ) -> "SDFaceSampler":
        from .utils.checkpoints import load_checkpoint

        cfg = cfg or GeneratorConfig()
        template = init_generator(jax.random.PRNGKey(0), cfg)
        ck = load_checkpoint(out_dir, name, {"g_ema": template})
        return cls(ck["g_ema"], cfg, **kwargs)

    def warmup(self) -> None:
        self.sample(seed=0)

    def sample(
        self,
        seed: int = 0,
        z: Optional[jnp.ndarray] = None,
        azim: Optional[float] = None,
        elev: Optional[float] = None,
    ) -> np.ndarray:
        """Generate a batch of images; fixed viewpoint when azim/elev given."""
        key = jax.random.PRNGKey(seed)
        kz, kc, kr = jax.random.split(key, 3)
        if z is None:
            z = jax.random.normal(kz, (self.batch, self.cfg.style_dim))
        res = self.cfg.renderer.out_im_res
        if azim is not None or elev is not None:
            locations = jnp.tile(
                jnp.array([[azim or 0.0, elev or 0.0]]), (self.batch, 1)
            )
            cams = generate_camera_params(res, None, batch=self.batch,
                                          locations=locations)
        else:
            cams = generate_camera_params(res, kc, batch=self.batch)
        out = self._fn(self.params, z, cams.extrinsics, cams.focal,
                       cams.near, cams.far, kr)
        return np.asarray(out)
