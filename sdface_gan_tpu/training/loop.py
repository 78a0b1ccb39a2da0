"""Staged training drivers: sphere init -> volume renderer -> full pipeline.

Host-side orchestration around the jitted steps in :mod:`steps`,
replicating the reference's stage contracts
(``im2scene/training_utils.py:197-881``):

* auto-resume from the newest ``models_{it:07d}`` checkpoint;
* sphere-init warmup saved as ``sdf_init_models`` (skipped on resume);
* periodic ``models_*`` saves + stage-final ``vol_renderer`` /
  ``full_pipeline`` artifacts;
* stage B starts from the stage-A EMA weights via shape-matched copy
  (``training_utils.py:604-610``) and alternates lazy-R1 D variants and
  path-length-reg G steps on the reference cadences;
* sample grids on a sweep-camera rig every ``sample_every`` iterations.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.cameras import generate_camera_params
from ..models.discriminator import (
    StyleDiscConfig,
    VolumeRenderDiscConfig,
    init_style_discriminator,
    init_volume_render_discriminator,
)
from ..models.generator import GeneratorConfig, generator_forward, init_generator
from ..parallel import data_parallel_jit, make_mesh, replicate, shard_batch
from ..utils.checkpoints import (
    checkpoint_exists,
    latest_checkpoint_step,
    load_checkpoint,
    save_checkpoint,
)
from ..utils.images import save_image_grid
from ..utils.logging import MetricsLogger
from .ema import EMA_DECAY, accumulate
from .optim import decoder_only, stage_a_optimizers, stage_b_optimizers
from .steps import (
    TrainHParams,
    make_sphere_init_step,
    make_stage_a_d_step,
    make_stage_a_g_step,
    make_stage_b_d_step,
    make_stage_b_g_step,
    make_stage_b_path_step,
)

Params = Dict[str, Any]


def _training_mesh(hp: "TrainHParams", mesh=None):
    """The data-parallel mesh for a stage: all devices when they divide the
    global batch, else the largest prefix that does (1-chip = the trivial
    mesh).  Completes the reference's DDP stub (``sdf_utils.py:334-379``)
    as the production path, not a side library."""
    if mesh is not None:
        return mesh
    devices = jax.devices()
    if jax.process_count() > 1:
        # Multi-process: trimming to a device PREFIX would drop whole
        # hosts whose loaders still produce batch shards — the global
        # batch must divide the full device set.
        if hp.batch % len(devices):
            raise ValueError(
                f"multi-process run: global batch {hp.batch} must divide "
                f"the {len(devices)}-device mesh"
            )
        return make_mesh(devices)
    n = len(devices)
    while hp.batch % n:
        n -= 1
    if n != len(devices):
        print(
            f"data-parallel mesh: using {n}/{len(devices)} devices "
            f"(global batch {hp.batch} must divide the mesh)"
        )
    return make_mesh(devices[:n])


def copy_matching(dst: Params, src: Params) -> Params:
    """Shape-matched partial state copy (reference cross-stage transfer,
    ``training_utils.py:604-610``): recursively take ``src`` values whose
    shapes match; keep ``dst`` elsewhere."""
    if isinstance(dst, dict):
        out = {}
        for k, v in dst.items():
            out[k] = copy_matching(v, src[k]) if isinstance(src, dict) and k in src else v
        return out
    if isinstance(dst, (list, tuple)):
        if isinstance(src, (list, tuple)) and len(src) == len(dst):
            res = [copy_matching(d, s) for d, s in zip(dst, src)]
            return type(dst)(res) if isinstance(dst, tuple) else res
        return dst
    if hasattr(dst, "shape") and hasattr(src, "shape") and dst.shape == src.shape:
        return src
    return dst


@functools.lru_cache(maxsize=8)
def _sample_fns(gcfg: GeneratorConfig, truncation: float):
    """Jitted (mean_latent, render_id) pair, cached per config — building
    fresh ``jax.jit`` wrappers inside ``_sample_grid`` would re-trace the
    full generator every ``sample_every`` iterations."""
    from ..models.generator import mean_latent

    jml = jax.jit(mean_latent, static_argnums=1)

    @jax.jit
    def render_id(params, z8, extr, focal, near, far, trunc):
        out = generator_forward(
            params, gcfg, [z8], extr, focal, near, far,
            truncation=truncation, truncation_latent=trunc,
        )
        return out.rgb if out.rgb is not None else out.thumb_rgb

    return jml, render_id


def _sample_grid(
    g_ema: Params,
    gcfg: GeneratorConfig,
    hp: TrainHParams,
    path: str,
    n_identities: int = 4,
    truncation: float = 0.7,
) -> None:
    """Render an (identities x 8 sweep views) grid from the EMA generator
    (reference sample cadence, ``training_utils.py:473-499``)."""
    key = jax.random.PRNGKey(0)
    kz, km = jax.random.split(key)
    z = jax.random.normal(kz, (n_identities, hp.style_dim))
    cams = generate_camera_params(
        gcfg.renderer.out_im_res,
        jax.random.PRNGKey(1),
        batch=n_identities,
        sweep=True,
        uniform=hp.camera.uniform,
        azim_range=hp.camera.azim,
        elev_range=hp.camera.elev,
        fov_ang=hp.camera.fov,
        dist_radius=hp.camera.dist_radius,
    )
    jml, render_id = _sample_fns(gcfg, truncation)
    trunc = jml(g_ema, gcfg, km)

    rows = []
    for i in range(n_identities):  # one identity (8 sweep views) at a time
        sl = slice(8 * i, 8 * (i + 1))
        z8 = jnp.repeat(z[i : i + 1], 8, axis=0)
        rows.append(np.asarray(render_id(
            g_ema, z8, cams.extrinsics[sl], cams.focal[sl], cams.near[sl],
            cams.far[sl], trunc,
        )))
    # Multi-process: every host executes the render (it's a global program
    # when g_ema lives on a cross-host mesh — skipping it on one host would
    # hang the collective), but only process 0 touches the shared fs.
    if jax.process_index() == 0:
        save_image_grid(np.concatenate(rows, axis=0), path, nrow=8)


def train_volume_renderer(
    loader,
    gcfg: GeneratorConfig,
    dcfg: VolumeRenderDiscConfig,
    hp: TrainHParams,
    out_dir: str,
    iters: int = 200000,
    sphere_init_iters: int = 10000,
    no_sphere_init: bool = False,
    save_every: int = 10000,
    sample_every: int = 1000,
    log_every: int = 100,
    seed: int = 0,
    exit_after: Optional[float] = None,
    mesh=None,
) -> Params:
    """Stage A (reference ``train_vol_render``, ``training_utils.py:197-549``).

    Runs data-parallel over ``mesh`` (default: all devices that divide the
    batch); params/opt state replicated, the real batch sharded on its
    leading dim, gradient averaging an XLA ``psum`` over ICI.
    Returns the EMA generator params; writes ``vol_renderer`` on completion.
    """
    mesh = _training_mesh(hp, mesh)
    os.makedirs(out_dir, exist_ok=True)
    logger = MetricsLogger(out_dir, "vol_render", print_every=log_every)
    key = jax.random.PRNGKey(seed)
    kg, kd = jax.random.split(key)
    g = init_generator(kg, gcfg)
    d = init_volume_render_discriminator(kd, dcfg)
    g_ema = jax.tree_util.tree_map(jnp.copy, g)

    g_tx, d_tx = stage_a_optimizers(hp.a_d_reg_every)
    g_state = g_tx.init(g)
    d_state = d_tx.init(d)

    start_iter = 0
    resumed = False
    latest = latest_checkpoint_step(out_dir)
    if latest is not None:
        ck = load_checkpoint(
            out_dir, f"models_{latest:07d}",
            {"g": g, "d": d, "g_ema": g_ema, "g_opt": g_state, "d_opt": d_state,
             "step": 0},
        )
        g, d, g_ema = ck["g"], ck["d"], ck["g_ema"]
        g_state, d_state = ck["g_opt"], ck["d_opt"]
        # checkpoints are written AFTER step i completes -> resume at i+1
        start_iter = int(ck["step"]) + 1
        resumed = True
        print(f"resumed volume renderer at step {start_iter}")
    elif checkpoint_exists(out_dir, "sdf_init_models"):
        ck = load_checkpoint(out_dir, "sdf_init_models", {"g": g, "g_ema": g_ema})
        g, g_ema = ck["g"], ck["g_ema"]
        resumed = True
        print("loaded sphere-initialized model")

    # Sphere init warmup (batch 3, main G optimizer; training_utils.py:287-327)
    if gcfg.renderer.with_sdf and not no_sphere_init and not resumed:
        init_hp = TrainHParams(batch=3, style_dim=hp.style_dim, camera=hp.camera)
        init_step = jax.jit(make_sphere_init_step(gcfg, init_hp, g_tx))
        t0 = time.time()
        for i in range(sphere_init_iters):
            key, sub = jax.random.split(key)
            g, g_state, m = init_step(g, g_state, sub)
            if i % max(log_every, 100) == 0:
                logger.log(i, {"sdf_init_loss": m["sdf_init_loss"]})
        g_ema = jax.tree_util.tree_map(jnp.copy, g)  # accumulate(·,·,0)
        save_checkpoint(out_dir, "sdf_init_models", {"g": g, "g_ema": g_ema})
        print(f"sphere init done in {time.time() - t0:.0f}s")
        # fresh optimizer state for the adversarial phase
        g_state = g_tx.init(g)

    # Replicate model/opt state onto the mesh; the jitted global program
    # shards only the real batch.  Donation halves peak HBM for the updates.
    g, d, g_ema, g_state, d_state = replicate((g, d, g_ema, g_state, d_state), mesh)
    d_step = data_parallel_jit(
        make_stage_a_d_step(gcfg, dcfg, hp, d_tx), mesh,
        batch_argnums=(4,), donate_argnums=(1, 2),
    )
    # Lazy stage-A R1 (TPU knob; reference parity is R1 every step): a
    # second compiled variant without the R1 double-backward, alternated by
    # interval exactly like the stage-B pair below.
    d_step_plain = (
        data_parallel_jit(
            make_stage_a_d_step(gcfg, dcfg, hp, d_tx, with_r1=False), mesh,
            batch_argnums=(4,), donate_argnums=(1, 2),
        )
        if hp.a_d_reg_every > 1
        else d_step
    )
    g_step = data_parallel_jit(
        make_stage_a_g_step(gcfg, dcfg, hp, g_tx), mesh, donate_argnums=(0, 2, 3)
    )

    data = iter(loader)
    t_start = time.time()
    # Per-iteration keys derive from the seed by fold_in(i), NOT from a
    # sequentially split stream: a resumed run must see fresh randomness at
    # step i, not a replay of the first segment's z/camera sequence.
    adv_key = jax.random.fold_in(jax.random.PRNGKey(seed), 1)
    for i in range(start_iter, iters):
        _, thumbs = next(data)
        k1, k2 = jax.random.split(jax.random.fold_in(adv_key, i))
        d_step_fn = d_step if i % hp.a_d_reg_every == 0 else d_step_plain
        d, d_state, dm = d_step_fn(g, d, d_state, k1, shard_batch(np.asarray(thumbs), mesh))
        g, g_state, g_ema, gm = g_step(g, d, g_state, g_ema, k2)
        if i % log_every == 0:
            # track the learned sigma sharpness beta = sigmoid(-sdf/b)/b —
            # its downward anneal is the SDF-is-tightening health signal
            beta = {}
            if "sigmoid_beta" in g.get("renderer", {}):
                beta["beta"] = float(np.asarray(g["renderer"]["sigmoid_beta"])[0])
            logger.log(i, {**{k: v for k, v in dm.items()}, **gm, **beta})
        if sample_every and i % sample_every == 0:
            _sample_grid(g_ema, gcfg, hp, os.path.join(out_dir, f"samples_{i:07d}.png"))
        if save_every and i and i % save_every == 0:
            save_checkpoint(
                out_dir, f"models_{i:07d}",
                {"g": g, "d": d, "g_ema": g_ema, "g_opt": g_state,
                 "d_opt": d_state, "step": i},
            )
        if exit_after is not None and time.time() - t_start > exit_after:
            save_checkpoint(
                out_dir, f"models_{i:07d}",
                {"g": g, "d": d, "g_ema": g_ema, "g_opt": g_state,
                 "d_opt": d_state, "step": i},
            )
            print("time budget reached; checkpoint saved (exit code 3 contract)")
            raise SystemExit(3)

    save_checkpoint(out_dir, "vol_renderer", {"g": g, "d": d, "g_ema": g_ema})
    logger.close()
    return g_ema


def train_full_pipeline(
    loader,
    gcfg: GeneratorConfig,
    dcfg: StyleDiscConfig,
    hp: TrainHParams,
    out_dir: str,
    vol_renderer_dir: Optional[str] = None,
    init_from: str = "vol_renderer",
    iters: int = 300000,
    save_every: int = 10000,
    sample_every: int = 1000,
    log_every: int = 100,
    seed: int = 0,
    exit_after: Optional[float] = None,
    mesh=None,
) -> Params:
    """Stage B (reference ``train_full_pipeline``,
    ``training_utils.py:552-881``).  Data-parallel over ``mesh`` like
    stage A.  Writes ``full_pipeline`` at the end."""
    mesh = _training_mesh(hp, mesh)
    os.makedirs(out_dir, exist_ok=True)
    logger = MetricsLogger(out_dir, "full_pipeline", print_every=log_every)
    key = jax.random.PRNGKey(seed)
    kg, kd = jax.random.split(key)
    g = init_generator(kg, gcfg)
    d = init_style_discriminator(kd, dcfg)

    g_tx_raw, d_tx = stage_b_optimizers(
        lr=2e-3, g_reg_every=hp.g_reg_every, d_reg_every=hp.d_reg_every
    )
    g_tx = decoder_only(g_tx_raw, g)
    g_state = g_tx.init(g)
    d_state = d_tx.init(d)

    start_iter = 0
    latest = latest_checkpoint_step(out_dir)
    if latest is not None:
        ck = load_checkpoint(
            out_dir, f"models_{latest:07d}",
            {"g": g, "d": d, "g_ema": g, "g_opt": g_state, "d_opt": d_state,
             "step": 0, "mean_path_length": jnp.zeros(())},
        )
        g, d = ck["g"], ck["d"]
        g_ema = ck["g_ema"]
        g_state, d_state = ck["g_opt"], ck["d_opt"]
        mean_path_length = ck["mean_path_length"]
        # checkpoints are written AFTER step i completes -> resume at i+1
        start_iter = int(ck["step"]) + 1
        print(f"resumed full pipeline at step {start_iter}")
    else:
        # load the stage-A EMA weights (or the sphere init for --wod)
        src_dir = vol_renderer_dir or out_dir
        if not checkpoint_exists(src_dir, init_from):
            # Failing silently here would train a FROZEN random renderer
            # for the whole stage (freeze_renderer + decoder-only
            # optimizer) — 300k wasted iterations.  The reference prompts
            # on a missing pretrained renderer (training_utils.py:597-602).
            raise FileNotFoundError(
                f"stage-B init checkpoint '{init_from}' not found under "
                f"{src_dir}; run stage A first (or sphere init for --wod)"
            )
        prev = load_checkpoint(src_dir, init_from)
        g = copy_matching(g, prev["g_ema"])
        print(f"initialized renderer from {init_from}")
        g_ema = jax.tree_util.tree_map(jnp.copy, g)
        mean_path_length = jnp.zeros(())

    g, d, g_ema, g_state, d_state, mean_path_length = replicate(
        (g, d, g_ema, g_state, d_state, mean_path_length), mesh
    )
    d_step_plain = data_parallel_jit(
        make_stage_b_d_step(gcfg, dcfg, hp, d_tx, False), mesh,
        batch_argnums=(4,), donate_argnums=(1, 2),
    )
    d_step_reg = data_parallel_jit(
        make_stage_b_d_step(gcfg, dcfg, hp, d_tx, True), mesh,
        batch_argnums=(4,), donate_argnums=(1, 2),
    )
    g_step = data_parallel_jit(
        make_stage_b_g_step(gcfg, dcfg, hp, g_tx), mesh, donate_argnums=(0, 2)
    )
    path_step = data_parallel_jit(
        make_stage_b_path_step(gcfg, hp, g_tx), mesh, donate_argnums=(0, 1)
    )
    # EMA folds in once per iteration AFTER path regularization (reference
    # training_utils.py:780) so path updates are never missing from g_ema.
    ema_step = data_parallel_jit(
        lambda e, gp: accumulate(e, gp, EMA_DECAY), mesh, donate_argnums=(0,)
    )

    data = iter(loader)
    t_start = time.time()
    # fold_in(i) keys: fresh randomness per step on resume (see stage A)
    adv_key = jax.random.fold_in(jax.random.PRNGKey(seed), 2)
    for i in range(start_iter, iters):
        imgs, _ = next(data)
        k1, k2, k3 = jax.random.split(jax.random.fold_in(adv_key, i), 3)
        d_step_fn = d_step_reg if i % hp.d_reg_every == 0 else d_step_plain
        d, d_state, dm = d_step_fn(g, d, d_state, k1, shard_batch(np.asarray(imgs), mesh))
        g, g_state, gm = g_step(g, d, g_state, k2)
        if hp.g_reg_every > 0 and i % hp.g_reg_every == 0:
            g, g_state, mean_path_length, pm = path_step(g, g_state, mean_path_length, k3)
            gm = {**gm, **pm}
        g_ema = ema_step(g_ema, g)
        if i % log_every == 0:
            logger.log(i, {**dm, **gm})
        if sample_every and i % sample_every == 0:
            _sample_grid(g_ema, gcfg, hp, os.path.join(out_dir, f"samples_{i:07d}.png"))
        if save_every and i and i % save_every == 0:
            save_checkpoint(
                out_dir, f"models_{i:07d}",
                {"g": g, "d": d, "g_ema": g_ema, "g_opt": g_state,
                 "d_opt": d_state, "step": i, "mean_path_length": mean_path_length},
            )
        if exit_after is not None and time.time() - t_start > exit_after:
            save_checkpoint(
                out_dir, f"models_{i:07d}",
                {"g": g, "d": d, "g_ema": g_ema, "g_opt": g_state,
                 "d_opt": d_state, "step": i, "mean_path_length": mean_path_length},
            )
            print("time budget reached; checkpoint saved (exit code 3 contract)")
            raise SystemExit(3)

    save_checkpoint(out_dir, "full_pipeline", {"g": g, "d": d, "g_ema": g_ema})
    logger.close()
    return g_ema
