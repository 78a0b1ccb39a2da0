"""Real multi-process execution of the data-parallel training path.

The reference's distributed path is a stub — ``sdf_utils.py:334-379``
defines DDP/sampler setup helpers that are never wired to
``init_process_group``.  This framework's substitute is
``_training_mesh``'s ``jax.process_count() > 1`` branch plus the per-host
batch assembly in ``parallel.mesh.shard_batch``
(``make_array_from_process_local_data``).  Everything else in the suite
exercises those on a single-process 8-device mesh; this test actually
launches TWO coordinated processes (4 virtual CPU devices each, gloo
collectives) and drives one stage-A segment end to end through the
production ``train_volume_renderer`` loop — including the orbax
``vol_renderer`` save, which is a cross-process collective.

The assertion is equivalence: a 2-process x 4-device run and a
1-process x 8-device run of the same seed and the same deterministic
global batch are the SAME global program, so their psum-reduced losses
must match.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The child re-creates the dryrun-sized stage-A setup.  The global batch
# is deterministic (seeded rng, regenerated identically on every host);
# each host feeds only its slice, and shard_batch reassembles the global
# array — so 1-proc and 2-proc runs see bit-identical data.
_CHILD = r"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon
pid, nproc, port, out_dir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
if nproc > 1:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
assert len(jax.devices()) == 8, jax.devices()

import numpy as np

from sdface_gan_tpu.models.discriminator import VolumeRenderDiscConfig
from sdface_gan_tpu.models.generator import GeneratorConfig
from sdface_gan_tpu.models.renderer import RendererConfig
from sdface_gan_tpu.training import TrainHParams
from sdface_gan_tpu.training.loop import train_volume_renderer

hp = TrainHParams(batch=8, style_dim=16)
gcfg = GeneratorConfig(
    size=16, style_dim=16, full_pipeline=False,
    renderer=RendererConfig(
        type="sdf", out_im_res=8, n_samples=4, style_dim=16, width=16, depth=2
    ),
)


def loader():
    rng = np.random.default_rng(0)
    lo = pid * hp.batch // nproc
    hi = (pid + 1) * hp.batch // nproc
    while True:
        imgs = rng.uniform(-1, 1, (hp.batch, 16, 16, 3)).astype(np.float32)
        thumbs = rng.uniform(-1, 1, (hp.batch, 8, 8, 3)).astype(np.float32)
        yield imgs[lo:hi], thumbs[lo:hi]


train_volume_renderer(
    loader(), gcfg, VolumeRenderDiscConfig(in_res=8), hp, out_dir,
    iters=2, sphere_init_iters=1, save_every=0, sample_every=0,
    log_every=1, mesh=None,  # mesh=None: exercise _training_mesh's branch
)
print(f"child {pid}/{nproc} done", flush=True)
"""


def _run(nproc: int, out_dir: str, n_local_devices: int) -> None:
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [REPO, env.get("PYTHONPATH", "")] if p
    )
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    env["JAX_PLATFORMS"] = "cpu"
    with socket.socket() as s:  # free coordinator port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, str(pid), str(nproc), str(port),
             out_dir],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(nproc)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out[-3000:]}"


def _read_metrics(out_dir: str):
    rows = {}
    with open(os.path.join(out_dir, "vol_render_metrics.jsonl")) as f:
        for line in f:
            row = json.loads(line)
            rows[row["step"]] = row
    return rows


@pytest.mark.slow
def test_two_process_stage_a_matches_single_process(tmp_path):
    one = str(tmp_path / "one")
    two = str(tmp_path / "two")
    _run(1, one, n_local_devices=8)
    _run(2, two, n_local_devices=4)

    m1, m2 = _read_metrics(one), _read_metrics(two)
    assert set(m1) == set(m2) and len(m1) >= 2
    for step in sorted(m1):
        for key in ("d", "g", "r1", "g_eikonal"):
            np.testing.assert_allclose(
                m1[step][key], m2[step][key], rtol=2e-4, atol=1e-5,
                err_msg=f"step {step} metric {key}",
            )
    # the final orbax save is a cross-process collective; both layouts
    # must have produced the stage artifact
    for d in (one, two):
        assert os.path.isdir(os.path.join(d, "vol_renderer"))
    # process-0-only logging: the 2-proc file has exactly as many lines as
    # the 1-proc file (no duplicate interleaving from the second host)
    def _lines(d):
        with open(os.path.join(d, "vol_render_metrics.jsonl")) as f:
            return sum(1 for _ in f)

    assert _lines(two) == _lines(one)
