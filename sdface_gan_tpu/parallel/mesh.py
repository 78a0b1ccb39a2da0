"""Device mesh + sharding rules for data-parallel training.

The reference's distributed story is an *incomplete* DDP stub — a
``WORLD_SIZE`` flag, a ``DistributedSampler`` and ``dist.reduce`` helpers
with no ``init_process_group`` anywhere (``sdf_utils.py:33-40,334-379``;
SURVEY.md §2.6).  The TPU rebuild completes it the XLA way:

* one ``jax.sharding.Mesh`` over all chips with a ``('data',)`` axis;
* the train step is written as a GLOBAL program — global batch, global
  means — and jitted with the batch annotated ``P('data')`` and params
  replicated ``P()``.  GSPMD partitions the program; gradient averaging
  becomes an XLA ``psum`` over ICI, which is exactly the collective the
  reference's ``reduce_loss_dict``/``reduce_sum`` emulate host-side.
* the per-ray sample axis stays LOCAL (cumprod over samples needs no
  collective), so ray/batch sharding is embarrassingly parallel — the
  volume-rendering analog of sequence parallelism noted in SURVEY.md §2.6.

Multi-host (multi-slice DCN) would add ``jax.distributed.initialize`` on
top; a single TPU slice needs only this module.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis_name: str = "data"
) -> Mesh:
    """A 1D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place a pytree fully replicated on the mesh (params, opt state)."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(tree, sharding)


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Place batch arrays sharded along their leading dim.

    Single-process: ``batch`` is the full global batch (device_put splits
    it over the local devices).  Multi-process: ``batch`` is this HOST'S
    slice (from ``DataLoader(host_id=..., num_hosts=...)``) and the global
    jax.Array is assembled from the per-process shards — completing the
    reference's ``DistributedSampler`` + DDP stub (``sdf_utils.py:44-52``).
    """
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, x), batch
        )
    return jax.device_put(batch, sharding)


def data_parallel_jit(
    step_fn,
    mesh: Mesh,
    batch_argnums: Sequence[int] = (),
    donate_argnums: Sequence[int] = (),
    axis_name: str = "data",
):
    """Jit a global-program train step for the mesh.

    Every argument is replicated except the ones in ``batch_argnums``,
    which are sharded on their leading dim.  Outputs are left to GSPMD
    (params/opt-state updates stay replicated because their inputs are).
    """

    def wrapper(*args):
        constrained = list(args)
        for i in batch_argnums:
            constrained[i] = jax.lax.with_sharding_constraint(
                constrained[i], batch_sharding(mesh, axis_name)
            )
        return step_fn(*constrained)

    return jax.jit(wrapper, donate_argnums=tuple(donate_argnums))
