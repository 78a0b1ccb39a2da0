"""Checkpointing with the reference's three-stage artifact contract.

Rebuild of two reference schemes (SURVEY.md §5):
* SDF stages: periodic ``models_{it:07d}`` under
  ``out/<exp>/{volume_renderer,full_pipeline,encoder}/`` plus stage-final
  artifacts ``sdf_init_models`` / ``vol_renderer`` / ``full_pipeline``
  (``training_utils.py:318-327,525-549,857-881``), with auto-resume by
  directory scan (``get_ckpt_nums``, ``sdf_utils.py:382-401``).
* GIRAFFE ``CheckpointIO`` dict-of-states with scalars
  (``checkpoints.py:9-126``).

Storage is orbax (atomic directory checkpoints of pytrees); scalars ride
along in the same tree.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


def _path(base: str, name: str) -> str:
    return os.path.abspath(os.path.join(base, name))


def save_checkpoint(base_dir: str, name: str, tree: Dict[str, Any]) -> str:
    """Save a pytree checkpoint (overwrites).

    Multi-process safe: every process must call this (orbax's save is a
    collective over the global arrays), but the overwrite-cleanup runs on
    process 0 only, behind a barrier — otherwise two hosts race
    ``rmtree`` against each other on a shared filesystem.  Completes the
    reference's DDP stub semantics (``sdf_utils.py:334-379`` never ran
    multi-process, so it never had to answer this)."""
    import jax

    path = _path(base_dir, name)
    os.makedirs(base_dir, exist_ok=True)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        if jax.process_index() == 0 and os.path.exists(path):
            shutil.rmtree(path)
        multihost_utils.sync_global_devices(f"save_checkpoint:{name}")
        tree = _globalize_host_local(tree)
    elif os.path.exists(path):
        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree)
    return path


def _globalize_host_local(tree: Any) -> Any:
    """Lift host-local arrays onto a replicated global sharding.

    Pre-mesh state (e.g. the sphere-init params, computed identically on
    every host before ``replicate()``) lives on single local devices;
    orbax refuses to serialize host-local arrays in a multi-process run.
    Every host holds the same values, so a replicated ``device_put`` of
    the host copy is exact."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    rep = NamedSharding(Mesh(np.asarray(jax.devices()), ("_ckpt",)),
                        PartitionSpec())

    def _lift(x):
        if isinstance(x, jax.Array) and (
            len(x.sharding.device_set) < jax.device_count()
        ):
            return jax.device_put(np.asarray(x), rep)
        return x

    return jax.tree_util.tree_map(_lift, tree)


def _select_like(target: Any, loaded: Any, path: str = "") -> Any:
    """Project a fully-restored tree onto the (possibly partial) target
    structure — e.g. restoring only ``g_ema`` out of ``{g, d, g_ema}``
    (the reference loads sub-state-dicts the same way, ``eval.py:71-77``)."""
    if isinstance(target, dict):
        out = {}
        for k, v in target.items():
            if not (isinstance(loaded, dict) and k in loaded):
                # e.g. restoring a stage-B template from a stage-A
                # checkpoint: name the missing subtree instead of a bare
                # KeyError so the wrong-stage/wrong-layout cause is visible
                have = sorted(loaded.keys()) if isinstance(loaded, dict) else type(loaded).__name__
                raise KeyError(
                    f"checkpoint restore: target expects {path + k!r} but the "
                    f"saved tree has {have} — wrong-stage or old-layout "
                    "checkpoint under this directory?"
                )
            out[k] = _select_like(v, loaded[k], f"{path}{k}/")
        return out
    if isinstance(target, (list, tuple)):
        if not isinstance(loaded, (list, tuple)) or len(loaded) < len(target):
            have = (
                f"a {len(loaded)}-element sequence"
                if isinstance(loaded, (list, tuple))
                else type(loaded).__name__
            )
            raise KeyError(
                f"checkpoint restore: target expects a {len(target)}-element "
                f"sequence at {path or '/'!r} but the saved tree has {have} — "
                "wrong-stage or old-layout checkpoint under this directory?"
            )
        seq = [_select_like(t, loaded[i], f"{path}{i}/") for i, t in enumerate(target)]
        return type(target)(seq) if isinstance(target, tuple) else seq
    return loaded


def load_checkpoint(
    base_dir: str, name: str, target: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    """Load a checkpoint; ``target`` (matching pytree of arrays) restores
    exact dtypes/shapes, and may be a SUBTREE of what was saved (partial
    restore)."""
    path = _path(base_dir, name)
    with ocp.StandardCheckpointer() as ckptr:
        if target is None:
            return ckptr.restore(path)
        try:
            return ckptr.restore(path, target)
        except (ValueError, KeyError):
            full = ckptr.restore(path)
            return _select_like(target, full)


def checkpoint_exists(base_dir: str, name: str) -> bool:
    return os.path.isdir(_path(base_dir, name))


def latest_checkpoint_step(base_dir: str, prefix: str = "models_") -> Optional[int]:
    """Scan for the newest ``models_{step:07d}`` checkpoint (reference
    ``get_ckpt_nums`` regex scan, ``sdf_utils.py:382-401``)."""
    if not os.path.isdir(base_dir):
        return None
    best = None
    pat = re.compile(rf"^{re.escape(prefix)}(\d+)$")
    for entry in os.listdir(base_dir):
        m = pat.match(entry)
        if m:
            step = int(m.group(1))
            best = step if best is None or step > best else best
    return best


def is_url(name: str) -> bool:
    """URL detection (reference ``checkpoints.py:119-126``), extended with
    ``file://`` so the download path is testable without egress."""
    from urllib.parse import urlparse

    return urlparse(name).scheme in ("http", "https", "file")


class CheckpointIO:
    """GIRAFFE-style named checkpoint manager (reference
    ``checkpoints.py:9-126``): one dict holding model/optimizer states and
    scalars, with ``model.pt``-like named saves, numbered backups and
    best-model copies.  ``load`` accepts URLs like the reference's
    ``model_zoo.load_url`` path (``checkpoints.py:89-98``) — fetched into a
    local cache, then parsed as a torch state dict (``.pt``/``.pth``, fed
    to the ``utils/torch_import`` importers downstream) or a zipped orbax
    checkpoint."""

    def __init__(self, checkpoint_dir: str):
        self.checkpoint_dir = checkpoint_dir
        os.makedirs(checkpoint_dir, exist_ok=True)

    def save(self, filename: str, **kwargs: Any) -> str:
        return save_checkpoint(self.checkpoint_dir, filename, dict(kwargs))

    def load(self, filename: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        if is_url(filename):
            return self.load_url(filename, target)
        if not checkpoint_exists(self.checkpoint_dir, filename):
            raise FileNotFoundError(os.path.join(self.checkpoint_dir, filename))
        return load_checkpoint(self.checkpoint_dir, filename, target)

    def load_url(self, url: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        """Fetch + parse a remote checkpoint (reference
        ``checkpoints.py:89-98``).  Torch archives are returned as plain
        nested dicts of numpy arrays (state-dict form the torch importers
        consume); ``.zip`` archives are extracted and orbax-restored."""
        import hashlib
        import urllib.request
        import zipfile
        from urllib.parse import urlparse

        cache = os.path.join(self.checkpoint_dir, "_url_cache")
        os.makedirs(cache, exist_ok=True)
        base = os.path.basename(urlparse(url).path) or "checkpoint"
        tag = hashlib.sha1(url.encode()).hexdigest()[:10]
        local = os.path.join(cache, f"{tag}_{base}")
        if not os.path.exists(local):
            print(f"=> Loading checkpoint from url... {url}")
            # Download to a temp name and rename atomically: an interrupted
            # fetch must not leave a truncated file that os.path.exists
            # would treat as a valid cache hit forever after.
            tmp = local + ".part"
            urllib.request.urlretrieve(url, tmp)
            os.replace(tmp, local)
        if base.endswith((".pt", ".pth")):
            import numpy as np
            import torch

            sd = torch.load(local, map_location="cpu", weights_only=False)

            def to_np(v: Any) -> Any:
                if isinstance(v, torch.Tensor):
                    return np.asarray(v.detach().numpy())
                if isinstance(v, dict):
                    return {k: to_np(x) for k, x in v.items()}
                return v

            return to_np(sd)
        if base.endswith(".zip"):
            name = f"{tag}_{base[:-4]}"
            dst = _path(cache, name)
            if not os.path.isdir(dst):
                with zipfile.ZipFile(local) as zf:
                    zf.extractall(dst)
            # the archive may wrap the checkpoint in one root directory
            entries = os.listdir(dst)
            root = dst if len(entries) != 1 else os.path.join(dst, entries[0])
            return load_checkpoint(os.path.dirname(root), os.path.basename(root), target)
        raise ValueError(f"unsupported remote checkpoint format: {base}")

    def exists(self, filename: str) -> bool:
        return checkpoint_exists(self.checkpoint_dir, filename)

    def backup_model_best(self, filename: str = "model_best") -> Optional[str]:
        """Timestamped copy of the best checkpoint (reference
        ``checkpoints.py:42-55``)."""
        import time

        src = _path(self.checkpoint_dir, filename)
        if not os.path.isdir(src):
            return None
        ts = time.strftime("%Y_%m_%d_%H_%M_%S")
        dst = _path(self.checkpoint_dir, f"backup_{ts}_{filename}")
        shutil.copytree(src, dst)
        return dst
