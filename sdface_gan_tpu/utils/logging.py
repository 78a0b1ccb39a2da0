"""Metrics logging: stdout + JSONL + optional wandb + profiler hooks.

The reference logs through tqdm descriptions and optional wandb scalars
(``training_utils.py:455-523``); it has no tracing at all (SURVEY.md §5).
Here metrics are a first-class module: every ``log()`` appends one JSON
line (machine-readable training curves), mirrors to stdout at a cadence,
forwards to wandb if importable, and ``trace()`` wraps a step in a
``jax.profiler`` trace for TPU timeline capture.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(
        self,
        out_dir: str,
        name: str = "train",
        print_every: int = 10,
        use_wandb: bool = False,
        wandb_project: Optional[str] = None,
    ):
        # Multi-process runs log from process 0 only (every host computes
        # the same psum-reduced metrics, so other hosts' lines would be
        # duplicates interleaved into the same file on a shared fs).
        try:
            import jax

            self._primary = jax.process_index() == 0
        except Exception:
            self._primary = True
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, f"{name}_metrics.jsonl")
        self._file = open(self.path, "a") if self._primary else None
        self.print_every = print_every
        self._last_print = 0.0
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore

                wandb.init(project=wandb_project or "sdface_gan_tpu", name=name)
                self._wandb = wandb
            except ImportError:
                pass

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        if not self._primary:
            return
        row = {"step": step, "time": time.time()}
        row.update({k: float(v) for k, v in metrics.items()})
        self._file.write(json.dumps(row) + "\n")
        self._file.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if step % self.print_every == 0:
            desc = " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items())
            now = time.time()
            dt = now - self._last_print if self._last_print else 0.0
            self._last_print = now
            print(f"[{step}] {desc} ({dt:.1f}s/{self.print_every}it)", flush=True)

    @contextmanager
    def trace(self, trace_dir: Optional[str] = None):
        """Capture a jax.profiler trace around a block (TPU timeline)."""
        import jax

        d = trace_dir or os.path.join(os.path.dirname(self.path), "traces")
        jax.profiler.start_trace(d)
        try:
            yield d
        finally:
            jax.profiler.stop_trace()

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
