"""Batched, prefetching data loader.

Replaces the reference's torch ``DataLoader`` + ``data_sampler``
(``train.py:110-127``): epoch shuffling, drop-last batching, and a
background thread that keeps ``prefetch`` host batches decoded ahead of
the accelerator.  Under data-parallel training the GLOBAL batch is
produced here and sharded onto the mesh by the caller
(:func:`sdface_gan_tpu.parallel.shard_batch`) — the XLA-native analog of
the reference's (incomplete) ``DistributedSampler`` path.

Lifecycle contract (the part the torch worker pool gets from
``_MultiProcessingDataLoaderIter.__del__``): worker threads never block
indefinitely on a full queue — they re-check the stop flag on a timeout —
and :meth:`close` (or the context manager / generator finalizer) stops
and JOINS every worker before returning, so no thread can touch the
dataset after the caller tears it down.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional, Tuple

import numpy as np

from .dataset import MultiResolutionDataset


class DataLoader:
    def __init__(
        self,
        dataset: MultiResolutionDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        prefetch: int = 4,
        drop_last: bool = True,
        host_id: int = 0,
        num_hosts: int = 1,
    ):
        """``batch_size`` is the GLOBAL batch.  Under multi-host training
        pass ``host_id=jax.process_index(), num_hosts=jax.process_count()``:
        every host draws the same epoch permutation (same seed) and yields
        its ``batch_size // num_hosts``-example slice of each global batch —
        the jax.Array-native replacement for the reference's
        ``DistributedSampler`` (``sdf_utils.py:44-52``)."""
        if batch_size % num_hosts != 0:
            raise ValueError(
                f"global batch {batch_size} must divide across {num_hosts} hosts"
            )
        if not (0 <= host_id < num_hosts):
            raise ValueError(f"host_id {host_id} out of range [0, {num_hosts})")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.host_id = host_id
        self.num_hosts = num_hosts
        self._workers: List[Tuple[threading.Event, threading.Thread]] = []
        self._lock = threading.Lock()

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Infinite iterator over (imgs, thumbs) batches (the reference's
        ``sample_data`` loops the loader forever, ``sdf_utils.py:55-67``)."""
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        _DEAD = object()  # sentinel: worker exited, nothing more will come

        def put_bounded(item) -> None:
            # Bounded put: never block forever on a consumer that has gone
            # away — re-check stop between attempts.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return
                except queue.Full:
                    continue

        def worker():
            epoch = 0
            rng = np.random.default_rng(self.seed)
            try:
                while not stop.is_set():
                    order = self._epoch_indices(epoch)
                    n_full = len(order) // self.batch_size
                    for b in range(n_full):
                        if stop.is_set():
                            return
                        sel = order[b * self.batch_size : (b + 1) * self.batch_size]
                        # this host's contiguous slice of the global batch
                        per_host = self.batch_size // self.num_hosts
                        sel = sel[self.host_id * per_host : (self.host_id + 1) * per_host]
                        imgs, thumbs = zip(
                            *(self.dataset.__getitem__(int(i), rng) for i in sel)
                        )
                        put_bounded((np.stack(imgs), np.stack(thumbs)))
                    epoch += 1
            except BaseException as e:  # dataset torn down / corrupt record
                # Fail LOUDLY at the consumer: a silent worker death would
                # leave the training loop blocked in q.get() forever.
                put_bounded((_DEAD, e))
            else:
                put_bounded((_DEAD, None))

        t = threading.Thread(target=worker, daemon=True)
        with self._lock:
            self._workers.append((stop, t))
        t.start()
        try:
            while True:
                item = q.get()
                if item and item[0] is _DEAD:
                    if item[1] is not None:
                        raise RuntimeError(
                            "DataLoader worker died"
                        ) from item[1]
                    return
                yield item
        finally:
            stop.set()
            # Unblock a worker stuck in q.put by draining, then join.
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=10.0)
            with self._lock:
                self._workers = [w for w in self._workers if w[1] is not t]

    def close(self) -> None:
        """Stop and join every live worker thread.

        After this returns no loader thread touches ``self.dataset``, so
        the caller may safely ``dataset.close()`` (munmap the record
        store).  Idempotent."""
        with self._lock:
            workers, self._workers = self._workers, []
        for stop, _ in workers:
            stop.set()
        for _, t in workers:
            t.join(timeout=10.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
