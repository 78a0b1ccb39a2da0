"""Batched, prefetching data loader.

Replaces the reference's torch ``DataLoader`` + ``data_sampler``
(``train.py:110-127``): epoch shuffling, drop-last batching, and a
background thread that keeps ``prefetch`` host batches decoded ahead of
the accelerator.  Under data-parallel training the GLOBAL batch is
produced here and sharded onto the mesh by the caller
(:func:`sdface_gan_tpu.parallel.shard_batch`) — the XLA-native analog of
the reference's (incomplete) ``DistributedSampler`` path.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

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
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self.drop_last = drop_last

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

        def worker():
            epoch = 0
            rng = np.random.default_rng(self.seed)
            while not stop.is_set():
                order = self._epoch_indices(epoch)
                n_full = len(order) // self.batch_size
                for b in range(n_full):
                    if stop.is_set():
                        return
                    sel = order[b * self.batch_size : (b + 1) * self.batch_size]
                    imgs, thumbs = zip(
                        *(self.dataset.__getitem__(int(i), rng) for i in sel)
                    )
                    q.put((np.stack(imgs), np.stack(thumbs)))
                epoch += 1

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()
