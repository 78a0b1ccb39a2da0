"""Glob-based image dataset for the GIRAFFE/gan2d families.

Rebuild of the reference ``ImagesDataset`` (``im2scene/data/datasets.py:
104-191``): glob jpg/png/npy files, optional celebA center crop (108 for
celebA, 650 for HQ .npy), random or center crop, resize, hflip, output in
[0, 1] (or [-1, 1] with ``use_tanh_range``), with retry-on-corrupt-image.
NHWC float32.
"""

from __future__ import annotations

import glob
import random
from typing import Optional, Tuple

import numpy as np
from PIL import Image


class ImagesDataset:
    def __init__(
        self,
        path_glob: str,
        size: int = 64,
        celebA_center_crop: bool = False,
        random_crop: bool = False,
        use_tanh_range: bool = False,
        hflip: bool = True,
    ):
        self.files = sorted(glob.glob(path_glob))
        if not self.files:
            raise IOError(f"no images match {path_glob}")
        self.size = size
        self.celebA_center_crop = celebA_center_crop
        self.random_crop = random_crop
        self.use_tanh_range = use_tanh_range
        self.hflip = hflip

    def __len__(self) -> int:
        return len(self.files)

    def _load(self, path: str) -> Image.Image:
        if path.endswith(".npy"):
            arr = np.load(path)
            if arr.ndim == 4:
                arr = arr[0]
            if arr.shape[0] in (1, 3):  # CHW -> HWC
                arr = np.transpose(arr, (1, 2, 0))
            arr = np.clip(arr, 0, 255).astype(np.uint8)
            return Image.fromarray(arr)
        return Image.open(path).convert("RGB")

    def __getitem__(self, index: int, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        # retry on corrupt images (reference datasets.py:185-188)
        for _ in range(10):
            try:
                img = self._load(self.files[index])
                break
            except Exception:
                index = int(rng.integers(len(self.files)))
        else:
            raise IOError("too many corrupt images")

        w, h = img.size
        if self.celebA_center_crop:
            crop = 650 if self.files[index].endswith(".npy") else 108
            crop = min(crop, w, h)
            left, top = (w - crop) // 2, (h - crop) // 2
            img = img.crop((left, top, left + crop, top + crop))
        elif self.random_crop:
            crop = min(w, h)
            left = int(rng.integers(0, w - crop + 1))
            top = int(rng.integers(0, h - crop + 1))
            img = img.crop((left, top, left + crop, top + crop))
        else:
            crop = min(w, h)
            left, top = (w - crop) // 2, (h - crop) // 2
            img = img.crop((left, top, left + crop, top + crop))
        img = img.resize((self.size, self.size), Image.LANCZOS)
        if self.hflip and rng.random() > 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        arr = np.asarray(img, dtype=np.float32) / 255.0
        if self.use_tanh_range:
            arr = arr * 2.0 - 1.0
        return arr


class ImagesLoader:
    """Infinite shuffled batch iterator over an :class:`ImagesDataset`."""

    def __init__(self, dataset: ImagesDataset, batch_size: int, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        epoch = 0
        while True:
            order = np.arange(len(self.dataset))
            np.random.default_rng(self.seed + epoch).shuffle(order)
            n_full = len(order) // self.batch_size
            for b in range(max(n_full, 1)):
                sel = order[b * self.batch_size : (b + 1) * self.batch_size]
                if len(sel) < self.batch_size:
                    sel = np.resize(sel, self.batch_size)
                yield np.stack([self.dataset.__getitem__(int(i), rng) for i in sel])
            epoch += 1
