"""Dataset preparation: image folder -> multi-resolution record store.

Rebuild of the reference ``prepare_data.py``: LANCZOS resize +
center-crop each image to every requested size, encode to PNG, store under
``f"{size}-{idx:05d}"`` with a final ``length`` record.  Resizing fans out
over a process pool (CPU-bound); the single writer appends in order.
"""

from __future__ import annotations

import io
import os
from concurrent.futures import ProcessPoolExecutor
from typing import List, Sequence, Tuple

from PIL import Image

from ..native import RecordWriter

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")


def _resize_one(args: Tuple[int, str, Sequence[int]]) -> Tuple[int, List[bytes]]:
    idx, path, sizes = args
    img = Image.open(path).convert("RGB")
    outs = []
    for size in sizes:
        # resize shorter side to `size`, then center crop (torchvision
        # Resize+CenterCrop semantics, reference prepare_data.py:14-40)
        w, h = img.size
        if w <= h:
            nw, nh = size, max(size, round(size * h / w))
        else:
            nw, nh = max(size, round(size * w / h)), size
        resized = img.resize((nw, nh), Image.LANCZOS)
        left = (nw - size) // 2
        top = (nh - size) // 2
        cropped = resized.crop((left, top, left + size, top + size))
        buf = io.BytesIO()
        cropped.save(buf, format="PNG")
        outs.append(buf.getvalue())
    return idx, outs


def list_images(in_dir: str) -> List[str]:
    files = []
    for root, _, names in os.walk(in_dir):
        for n in sorted(names):
            if n.lower().endswith(IMAGE_EXTS):
                files.append(os.path.join(root, n))
    files.sort()
    return files


def prepare_data(
    in_dir: str,
    out_path: str,
    sizes: Sequence[int] = (64, 128, 256, 512, 1024),
    n_workers: int = 8,
) -> int:
    """Build the record store.  Returns the number of images written."""
    files = list_images(in_dir)
    jobs = [(i, f, tuple(sizes)) for i, f in enumerate(files)]
    results: dict = {}
    with RecordWriter(out_path) as writer:
        if n_workers > 1 and len(jobs) > 1:
            with ProcessPoolExecutor(max_workers=n_workers) as pool:
                for idx, blobs in pool.map(_resize_one, jobs, chunksize=8):
                    results[idx] = blobs
        else:
            for job in jobs:
                idx, blobs = _resize_one(job)
                results[idx] = blobs
        for idx in range(len(files)):
            for size, blob in zip(sizes, results[idx]):
                writer.put(f"{size}-{str(idx).zfill(5)}", blob)
        writer.put("length", str(len(files)).encode())
    return len(files)
