"""Multi-resolution face dataset over the native record store.

Rebuild of the reference ``MultiResolutionDataset``
(``im2scene/sdf/models/sdf_utils.py:404-444``): records keyed
``f"{size}-{idx:05d}"`` hold encoded images; ``__getitem__`` returns the
image at the training resolution plus a 64^2 thumb produced by HAMMING
resize, both randomly h-flipped together and normalized to [-1, 1].

Differences from the reference (deliberate, TPU-first):
* storage is the mmap'd native record store (LMDB is not in this image;
  same logical key scheme — ``prepare.py`` writes it);
* arrays are channel-LAST float32 (NHWC), ready for device upload;
* randomness is an explicit ``numpy.random.Generator`` per call, so
  multi-worker loading is reproducible.
"""

from __future__ import annotations

import glob as _glob
import io
import os
from typing import Optional, Tuple

import numpy as np
from PIL import Image

from ..native import RecordReader


def resolve_record_dir(yaml_path: str) -> str:
    """Resolve a yaml ``data.path`` to a record-store directory.

    The reference keeps two path conventions — a GIRAFFE image glob
    (``data/ffhq/images/*.png``) and the SDF stages' separate
    ``--dataset_path`` lmdb dir (``config.py:150-167`` vs
    ``sdf_utils.py:455``).  Here one yaml key serves both: accept the
    store dir itself, a parent containing ``records/``, or a glob whose
    dirname is either.  Shared by every stage that opens the loader
    (train.py stages A/B, the stage-C encoder loop).
    """

    def is_store(d: str) -> bool:
        return os.path.isfile(os.path.join(d, "index.bin"))

    for cand in (yaml_path, os.path.join(yaml_path, "records"),
                 os.path.dirname(yaml_path),
                 os.path.join(os.path.dirname(yaml_path), "records")):
        if cand and is_store(cand):
            return cand
    return yaml_path if not _glob.has_magic(yaml_path) else os.path.dirname(yaml_path)


def _open_store(path: str) -> RecordReader:
    """Open a record store, naming the layouts ``resolve_record_dir``
    probes when it's missing (an unprepared checkout should fail with an
    actionable message, not just the post-resolution directory)."""
    try:
        return RecordReader(path)
    except IOError as e:
        raise IOError(
            f"no record store under {path!r} (need index.bin/data.bin as "
            "written by prepare_data.py; the yaml data.path may be the "
            "store dir itself, a parent containing records/, or an image "
            "glob whose dirname is either — run prepare_data.py first if "
            "this checkout has no prepared dataset)"
        ) from e


class MultiResolutionDataset:
    def __init__(
        self,
        path: str,
        resolution: int = 256,
        nerf_resolution: int = 64,
        hflip: bool = True,
    ):
        self.reader = _open_store(path)
        length = self.reader.get("length")
        if length is None:
            raise IOError(f"record store at {path} has no 'length' key")
        self.length = int(length.decode())
        self.resolution = resolution
        self.nerf_resolution = nerf_resolution
        self.hflip = hflip

    def __len__(self) -> int:
        return self.length

    def __getitem__(
        self, index: int, rng: Optional[np.random.Generator] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        key = f"{self.resolution}-{str(index).zfill(5)}"
        data = self.reader.get(key)
        if data is None:
            raise KeyError(key)
        img = Image.open(io.BytesIO(data)).convert("RGB")

        rng = rng or np.random.default_rng()
        if self.hflip and rng.random() > 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)

        thumb = img.resize(
            (self.nerf_resolution, self.nerf_resolution), Image.HAMMING
        )
        return self._to_array(img), self._to_array(thumb)

    @staticmethod
    def _to_array(img: Image.Image) -> np.ndarray:
        """uint8 HWC -> float32 [-1, 1] HWC (torch Normalize(0.5, 0.5))."""
        arr = np.asarray(img, dtype=np.float32) / 255.0
        return arr * 2.0 - 1.0

    def close(self) -> None:
        self.reader.close()


class LSUNClass:
    """LSUN-style dataset over the record store (reference ``LSUNClass``,
    ``im2scene/data/datasets.py:20-101``, which reads LSUN LMDB; LMDB is
    not in this image, so LSUN archives are converted with
    ``prepare_data.py`` — records keyed by zero-padded index).  Returns
    center-cropped, resized images in [0, 1] (or [-1, 1] with
    ``use_tanh_range``), with retry-on-corrupt-record."""

    def __init__(self, path: str, size: int = 64, use_tanh_range: bool = False,
                 hflip: bool = True, key_width: int = 5, resolution_prefix: str = ""):
        self.reader = _open_store(path)
        length = self.reader.get("length")
        self.length = int(length.decode()) if length else len(self.reader)
        self.size = size
        self.use_tanh_range = use_tanh_range
        self.hflip = hflip
        self.key_width = key_width
        self.prefix = resolution_prefix

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, index, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        for _ in range(10):
            key = f"{self.prefix}{str(index).zfill(self.key_width)}"
            data = self.reader.get(key)
            if data is not None:
                break
            index = int(rng.integers(self.length))
        img = Image.open(io.BytesIO(data)).convert("RGB")
        w, h = img.size
        crop = min(w, h)
        img = img.crop(((w - crop) // 2, (h - crop) // 2,
                        (w + crop) // 2, (h + crop) // 2))
        img = img.resize((self.size, self.size), Image.LANCZOS)
        if self.hflip and rng.random() > 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        arr = np.asarray(img, dtype=np.float32) / 255.0
        if self.use_tanh_range:
            arr = arr * 2.0 - 1.0
        return arr
