#!/usr/bin/env python
"""Standalone FID between an image dump (.npy / directory) and precomputed
stats (reference ``eval_files.py``)."""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Score FID for stored images.")
    p.add_argument("images", type=str, help=".npy image array or a directory of images")
    p.add_argument("--fid_file", type=str, required=True)
    p.add_argument("--batch", type=int, default=50)
    p.add_argument("--inception_weights", type=str, default=None)
    args = p.parse_args(argv)

    import numpy as np

    from sdface_gan_tpu.evaluation import (
        calculate_activation_statistics,
        calculate_frechet_distance,
        compute_activations,
        load_inception,
        load_stats_npz,
    )

    def batches():
        if args.images.endswith(".npy"):
            arr = np.load(args.images)
            if arr.shape[1] in (1, 3):  # NCHW -> NHWC
                arr = np.transpose(arr, (0, 2, 3, 1))
            if arr.max() > 1.5:  # uint8 range
                arr = arr.astype(np.float32) / 127.5 - 1.0
            for i in range(0, len(arr), args.batch):
                yield arr[i : i + args.batch].astype(np.float32)
        else:
            from PIL import Image

            names = sorted(os.listdir(args.images))
            for i in range(0, len(names), args.batch):
                imgs = []
                for n in names[i : i + args.batch]:
                    img = Image.open(os.path.join(args.images, n)).convert("RGB")
                    imgs.append(np.asarray(img, np.float32) / 127.5 - 1.0)
                yield np.stack(imgs)

    inc = load_inception(args.inception_weights)
    first = next(batches())
    img_size = int(first.shape[1])

    def all_batches():
        yield first
        it = batches()
        next(it)  # skip the batch already yielded
        yield from it

    acts = compute_activations(inc, all_batches(), batch_size=args.batch)
    mu, sigma = calculate_activation_statistics(acts)
    mu_r, s_r = load_stats_npz(args.fid_file, expect_img_size=img_size)
    print(f"FID: {calculate_frechet_distance(mu, sigma, mu_r, s_r):.4f}")


if __name__ == "__main__":
    main()
