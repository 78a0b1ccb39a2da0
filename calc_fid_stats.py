#!/usr/bin/env python
"""Precompute real-image FID statistics (mu, sigma) to an .npz.

Produces the ``fid_file`` consumed by eval.py / the GIRAFFE validator
(the reference ships these as ``data/*/fid_files/*.npz`` without the
generation tool; this closes that gap).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Precompute FID stats.")
    p.add_argument("images", type=str, help="directory of real images")
    p.add_argument("--out", type=str, required=True, help="output .npz path")
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--n_images", type=int, default=50000)
    p.add_argument("--batch", type=int, default=50)
    p.add_argument("--inception_weights", type=str, default=None)
    args = p.parse_args(argv)

    import numpy as np
    from PIL import Image

    from sdface_gan_tpu.evaluation import (
        calculate_activation_statistics,
        compute_activations,
        load_inception,
    )

    names = sorted(os.listdir(args.images))[: args.n_images]

    def batches():
        for i in range(0, len(names), args.batch):
            imgs = []
            for n in names[i : i + args.batch]:
                img = Image.open(os.path.join(args.images, n)).convert("RGB")
                img = img.resize((args.img_size, args.img_size), Image.LANCZOS)
                imgs.append(np.asarray(img, np.float32) / 127.5 - 1.0)
            yield np.stack(imgs)

    inc = load_inception(args.inception_weights)
    acts = compute_activations(inc, batches(), batch_size=args.batch)
    mu, sigma = calculate_activation_statistics(acts)
    np.savez(args.out, mu=mu, sigma=sigma, img_size=args.img_size)
    print(f"wrote stats for {len(acts)} images to {args.out}")


if __name__ == "__main__":
    main()
