#!/usr/bin/env python
"""Render docs/img/*_curves.png from a stage metrics JSONL (--stage a/b/c).

Small multiples, one metric per axis (never dual-axis); two-series panels
(viewpoint, D scores) use the validated adjacent categorical pair
blue/orange with a legend; single-series panels are blue with the panel
title naming the series.  Raw series drawn faint with a rolling-mean
overlay so the trend reads without hiding variance.
"""

from __future__ import annotations

import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

BLUE, ORANGE = "#2a78d6", "#eb6834"
INK, MUTED, GRID = "#1a1a1a", "#555555", "#e3e3e3"


def load(path):
    rows = [json.loads(line) for line in open(path)]
    # The loop appends across launches.  A clean resume continues at i+1
    # (steps keep increasing); a restart-from-scratch rewinds the step
    # counter.  Keep only the final monotonic segment so curves from a
    # crashed earlier attempt don't criss-cross the completed run.
    start = 0
    for i in range(1, len(rows)):
        if rows[i]["step"] <= rows[i - 1]["step"]:
            start = i
    rows = rows[start:]
    series = {}
    for r in rows:
        for k, v in r.items():
            if k == "time":
                continue
            series.setdefault(k, []).append((r["step"], v))
    return {k: np.asarray(v) for k, v in series.items()}


def smooth(y, w=9):
    if len(y) < w:
        return y
    k = np.ones(w) / w
    pad = np.concatenate([np.full(w // 2, y[0]), y, np.full(w // 2, y[-1])])
    return np.convolve(pad, k, mode="valid")


def panel(ax, series, keys, title, colors=(BLUE, ORANGE), labels=None):
    for (key, c, lbl) in zip(keys, colors, labels or keys):
        if key not in series:
            continue
        s = series[key]
        ax.plot(s[:, 0], s[:, 1], color=c, lw=0.8, alpha=0.3)
        ax.plot(s[:, 0], smooth(s[:, 1]), color=c, lw=1.8, label=lbl)
    ax.set_title(title, fontsize=10, color=INK, loc="left")
    ax.grid(color=GRID, lw=0.6)
    ax.tick_params(colors=MUTED, labelsize=8)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(GRID)
    if labels and len([k for k in keys if k in series]) > 1:
        ax.legend(fontsize=8, frameon=False, labelcolor=MUTED)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--metrics", default="out/synth64_sdf/vol_render_metrics.jsonl")
    p.add_argument("--out", default="docs/img/training_curves.png")
    p.add_argument("--stage", choices=["a", "b", "c"], default="a")
    args = p.parse_args(argv)

    series = load(args.metrics)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)

    if args.stage == "a":
        fig, axes = plt.subplots(2, 4, figsize=(15, 6.2), dpi=150)
        fig.patch.set_facecolor("white")
        panel(axes[0, 0], series, ["d", "g"], "Adversarial losses",
              labels=["D logistic", "G non-saturating"])
        panel(axes[0, 1], series, ["real_score", "fake_score"], "D scores",
              labels=["real", "fake"])
        panel(axes[0, 2], series, ["r1"], "R1 gradient penalty")
        panel(axes[0, 3], series, ["fg_mass"], "Foreground mass (1 = solid geometry)")
        axes[0, 3].set_ylim(-0.02, 1.02)
        panel(axes[1, 0], series, ["d_view", "g_view"], "Viewpoint loss",
              labels=["D branch", "G branch"])
        panel(axes[1, 1], series, ["g_eikonal"], "Eikonal term (weighted)")
        panel(axes[1, 2], series, ["g_minimal_surface", "g_sparsity"],
              "Geometry priors (weighted)",
              labels=["minimal surface", "occupancy sparsity"])
        panel(axes[1, 3], series, ["beta"], "Sigmoid beta (SDF sharpness)")
        axes[1, 3].set_yscale("log")
    elif args.stage == "b":
        fig, axes = plt.subplots(2, 3, figsize=(12, 6.2), dpi=150)
        fig.patch.set_facecolor("white")
        panel(axes[0, 0], series, ["d", "g"], "Adversarial losses",
              labels=["D logistic", "G non-saturating"])
        panel(axes[0, 1], series, ["real_score", "fake_score"], "D scores",
              labels=["real", "fake"])
        panel(axes[0, 2], series, ["r1"], "R1 penalty (lazy cadence)")
        panel(axes[1, 0], series, ["g_content"], "Content loss (thumb vs render)")
        panel(axes[1, 1], series, ["path"], "Path-length regularizer")
        panel(axes[1, 2], series, ["path_length"], "Mean path length (EMA)")
    else:
        fig, axes = plt.subplots(1, 3, figsize=(12, 3.4), dpi=150)
        fig.patch.set_facecolor("white")
        panel(axes[0], series, ["e_loss"], "Encoder total loss")
        panel(axes[1], series, ["e_l2_full", "e_l2_thumb"], "Reconstruction L2",
              labels=["full res", "thumb"])
        panel(axes[2], series, ["e_kl"], "KL term (VAE only)")
        for ax in axes:
            ax.set_xlabel("iteration", fontsize=9, color=MUTED)
    if args.stage in ("a", "b"):
        for ax in axes[1]:
            ax.set_xlabel("iteration", fontsize=9, color=MUTED)
    fig.tight_layout()
    fig.savefig(args.out, bbox_inches="tight")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
