#!/usr/bin/env python
"""Focal-L2 gradient illustration (reference models/focal_loss.py:8-21):
plots loss and d(loss)/d(pred) of the plain vs focal L2 for a foreground
(gt=1) and background (gt=0) pixel, showing how the focal factor
down-weights already-correct predictions."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def focal_l2(pred, gt, gamma=1.0):
    st = np.where(gt >= 0.01, pred, 1.0 - pred)
    return (pred - gt) ** 2 * np.abs(1.0 - st) ** gamma


def main():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    s = np.linspace(0.0, 1.0, 200)
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    for ax, gt in zip(axes, (1.0, 0.0)):
        ax.plot(s, (s - gt) ** 2, label="L2")
        for g in (1.0, 2.0):
            ax.plot(s, focal_l2(s, gt, g), label=f"focal L2 (gamma={g:g})")
        ax.set_title(f"ground truth = {gt:g}")
        ax.set_xlabel("prediction")
        ax.legend()
    out = os.path.join(os.path.dirname(__file__), "focal_loss_demo.png")
    fig.savefig(out, dpi=100, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
