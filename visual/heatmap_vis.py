#!/usr/bin/env python
"""Ground-truth heatmap visualisation (reference visual/heatmap_gen.py and
the jet colorizer utils/util.py:12-41): renders a synthetic scene's keypoint
and limb channels as jet overlays."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def jet(gray: np.ndarray) -> np.ndarray:
    """Vectorized jet colormap for [0,1] maps -> BGR uint8 (replaces the
    per-pixel loop in the reference utils/util.py:12-41)."""
    v = np.clip(gray, 0.0, 1.0)
    b = np.clip(np.where(v < 0.125, 0.5 + 4 * v,
                np.where(v < 0.375, 1.0, np.where(v < 0.625, -4 * v + 2.5, 0))), 0, 1)
    g = np.clip(np.where(v < 0.125, 0, np.where(v < 0.375, 4 * (v - 0.125),
                np.where(v < 0.625, 1.0, np.where(v < 0.875, -4 * v + 3.5, 0)))), 0, 1)
    r = np.clip(np.where(v < 0.625, np.where(v >= 0.375, 4 * (v - 0.375), 0),
                np.where(v < 0.875, 1.0, -4 * v + 4.5)), 0, 1)
    return (np.stack([b, g, r], axis=-1) * 255).astype(np.uint8)


def main():
    import cv2

    from improved_body_parts_tpu.configs import CanonicalConfig, HEAT_START, NUM_PARTS
    from improved_body_parts_tpu.data.heatmaps import Heatmapper
    from improved_body_parts_tpu.data.synthetic import random_people, render_image

    cfg = CanonicalConfig()
    rng = np.random.RandomState(0)
    joints = random_people(rng, cfg.height, cfg.width, max_people=2)
    img = (render_image(joints, cfg.height, cfg.width, rng) * 255).astype(np.uint8)
    hm = Heatmapper(cfg).create_heatmaps(joints, np.ones((128, 128), np.float32))

    panels = []
    # max over keypoint channels, max over limb channels, bg channel
    for m in (hm[:, :, HEAT_START:HEAT_START + NUM_PARTS].max(axis=2),
              hm[:, :, :30].max(axis=2),
              hm[:, :, -1]):
        color = cv2.resize(jet(m), (cfg.width, cfg.height),
                           interpolation=cv2.INTER_NEAREST)
        panels.append(cv2.addWeighted(img, 0.4, color, 0.6, 0))
    out_img = np.concatenate(panels, axis=1)
    out = os.path.join(os.path.dirname(__file__), "heatmap_vis.png")
    cv2.imwrite(out, out_img)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
