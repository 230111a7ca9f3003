#!/usr/bin/env python
"""Line-integral limb-scoring sketch (reference visual/line_integral.py):
demonstrates the candidate-limb score = mean of the limb heatmap sampled
along the segment between two keypoints — the exact math used on device in
improved_body_parts_tpu/ops/limbs.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from improved_body_parts_tpu.ops.limbs import bilinear_sample


def main():
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # a limb heatmap along the diagonal segment (10,10)->(50,50)
    x1, y1, x2, y2 = 10.0, 10.0, 50.0, 50.0
    d = np.hypot(x2 - x1, y2 - y1)
    dist = np.abs((x2 - x1) * (y1 - yy) - (x1 - xx) * (y2 - y1)) / d
    limb_map = np.exp(-dist ** 2 / (2 * 2.0 ** 2)).astype(np.float32)

    for name, (ax, ay, bx, by) in {
        "true limb": (x1, y1, x2, y2),
        "wrong pairing": (10.0, 50.0, 50.0, 10.0),
    }.items():
        n = 20
        t = np.linspace(0, 1, n).astype(np.float32)
        px, py = ax + t * (bx - ax), ay + t * (by - ay)
        vals = np.asarray(bilinear_sample(jnp.asarray(limb_map),
                                          jnp.asarray(px), jnp.asarray(py)))
        print(f"{name:14s}: mean sample = {vals.mean():.3f}, "
              f"{np.count_nonzero(vals > 0.1)}/{n} above threshold")


if __name__ == "__main__":
    main()
