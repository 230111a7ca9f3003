#!/usr/bin/env python
"""Export an int8-quantized serving checkpoint from an fp train state.

    python tools/export_quantized.py --checkpoint /ck/orbax --out /ck/int8

Folds BN, calibrates activation scales on rendered multi-person scenes
(or ``--calib-dir`` images), and writes an orbax export ~4x smaller than
the fp32 state that every CLI loads directly via
``--quantize int8 --checkpoint <out>`` (no calibration at serving time).
See models/quantize.py. The reference's fastest serving mode is apex AMP
fp16 (/root/reference/demo_image.py:300-304) — it has no quantized path.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from improved_body_parts_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="fp orbax train-state dir or torch .pth")
    ap.add_argument("--out", required=True, help="output orbax dir")
    ap.add_argument("--config", default="Canonical")
    ap.add_argument("--calib-dir", default="",
                    help="directory of calibration images (default: "
                         "rendered synthetic scenes)")
    ap.add_argument("--calib-images", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=0,
                    help="calibration resolution (default: config)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from improved_body_parts_tpu.configs import get_config
    from improved_body_parts_tpu.models import quantize as qz
    from improved_body_parts_tpu.models.imhn import create_model
    from improved_body_parts_tpu.utils.checkpoint import load_for_inference

    config = get_config(args.config)
    size = args.image_size or config.height
    model = create_model(config.model, dtype=jnp.bfloat16)
    variables = load_for_inference(args.checkpoint, model)

    if args.calib_dir:
        import cv2
        names = sorted(os.listdir(args.calib_dir))[:args.calib_images]
        imgs = []
        for n in names:
            img = cv2.imread(os.path.join(args.calib_dir, n))
            if img is None:
                continue
            img = cv2.resize(img, (size, size))[:, :, ::-1]
            imgs.append(img.astype(np.float32) / 255.0)
        batches = [np.stack(imgs[i:i + 4]) for i in range(0, len(imgs), 4)]
    else:
        from improved_body_parts_tpu.data.synthetic import SyntheticDataset
        ds = SyntheticDataset(config, length=args.calib_images, seed=1234,
                              image_size=size)
        batches = [np.stack([ds[i][0] for i in range(b * 4, b * 4 + 4)])
                   for b in range(max(args.calib_images // 4, 1))]

    t0 = time.time()
    _, qvars = qz.quantize_model(config.model, variables, batches)
    qz.save_quantized(args.out, qvars)
    n_bytes = sum(np.asarray(v).nbytes
                  for v in jax.tree_util.tree_leaves(qvars["params"]))
    print(f"int8 export: {args.out} ({n_bytes/1e6:.0f} MB, "
          f"calibrated on {sum(len(b) for b in batches)} images, "
          f"{time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
