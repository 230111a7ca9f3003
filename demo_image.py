#!/usr/bin/env python
"""Single-image pose-estimation demo (CLI-compatible with the reference
demo_image.py:38-49: ``--image``, ``--output``, ``--checkpoint``).

Runs the TPU-native pipeline: jitted IMHN forward with flip-TTA, on-device
peak finding + limb scoring + greedy connection selection, host greedy
person assembly, skeleton rendering.

With no checkpoint the network runs with fresh (near-zero) weights, which
finds no people on natural images; pass ``--synthetic`` to run the full
pipeline on a synthetic two-person ground-truth scene instead (bypasses the
network) — useful for exercising the post-processing stack without weights.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from improved_body_parts_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def build_predictor(checkpoint: str, config_name: str, refine: str,
                    quantize: str = ""):
    import jax
    import jax.numpy as jnp

    from improved_body_parts_tpu.configs import get_config
    from improved_body_parts_tpu.infer.predict import Predictor
    from improved_body_parts_tpu.models.imhn import create_model, init_model

    config = get_config(config_name)
    model = create_model(config.model, dtype=jnp.bfloat16)

    if quantize and checkpoint:
        # an int8 export (models/quantize.save_quantized) loads directly —
        # no fp weights, no calibration pass
        from improved_body_parts_tpu.models import quantize as qz
        if qz.is_quantized_checkpoint(checkpoint):
            model, variables = qz.load_quantized(config.model, checkpoint)
            print(f"loaded int8 quantized checkpoint: {checkpoint}")
            return Predictor(model, variables, config, refine=refine)

    if checkpoint and os.path.exists(checkpoint.rpartition("@")[0]
                                     if "@" in os.path.basename(checkpoint)
                                     else checkpoint):
        from improved_body_parts_tpu.utils.checkpoint import load_for_inference
        variables = load_for_inference(checkpoint, model)
        print(f"loaded checkpoint: {checkpoint}")
    else:
        if checkpoint:
            print(f"WARNING: checkpoint '{checkpoint}' not found; using fresh init")
        params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                         config.height, config.width)
        variables = {"params": params, "batch_stats": batch_stats}
    if quantize:
        assert quantize == "int8", quantize
        import time as _time
        from improved_body_parts_tpu.data.synthetic import SyntheticDataset
        from improved_body_parts_tpu.models import quantize as qz
        t0 = _time.time()
        # calibrate on rendered multi-person scenes at the serving resolution
        # (per-tensor activation scales; see models/quantize.py)
        calib_ds = SyntheticDataset(config, length=8, seed=1234)
        calib = [np.stack([calib_ds[i][0] for i in range(b * 4, b * 4 + 4)])
                 for b in range(2)]
        model, variables = qz.quantize_model(config.model, variables, calib,
                                             dtype=jnp.bfloat16)
        print(f"int8 PTQ: folded BN + calibrated on "
              f"{sum(len(b) for b in calib)} scenes in {_time.time()-t0:.1f}s")
    return Predictor(model, variables, config, refine=refine)


def run_synthetic(args):
    """Exercise peaks->connections->grouping on synthetic GT maps."""
    import jax.numpy as jnp

    from improved_body_parts_tpu.configs import get_config
    from improved_body_parts_tpu.ops import group
    from improved_body_parts_tpu.ops.limbs import (
        connections_to_numpy, score_connections, select_connections)
    from improved_body_parts_tpu.ops.peaks import find_peaks
    from improved_body_parts_tpu.utils.common import draw_humans
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from test_postproc import make_two_person_scene

    cfg = get_config(args.config)
    icfg = cfg.infer
    paf, heat, _ = make_two_person_scene(H=64, W=64)
    t0 = time.time()
    peaks = find_peaks(jnp.asarray(heat[:, :, :18]), thre=icfg.thre1,
                       max_peaks=icfg.max_peaks, stride=cfg.stride)
    cand = score_connections(jnp.asarray(paf), peaks.xy, peaks.score,
                             peaks.valid, jnp.float32(256.0),
                             mid_num=icfg.mid_num, stride=cfg.stride,
                             thre2=icfg.thre2, connect_ration=icfg.connect_ration)
    conns = select_connections(cand, peaks.valid)
    connected = connections_to_numpy(conns, peaks)
    cands = group.build_joint_candidates(np.asarray(peaks.xy),
                                         np.asarray(peaks.score),
                                         np.asarray(peaks.valid))
    if args.run_cpp:
        from improved_body_parts_tpu.ops import group_cpp
        table, cands = group_cpp.find_humans(connected, cands, icfg)
    else:
        table, cands = group.find_humans(connected, cands, icfg)
    kps, scores = group.humans_to_keypoints(table, cands)
    print(f"synthetic scene: found {len(kps)} people "
          f"(scores: {np.round(scores, 3).tolist()}) in {time.time()-t0:.2f}s")
    canvas = np.zeros((256, 256, 3), np.uint8)
    canvas = draw_humans(canvas, kps)
    import cv2
    cv2.imwrite(args.output, canvas)
    print(f"wrote {args.output}")
    return 0 if len(kps) == 2 else 1


def main():
    parser = argparse.ArgumentParser(description="PoseNet demo (TPU-native)")
    parser.add_argument("--image", type=str, default="", help="input image path")
    parser.add_argument("--output", type=str, default="result.jpg", help="output image")
    parser.add_argument("--checkpoint", "-p", type=str, default="",
                        help="orbax checkpoint dir or torch .pth to load")
    parser.add_argument("--config", type=str, default="Canonical")
    parser.add_argument("--refine", type=str, default="bicubic",
                        choices=["bicubic", "centroid"],
                        help="sub-pixel peak refinement scheme")
    parser.add_argument("--run_cpp", action="store_true",
                        help="use the C++ grouping fast path")
    parser.add_argument("--scale-search", type=float, nargs="*", default=None,
                        help="multi-scale TTA factors, e.g. 0.5 1 1.5 2")
    parser.add_argument("--rotation-search", type=float, nargs="*", default=[0.0],
                        help="rotation TTA angles in degrees")
    parser.add_argument("--quantize", default="", choices=["", "int8"],
                        help="int8 PTQ forward (models/quantize.py)")
    parser.add_argument("--synthetic", action="store_true",
                        help="run post-processing on a synthetic scene (no weights needed)")
    parser.add_argument("--ellipse", action="store_true",
                        help="reference-style filled-ellipse limb rendering "
                             "(demo_image.py:219-240) instead of lines")
    parser.add_argument("--show-maps", action="store_true",
                        help="also save heatmap/PAF overlay diagnostics "
                             "(reference show_color_vector)")
    args = parser.parse_args()

    if args.synthetic:
        return run_synthetic(args)

    if not args.image:
        parser.error("--image is required (or use --synthetic)")

    import cv2
    img = cv2.imread(args.image)
    if img is None:
        print(f"cannot read image: {args.image}")
        return 1

    predictor = build_predictor(args.checkpoint, args.config, args.refine,
                                quantize=args.quantize)
    t0 = time.time()
    kps, scores, aux = predictor.predict_skeletons(
        img, use_cpp=True if args.run_cpp else None,
        scales=tuple(args.scale_search) if args.scale_search else None,
        angles=tuple(args.rotation_search))
    t1 = time.time()
    print(f"found {len(kps)} people in {t1 - t0:.3f}s "
          f"(first call includes XLA compile)")

    from improved_body_parts_tpu.utils.common import (
        draw_humans, draw_humans_ellipse, show_color_vector)
    canvas = (draw_humans_ellipse(img, kps) if args.ellipse
              else draw_humans(img, kps))
    cv2.imwrite(args.output, canvas)
    print(f"wrote {args.output}")

    if args.show_maps:
        # stride-4 device maps -> image resolution, like the reference's
        # upsampled paf_avg/heatmap_avg (demo_image.py:96-122)
        h, w = img.shape[:2]
        paf = cv2.resize(np.asarray(aux["paf"], np.float32), (w, h),
                         interpolation=cv2.INTER_CUBIC)
        heat = cv2.resize(np.asarray(aux["heat"], np.float32), (w, h),
                          interpolation=cv2.INTER_CUBIC)
        prefix = os.path.splitext(args.output)[0]
        for p in show_color_vector(img, paf, heat, out_prefix=prefix):
            print(f"wrote {p}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
