"""Apples-to-apples AP A/B: run the REAL reference inference stack with OUR
trained weights on the same image set our evaluate.py scores.

This is the strongest COCO-AP-parity evidence available without COCO data /
the released .pth: a checkpoint trained in this framework is exported into a
reference-format state_dict (utils/checkpoint.export_to_torch_state_dict,
round-trip-locked by tests/test_torch_parity.py), loaded into the reference's
own torch ``PoseNet`` (reference models/posenet.py:50-122), pushed through the
reference's own ``predict_refactor`` + ``heatmap_nms`` + ``find_connections``
+ ``find_humans`` chain (reference utils/parse_skeletons.py:28-103, 126-176,
324-600 — the evaluate.py refactor branch), and scored with the in-repo OKS
evaluator. Compare against::

    python evaluate.py --checkpoint CK --image-dir D --gt-json G [--boxsize B]

Both sides share the detection formatting (evaluate.append_result) and the
scorer (utils/oks_eval.KeypointEval), so any AP delta is attributable to the
inference pipelines themselves.

Usage::

    python tools/ref_ap_ab.py --checkpoint /tmp/ck/orbax --image-dir \
        /tmp/syn/images --gt-json /tmp/syn/gt.json --boxsize 256
"""

import argparse
import json
import os
import sys
import time
import types

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = os.environ.get("REFERENCE_DIR", "/root/reference")


def _import_reference():
    sys.path.insert(0, REFERENCE)
    thop = types.ModuleType("thop")
    thop.profile = lambda *a, **k: (0, 0)
    sys.modules.setdefault("thop", thop)
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvm.densenet = types.ModuleType("torchvision.models.densenet")
    tv.models = tvm
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", tvm)
    sys.modules.setdefault("torchvision.models.densenet", tvm.densenet)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--checkpoint", "-p", required=True,
                    help="orbax train-state dir (a checkpoint trained here)")
    ap.add_argument("--config", default="Canonical")
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--gt-json", required=True)
    ap.add_argument("--boxsize", type=int, default=0,
                    help="override config boxsize (match the training res)")
    ap.add_argument("--max-images", type=int, default=-1)
    ap.add_argument("--dump-name", default="reference_ab")
    ap.add_argument("--thre1", type=float, default=0.1)
    ap.add_argument("--nstack", type=int, default=0,
                    help="override config nstack (tiny-model testing)")
    ap.add_argument("--inp-dim", type=int, default=0)
    ap.add_argument("--increase", type=int, default=0)
    ap.add_argument("--results-dir", default="results")
    args = ap.parse_args(argv)

    from improved_body_parts_tpu.configs import get_config
    from improved_body_parts_tpu.ops import group
    from improved_body_parts_tpu.utils.checkpoint import (
        export_to_torch_state_dict, restore_train_state,
    )
    from improved_body_parts_tpu.utils.oks_eval import KeypointEval
    from evaluate import append_result

    config = get_config(args.config)
    boxsize = args.boxsize or config.infer.boxsize

    state = restore_train_state(args.checkpoint)
    params, batch_stats = state["params"], state["batch_stats"]

    _import_reference()
    import torch
    import utils.parse_skeletons as rps
    from models.posenet import PoseNet

    import dataclasses
    m = config.model
    if args.nstack or args.inp_dim or args.increase:
        m = dataclasses.replace(m, nstack=args.nstack or m.nstack,
                                inp_dim=args.inp_dim or m.inp_dim,
                                increase=args.increase or m.increase)
    net = PoseNet(m.nstack, m.inp_dim, m.oup_dim, bn=True,
                  increase=m.increase)
    sd = net.state_dict()
    exported = export_to_torch_state_dict(params, batch_stats, sd)
    net.load_state_dict({k: torch.from_numpy(np.array(v))
                         for k, v in exported.items()})
    net.eval()
    print(f"loaded {len(exported)} tensors into the reference PoseNet "
          f"(nstack={m.nstack}, inp_dim={m.inp_dim})")

    # reference INI defaults (reference utils/config:1-40); predict_refactor
    # hardcodes multiplier=[1.] (parse_skeletons.py:36-38) so scale_search is
    # inert — kept for signature fidelity
    test_cfg = dict(scale_search=[1.0], rotation_search=[0.0],
                    thre1=args.thre1, thre2=0.1, connect_ration=0.8,
                    mid_num=20, len_rate=16, connection_tole=0.7,
                    remove_recon=0)
    model_cfg = dict(boxsize=boxsize, max_downsample=64, padValue=128,
                     stride=4)
    cfg_ns = types.SimpleNamespace(
        flip_heat_ord=config.flip_heat_ord, flip_paf_ord=config.flip_paf_ord,
        paf_layers=config.paf_layers, num_layers=config.num_layers)
    pairs = [tuple(p) for p in config.limbs_conn]

    with open(args.gt_json) as f:
        gt_data = json.load(f)
    by_name = {im["file_name"]: im["id"] for im in gt_data["images"]}
    images = sorted(
        (by_name[n], os.path.join(args.image_dir, n))
        for n in os.listdir(args.image_dir) if n in by_name)
    if args.max_images > 0:
        images = images[:args.max_images]
    print(f"evaluating {len(images)} images through the REFERENCE stack "
          f"(torch CPU, boxsize {boxsize})")

    # predict_refactor hardcodes .cuda(); run it on CPU
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    all_outputs = []
    t00 = time.time()
    try:
        for n, (image_id, path) in enumerate(images):
            img = cv2.imread(path)
            with torch.no_grad():
                heat, paf = rps.predict_refactor(
                    img, net, test_cfg, model_cfg, path, flip_avg=True,
                    config=cfg_ns)
            peaks = rps.heatmap_nms(heat, upsample_factor=4.0)
            paf_up = cv2.resize(paf, None, fx=4, fy=4,
                                interpolation=cv2.INTER_CUBIC)
            conns, special = rps.find_connections(
                peaks, paf_up, img.shape[0], test_cfg, pairs)
            table, cands = rps.find_humans(conns, special, peaks, test_cfg,
                                           pairs)
            kps, scores = group.humans_to_keypoints(
                np.asarray(table), np.asarray(cands))
            append_result(image_id, kps, scores, all_outputs)
            if n % 8 == 0:
                el = time.time() - t00
                print(f"[{n + 1}/{len(images)}] {len(scores)} persons "
                      f"({el / (n + 1):.1f} s/img)")
    finally:
        torch.Tensor.cuda = orig_cuda

    results_file = os.path.join(args.results_dir,
                                f"{args.dump_name}_results.json")
    os.makedirs(os.path.dirname(results_file), exist_ok=True)
    with open(results_file, "w") as f:
        json.dump(all_outputs, f)
    print(f"wrote {len(all_outputs)} detections to {results_file} "
          f"({(time.time() - t00) / max(len(images), 1):.1f} s/img)")

    stats = KeypointEval(gt_data, all_outputs,
                         img_ids=[i for i, _ in images]).run()
    print(f"REFERENCE-STACK AP={stats[0]:.4f} AP50={stats[1]:.4f} "
          f"AP75={stats[2]:.4f} APM={stats[3]:.4f} APL={stats[4]:.4f} "
          f"AR={stats[5]:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
