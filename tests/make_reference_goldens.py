#!/usr/bin/env python
"""Generate tests/golden/*.npz fixtures FROM THE ACTUAL REFERENCE CODE.

Run this only where /root/reference (sokunmin/Improved-Body-Parts) is
available; the committed fixtures let tests/test_reference_parity.py assert
reference-derived values unconditionally (no environment-dependent skips).

Fixtures:
  * heatmapper_golden.npz — reference Heatmapper.create_heatmaps output on
    the reference's own heatmap_test.npz inputs
    (py_cocodata_server/py_data_heatmapper.py:56-103, 360-383).
  * transformer_golden.npz — reference Transformer.transform outputs (warped
    uint8 image/masks + joints) for fixed AugmentSelections
    (py_cocodata_server/py_data_transformer.py:42-183).
  * postproc_golden.npz — expected peaks / connections / person tables from
    the reference heatmap_nms -> find_connections -> find_humans chain
    (utils/parse_skeletons.py:126-176, 324-600) on deterministic synthetic
    scenes (regenerated in-test from the same seeds).
  * model_forward_golden.npz — forward outputs of the REAL reference
    PoseNet(2, 256, 50, bn=True, increase=128) (models/posenet.py:50-144)
    with weights overwritten deterministically from numpy RandomState(0)
    (see seeded_state_dict_arrays below), plus the state_dict key/shape
    manifest so the test can regenerate identical weights without torch
    model code.
"""

import json
import os
import sys
import types

import numpy as np

REFERENCE = os.environ.get("REFERENCE_DIR", "/root/reference")
HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden")

sys.path.insert(0, os.path.dirname(HERE))
from tests.reference_parity_common import (  # noqa: E402
    POSTPROC_TEST_CFG, blob_scene, person_signatures, seeded_state_dict_arrays,
)


def _install_stubs():
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
    import matplotlib
    matplotlib.use("Agg")


def gen_heatmapper():
    from py_cocodata_server.py_data_heatmapper import Heatmapper
    from config.config import GetConfig
    d = np.load(os.path.join(REFERENCE, "heatmap_test.npz"))
    hm = Heatmapper(GetConfig("Canonical"))
    out = hm.create_heatmaps(d["joints"].astype(np.float32),
                             d["mask_all"].astype(np.float32))
    np.savez_compressed(
        os.path.join(GOLDEN, "heatmapper_golden.npz"),
        joints=d["joints"].astype(np.float32),
        mask_all=d["mask_all"].astype(np.float32),
        heatmaps_chw=out.astype(np.float32))
    print("heatmapper_golden.npz", out.shape)


TRANSFORMER_CASES = [
    dict(flip=False, degree=0.0, crop=(0, 0), scale=1.0),
    dict(flip=True, degree=25.0, crop=(13, -7), scale=0.85),
    dict(flip=False, degree=-40.0, crop=(-50, 50), scale=1.3),
    dict(flip=True, degree=12.5, crop=(0, 31), scale=1.1),
]


def gen_transformer():
    from py_cocodata_server.py_data_transformer import (
        AugmentSelection, Transformer)
    from config.config import GetConfig
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (480, 640, 3), np.uint8)
    mask_miss = (rng.rand(480, 640) > 0.3).astype(np.uint8) * 255
    mask_all = (rng.rand(480, 640) > 0.5).astype(np.uint8) * 255
    joints = rng.rand(3, 18, 3).astype(np.float64)
    joints[:, :, 0] *= 639
    joints[:, :, 1] *= 479
    joints[:, :, 2] = rng.randint(0, 3, (3, 18))

    cfg = GetConfig("Canonical")
    tr = Transformer(cfg)
    out = dict(img=img, mask_miss=mask_miss, mask_all=mask_all, joints=joints,
               objpos=np.array([321.5, 240.25]), scale_provided=np.array(0.42),
               cases=json.dumps(TRANSFORMER_CASES))
    for ci, c in enumerate(TRANSFORMER_CASES):
        aug = AugmentSelection(flip=c["flip"], tint=False, degree=c["degree"],
                               crop=tuple(c["crop"]), scale=c["scale"])
        meta = {"objpos": [(321.5, 240.25)], "scale_provided": [0.42],
                "joints": joints.copy()}
        wi, wmm, wma, wmeta = tr.transform(img.copy(), mask_miss.copy(),
                                           mask_all.copy(), meta, aug=aug)
        # outputs are uint8/255 (cv2 keeps uint8 through warp+resize) -> store
        # exact uint8
        out[f"case{ci}_img"] = np.round(wi * 255).astype(np.uint8)
        out[f"case{ci}_mask_miss"] = np.round(wmm * 255).astype(np.uint8)
        out[f"case{ci}_mask_all"] = np.round(wma * 255).astype(np.uint8)
        out[f"case{ci}_joints"] = wmeta["joints"]
    np.savez_compressed(os.path.join(GOLDEN, "transformer_golden.npz"), **out)
    print("transformer_golden.npz", len(TRANSFORMER_CASES), "cases")


def gen_postproc(n_scenes=6):
    import cv2
    import utils.parse_skeletons as rps
    sys.path.insert(0, os.path.dirname(HERE))
    from improved_body_parts_tpu.configs import LIMBS_CONN

    pairs = [tuple(p) for p in LIMBS_CONN]
    out = {"n_scenes": np.array(n_scenes)}
    for si in range(n_scenes):
        heat, paf, img_h = blob_scene(si)
        ref_peaks = rps.heatmap_nms(heat, upsample_factor=4.0)
        paf_up = cv2.resize(paf, None, fx=4, fy=4,
                            interpolation=cv2.INTER_CUBIC)
        conns, special = rps.find_connections(ref_peaks, paf_up, img_h,
                                              POSTPROC_TEST_CFG, pairs)
        table, cands = rps.find_humans(conns, special, ref_peaks,
                                       POSTPROC_TEST_CFG, pairs)
        # peaks flattened: (joint_type, x, y, score) rows
        rows = []
        for k, pk in enumerate(ref_peaks):
            for x, y, s, _ in pk:
                rows.append([k, x, y, s])
        out[f"s{si}_peaks"] = np.asarray(rows, np.float64).reshape(-1, 4)
        # connections flattened: (limb_type, sx, sy, dx, dy, score, limb_len)
        crows = []
        for li, c in enumerate(conns):
            for row in np.asarray(c).reshape(-1, 6):
                i, j = int(row[3]), int(row[4])
                fr, to = pairs[li]
                sxy = ref_peaks[fr][i][:2]
                dxy = ref_peaks[to][j][:2]
                crows.append([li, sxy[0], sxy[1], dxy[0], dxy[1],
                              row[2], row[5]])
        out[f"s{si}_conns"] = np.asarray(crows, np.float64).reshape(-1, 7)
        # final person signatures (canonical, coordinate-keyed)
        sig_json = json.dumps(person_signatures(table, cands))
        out[f"s{si}_persons"] = np.frombuffer(sig_json.encode(), np.uint8)
    np.savez_compressed(os.path.join(GOLDEN, "postproc_golden.npz"), **out)
    print("postproc_golden.npz", n_scenes, "scenes")


def gen_model_forward():
    import torch
    from models.posenet import PoseNet
    net = PoseNet(2, 256, 50, bn=True, increase=128)
    net.eval()
    sd = net.state_dict()
    keys = sorted(sd.keys())
    shapes = {k: tuple(sd[k].shape) for k in keys}
    arrays = seeded_state_dict_arrays(keys, shapes)
    with torch.no_grad():
        for k in keys:
            if k in arrays:
                sd[k].copy_(torch.from_numpy(arrays[k]))
    x = np.random.RandomState(1).rand(1, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        outs = net(torch.from_numpy(x))
    save = {"input": x,
            "manifest": np.frombuffer(json.dumps(
                [[k, list(shapes[k])] for k in keys]).encode(), np.uint8)}
    for t in range(2):
        for s in range(5):
            save[f"out_t{t}_s{s}"] = outs[t][s].numpy()
    np.savez_compressed(os.path.join(GOLDEN, "model_forward_golden.npz"),
                        **save)
    print("model_forward_golden.npz",
          sum(v.size for v in save.values()) / 1e6, "M elements")


if __name__ == "__main__":
    os.makedirs(GOLDEN, exist_ok=True)
    sys.path.insert(0, REFERENCE)
    _install_stubs()
    gen_heatmapper()
    gen_transformer()
    gen_postproc()
    gen_model_forward()
