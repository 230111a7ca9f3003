"""tools/ref_ap_ab.py under test: the AP-parity A/B tool (our trained
weights exported into the REAL reference torch stack, scored with the same
OKS evaluator as our evaluate.py) must keep working against reference and
module drift.

The live test fabricates a tiny seeded checkpoint, renders two synthetic
scenes, runs the tool end-to-end (reference PoseNet -> predict_refactor ->
heatmap_nms -> find_connections -> find_humans -> append_result -> results
json), runs OUR pipeline (infer.predict.Predictor) on the same images, and
asserts detection-level equality — the same guarantee the full-size A/B run
relies on (reference utils/parse_skeletons.py:28-103, 126-176, 324-600;
reference evaluate.py:235-280)."""

import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.dirname(os.path.abspath(__file__))):
    if p not in sys.path:
        sys.path.insert(0, p)

REFERENCE = os.environ.get("REFERENCE_DIR", "/root/reference")
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE),
    reason="live reference checkout not available")

# the real reference PoseNet hardcodes its 256-wide Backbone (reference
# models/posenet.py:69), so inp_dim cannot shrink — only nstack can
TINY = dict(nstack=2, inp_dim=256, increase=128)


def _seeded_checkpoint(ckpt_dir):
    """Build a tiny REAL reference PoseNet with deterministic weights,
    convert it into our parameter tree, and save it as an orbax checkpoint
    the tool can restore. Returns (params, batch_stats)."""
    from improved_body_parts_tpu.utils.checkpoint import (
        convert_torch_state_dict, save_train_state,
    )
    from reference_parity_common import seeded_state_dict_arrays
    import tools.ref_ap_ab as ab

    ab._import_reference()
    from models.posenet import PoseNet

    net = PoseNet(TINY["nstack"], TINY["inp_dim"], 50, bn=True,
                  increase=TINY["increase"])
    sd = net.state_dict()
    arrays = seeded_state_dict_arrays(
        sorted(sd.keys()), {k: tuple(v.shape) for k, v in sd.items()})
    with torch.no_grad():
        for k in sd:
            if k in arrays:
                sd[k].copy_(torch.from_numpy(arrays[k]))
    params, batch_stats = convert_torch_state_dict(sd)
    save_train_state(str(ckpt_dir),
                     {"params": params, "batch_stats": batch_stats}, step=0)
    return params, batch_stats


@needs_reference
def test_ref_ap_ab_tool_matches_our_pipeline(tmp_path):
    import cv2
    import jax.numpy as jnp

    from evaluate import append_result
    from improved_body_parts_tpu.configs import (
        CanonicalConfig, InferenceConfig, ModelConfig,
    )
    from improved_body_parts_tpu.infer.predict import Predictor
    from improved_body_parts_tpu.models.imhn import create_model
    import tools.make_synthetic_coco as msc
    import tools.ref_ap_ab as ab

    params, batch_stats = _seeded_checkpoint(tmp_path / "ckpt")

    syn = tmp_path / "syn"
    msc.main(["--out-dir", str(syn), "--n-images", "2", "--size", "128",
              "--seed", "777", "--max-people", "2"])

    # the tool end-to-end: restore ckpt -> export into the reference net ->
    # reference inference chain -> results json -> OKS score
    rc = ab.main([
        "--checkpoint", str(tmp_path / "ckpt"),
        "--image-dir", str(syn / "images"), "--gt-json", str(syn / "gt.json"),
        "--nstack", str(TINY["nstack"]), "--inp-dim", str(TINY["inp_dim"]),
        "--increase", str(TINY["increase"]), "--boxsize", "128",
        "--results-dir", str(tmp_path / "results"), "--thre1", "0.1",
    ])
    assert rc == 0
    with open(tmp_path / "results" / "reference_ab_results.json") as f:
        ref_dets = json.load(f)

    # our pipeline on the same images (fp32 like the torch side; padded-map
    # peaks NOT suppressed — the reference refactor path finds peaks on the
    # full padded map, reference evaluate.py:74-80)
    model = create_model(ModelConfig(**TINY), dtype=jnp.float32)
    config = CanonicalConfig(infer=InferenceConfig(max_peaks=128, thre1=0.1))
    predictor = Predictor(
        model, {"params": params, "batch_stats": batch_stats}, config,
        suppress_pad_peaks=False)

    with open(syn / "gt.json") as f:
        gt = json.load(f)
    our_dets = []
    for im in sorted(gt["images"], key=lambda x: x["id"]):
        img = cv2.imread(str(syn / "images" / im["file_name"]))
        kps, scores, _ = predictor.predict_skeletons(img)
        append_result(im["id"], kps, scores, our_dets)

    # the comparison must be non-trivial: the seeded net has to produce at
    # least one assembled person on these scenes
    assert len(our_dets) > 0
    assert len(ref_dets) == len(our_dets)

    def canon(dets):
        rows = []
        for d in dets:
            rows.append((d["image_id"], round(d["score"], 3),
                         tuple(round(v, 1) for v in d["keypoints"])))
        return sorted(rows)

    ours, refs = canon(our_dets), canon(ref_dets)
    for o, r in zip(ours, refs):
        assert o[0] == r[0], (o, r)                       # image id
        assert abs(o[1] - r[1]) <= 2e-3, (o[1], r[1])     # person score
        np.testing.assert_allclose(np.asarray(o[2]), np.asarray(r[2]),
                                   atol=0.05)             # keypoints (px)
