"""Evaluation output-format tests: CMU->COCO keypoint reordering and result
json structure (reference evaluate.py:40,182-232)."""

import numpy as np

from evaluate import append_result, to_coco_keypoints
from improved_body_parts_tpu.configs import COCO_PARTS, PARTS


def test_order_coco_maps_parts_by_name():
    """ORDER_COCO must map each COCO slot to the same-named CMU part."""
    kps = np.zeros((18, 3))
    for i in range(18):
        kps[i] = [i, 100 + i, 1]
    coco = to_coco_keypoints(kps)
    assert coco.shape == (17, 3)
    for coco_idx, name in enumerate(COCO_PARTS):
        cmu_idx = PARTS.index(name)
        assert coco[coco_idx, 0] == cmu_idx, (name, coco_idx)


def test_append_result_json_schema():
    kps = np.zeros((1, 18, 3))
    kps[0, 0] = [10.5, 20.5, 1]   # nose visible
    out = []
    append_result(42, kps, np.array([0.9]), out)
    assert len(out) == 1
    r = out[0]
    assert r["image_id"] == 42 and r["category_id"] == 1
    assert len(r["keypoints"]) == 17 * 3
    assert r["keypoints"][0] == 10.5 and r["keypoints"][2] == 1.0
    assert r["score"] == 0.9
    # invisible joints serialize as zeros with v=0
    assert r["keypoints"][3] == 0.0 and r["keypoints"][5] == 0.0
