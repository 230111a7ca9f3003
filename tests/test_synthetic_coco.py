"""The synthetic COCO GT generator (tools/make_synthetic_coco.py) + the
in-repo scorer close the evaluate->AP loop: GT-format sanity, image/json
consistency, and a fabricated-detector round-trip producing the expected
AP ordering."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make(tmp_path, n=4, size=96):
    out = tmp_path / "syncoco"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_synthetic_coco.py"),
         "--out-dir", str(out), "--n-images", str(n), "--size", str(size)],
        check=True, cwd=REPO)
    with open(out / "gt.json") as f:
        gt = json.load(f)
    return out, gt


def test_generator_writes_coco_format(tmp_path):
    import cv2
    out, gt = _make(tmp_path)
    assert len(gt["images"]) == 4
    assert gt["categories"][0]["name"] == "person"
    assert len(gt["categories"][0]["keypoints"]) == 17
    for im in gt["images"]:
        path = out / "images" / im["file_name"]
        img = cv2.imread(str(path))
        assert img is not None and img.shape == (96, 96, 3)
    for a in gt["annotations"]:
        assert len(a["keypoints"]) == 51
        assert a["num_keypoints"] == 17
        assert a["area"] > 0 and a["iscrowd"] == 0
    # every image has at least one person
    assert {a["image_id"] for a in gt["annotations"]} == \
        {im["id"] for im in gt["images"]}


def test_fabricated_detector_round_trip(tmp_path):
    """GT keypoints + jitter as 'detections' through the evaluate.py dump
    format and the in-repo scorer: perfect -> AP 1, more jitter -> lower."""
    from improved_body_parts_tpu.utils.oks_eval import KeypointEval
    _, gt = _make(tmp_path, n=6, size=128)
    rng = np.random.RandomState(0)
    aps = []
    for jitter in (0.0, 2.0):
        dts = []
        for a in gt["annotations"]:
            kps = np.asarray(a["keypoints"], np.float64).reshape(17, 3)
            kps[:, :2] += rng.normal(0, jitter or 1e-9, (17, 2))
            dts.append({"image_id": a["image_id"], "category_id": 1,
                        "keypoints": [float(v) for v in kps.reshape(-1)],
                        "score": float(rng.uniform(0.5, 1.0))})
        stats = KeypointEval(gt, dts).run(print_fn=None)
        aps.append(stats[0])
    assert aps[0] == 1.0
    assert aps[1] < aps[0]
    assert aps[1] > 0.2          # 2 px on ~small people: degraded, not zero
