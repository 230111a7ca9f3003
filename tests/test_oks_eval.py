"""The in-repo COCO keypoint evaluator (utils/oks_eval.py): hand-computed
OKS cases, matching/ignore semantics, AP/AR accumulation — plus a lockstep
test against pycocotools when it is installed (reference evaluate.py:274-280
uses COCOeval; this module replaces it in pycocotools-free environments)."""

import numpy as np
import pytest

from improved_body_parts_tpu.utils.oks_eval import (
    AREA_RNG, COCO_SIGMAS, KeypointEval, compute_oks, keypoints_bbox_area,
)


def make_kps(points, v=2):
    """(17, 2) array -> flat COCO keypoints list with visibility v."""
    out = np.zeros((17, 3))
    out[:, :2] = points
    out[:, 2] = v
    return out.reshape(-1).tolist()


def grid_person(cx, cy, spread=40.0, seed=0):
    rng = np.random.RandomState(seed)
    return np.array([[cx + rng.uniform(-spread, spread),
                      cy + rng.uniform(-spread, spread)] for _ in range(17)])


def gt_ann(img_id, points, area=None, v=2, iscrowd=0, ann_id=None):
    kps = make_kps(points, v)
    a = {"image_id": img_id, "category_id": 1, "keypoints": kps,
         "iscrowd": iscrowd,
         "num_keypoints": int(v > 0) * 17}
    bbox, kp_area = keypoints_bbox_area(np.asarray(kps))
    a["bbox"] = bbox
    a["area"] = float(area if area is not None else kp_area)
    if ann_id is not None:
        a["id"] = ann_id
    return a


def dt_ann(img_id, points, score):
    return {"image_id": img_id, "category_id": 1,
            "keypoints": make_kps(points), "score": float(score)}


def dataset(gts, dts, img_ids):
    gt = {"images": [{"id": i} for i in img_ids], "annotations": gts,
          "categories": [{"id": 1, "name": "person"}]}
    return gt, dts


# ---------------------------------------------------------------------------
# OKS formula
# ---------------------------------------------------------------------------

def test_oks_exact_match_is_one():
    pts = grid_person(100, 100)
    g = gt_ann(1, pts)
    assert compute_oks(np.asarray(make_kps(pts)), g, COCO_SIGMAS) == \
        pytest.approx(1.0)


def test_oks_hand_computed_single_offset():
    """Shift only the nose by d: OKS = (16 + exp(-d^2/(2 s^2 var0))) / 17
    with var0 = (2*sigma_nose)^2 and s^2 = area."""
    pts = grid_person(100, 100)
    g = gt_ann(1, pts, area=50.0 * 50.0)
    shifted = pts.copy()
    d = 7.0
    shifted[0, 0] += d
    got = compute_oks(np.asarray(make_kps(shifted)), g, COCO_SIGMAS)
    var0 = (2 * COCO_SIGMAS[0]) ** 2
    want = (16 + np.exp(-d * d / (var0 * (2500.0 + np.spacing(1)) * 2))) / 17
    assert got == pytest.approx(want, rel=1e-9)


def test_oks_only_labeled_keypoints_count():
    pts = grid_person(100, 100)
    kps = make_kps(pts)
    kps[2::3] = [2] * 5 + [0] * 12          # only 5 labeled
    g = {"image_id": 1, "keypoints": kps, "area": 900.0, "iscrowd": 0,
         "bbox": [60, 60, 80, 80], "num_keypoints": 5}
    dt = np.asarray(make_kps(pts + 1000.0))  # all way off
    dt2 = np.asarray(make_kps(pts))
    # labeled subset identical -> OKS 1 even though unlabeled kps differ
    mixed = np.asarray(make_kps(pts))
    mixed[15:] = dt[15:]                     # corrupt only unlabeled ones
    assert compute_oks(mixed, g, COCO_SIGMAS) == pytest.approx(1.0)
    assert compute_oks(dt, g, COCO_SIGMAS) < 1e-6
    assert compute_oks(dt2, g, COCO_SIGMAS) == pytest.approx(1.0)


def test_oks_unlabeled_gt_uses_expanded_bbox():
    pts = grid_person(100, 100)
    g = gt_ann(1, pts, v=0)                  # num_keypoints = 0
    g["bbox"] = [80.0, 80.0, 40.0, 40.0]
    g["area"] = 1600.0
    inside = np.asarray(make_kps(grid_person(100, 100, spread=10)))
    far = np.asarray(make_kps(grid_person(1000, 1000, spread=10)))
    # detections inside the 2x-expanded box get OKS 1 (dx=dy=0)
    assert compute_oks(inside, g, COCO_SIGMAS) == pytest.approx(1.0)
    assert compute_oks(far, g, COCO_SIGMAS) < 1e-6


# ---------------------------------------------------------------------------
# matching + accumulation
# ---------------------------------------------------------------------------

def test_perfect_detections_score_ap1():
    gts, dts = [], []
    for i in range(4):
        pts = grid_person(120 + 30 * i, 150, seed=i)
        gts.append(gt_ann(i, pts))
        dts.append(dt_ann(i, pts, 0.9))
    gt, dt = dataset(gts, dts, list(range(4)))
    stats = KeypointEval(gt, dt).run(print_fn=None)
    assert stats[0] == pytest.approx(1.0)    # AP
    assert stats[5] == pytest.approx(1.0)    # AR


def test_missed_person_halves_recall():
    pts_a, pts_b = grid_person(100, 100, seed=1), grid_person(300, 300, seed=2)
    gt, dt = dataset([gt_ann(0, pts_a), gt_ann(0, pts_b)],
                     [dt_ann(0, pts_a, 0.9)], [0])
    stats = KeypointEval(gt, dt).run(print_fn=None)
    assert stats[5] == pytest.approx(0.5)    # AR = 1/2
    # precision is perfect up to recall 0.5, zero beyond -> AP ~= 0.5
    assert stats[0] == pytest.approx(0.50495, abs=1e-3)


def test_false_positive_after_tp_gives_half_weighted_ap():
    pts = grid_person(100, 100, seed=3)
    junk = grid_person(800, 800, seed=4)
    gt, dt = dataset([gt_ann(0, pts)],
                     [dt_ann(0, pts, 0.9), dt_ann(0, junk, 0.5)], [0])
    stats = KeypointEval(gt, dt).run(print_fn=None)
    # TP at rank 1 -> precision 1 at recall 1; FP after does not hurt AP
    assert stats[0] == pytest.approx(1.0)
    # flip the scores: FP outranks the TP -> precision 1/2 at recall 1
    gt2, dt2 = dataset([gt_ann(0, pts)],
                       [dt_ann(0, pts, 0.5), dt_ann(0, junk, 0.9)], [0])
    stats2 = KeypointEval(gt2, dt2).run(print_fn=None)
    assert stats2[0] == pytest.approx(0.5, abs=1e-6)


def test_crowd_gt_is_ignore_region():
    pts = grid_person(100, 100, seed=5)
    crowd = gt_ann(0, pts, iscrowd=1)
    gt, dt = dataset([crowd], [dt_ann(0, pts, 0.9)], [0])
    stats = KeypointEval(gt, dt).run(print_fn=None)
    # no real gt -> metric undefined (-1), and the matching dt is not a FP
    assert stats[0] == -1.0
    # with a real gt elsewhere the crowd-matched dt still isn't a FP
    pts2 = grid_person(400, 400, seed=6)
    gt2, dt2 = dataset([crowd, gt_ann(0, pts2)],
                       [dt_ann(0, pts, 0.95), dt_ann(0, pts2, 0.9)], [0])
    stats2 = KeypointEval(gt2, dt2).run(print_fn=None)
    assert stats2[0] == pytest.approx(1.0)


def test_unlabeled_gt_is_ignore_region():
    pts = grid_person(100, 100, seed=7)
    gt, dt = dataset([gt_ann(0, pts, v=0), gt_ann(0, grid_person(400, 400,
                                                                 seed=8))],
                     [dt_ann(0, pts, 0.95),
                      dt_ann(0, grid_person(400, 400, seed=8), 0.9)], [0])
    stats = KeypointEval(gt, dt).run(print_fn=None)
    assert stats[0] == pytest.approx(1.0)


def test_area_ranges_partition_medium_large():
    med = grid_person(100, 100, spread=20, seed=9)     # extent ~40 -> medium
    lrg = grid_person(400, 400, spread=70, seed=10)    # extent ~140 -> large
    m_area = keypoints_bbox_area(np.asarray(make_kps(med)))[1]
    l_area = keypoints_bbox_area(np.asarray(make_kps(lrg)))[1]
    assert AREA_RNG["medium"][0] < m_area < AREA_RNG["medium"][1]
    assert l_area > AREA_RNG["large"][0]
    gt, dt = dataset([gt_ann(0, med), gt_ann(0, lrg)],
                     [dt_ann(0, med, 0.9), dt_ann(0, lrg, 0.8)], [0])
    ev = KeypointEval(gt, dt)
    stats = ev.run(print_fn=None)
    assert stats[3] == pytest.approx(1.0)    # AP medium
    assert stats[4] == pytest.approx(1.0)    # AP large


def test_ap_degrades_monotonically_with_jitter():
    rng = np.random.RandomState(0)
    people = [(i, grid_person(150 + 40 * i, 200, seed=20 + i))
              for i in range(6)]
    aps = []
    for jitter in (0.0, 3.0, 9.0, 30.0):
        gts, dts = [], []
        for i, pts in people:
            gts.append(gt_ann(i, pts, area=60.0 * 60.0))
            noisy = pts + rng.normal(0, jitter or 1e-9, pts.shape)
            dts.append(dt_ann(i, noisy, 0.9))
        gt, dt = dataset(gts, dts, [i for i, _ in people])
        aps.append(KeypointEval(gt, dt).run(print_fn=None)[0])
    assert aps[0] == pytest.approx(1.0)
    assert aps[0] >= aps[1] >= aps[2] >= aps[3]
    assert aps[3] < 0.5


def test_duplicate_detection_is_fp():
    pts = grid_person(100, 100, seed=11)
    gt, dt = dataset([gt_ann(0, pts)],
                     [dt_ann(0, pts, 0.9), dt_ann(0, pts + 0.5, 0.8)], [0])
    stats = KeypointEval(gt, dt).run(print_fn=None)
    # second (near-identical) dt cannot match the claimed gt -> FP;
    # AP unaffected (TP first), AR still 1
    assert stats[0] == pytest.approx(1.0)
    assert stats[5] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# lockstep vs pycocotools (skipped when absent)
# ---------------------------------------------------------------------------

def _random_dataset(seed, n_imgs=6):
    rng = np.random.RandomState(seed)
    gts, dts, ann_id = [], [], 1
    for i in range(n_imgs):
        for _ in range(rng.randint(0, 4)):
            pts = grid_person(rng.uniform(80, 400), rng.uniform(80, 400),
                              spread=rng.uniform(15, 80), seed=rng.randint(1e6))
            v = rng.choice([0, 2], p=[0.15, 0.85])
            a = gt_ann(i, pts, v=v, iscrowd=int(rng.rand() < 0.1),
                       ann_id=ann_id)
            ann_id += 1
            gts.append(a)
            if rng.rand() < 0.8:             # imperfect detector
                noisy = pts + rng.normal(0, rng.uniform(0, 15), pts.shape)
                dts.append(dt_ann(i, noisy, rng.rand()))
        for _ in range(rng.randint(0, 2)):   # pure false positives
            junk = grid_person(rng.uniform(80, 400), rng.uniform(80, 400),
                               spread=30, seed=rng.randint(1e6))
            dts.append(dt_ann(i, junk, rng.rand()))
    return dataset(gts, dts, list(range(n_imgs)))


def test_matches_pycocotools_when_available(tmp_path):
    pycoco = pytest.importorskip("pycocotools.coco")
    import contextlib
    import io
    import json

    from pycocotools.cocoeval import COCOeval

    for seed in (0, 1, 2):
        gt, dt = _random_dataset(seed)
        gt_path = tmp_path / f"gt{seed}.json"
        with open(gt_path, "w") as f:
            json.dump(gt, f)
        with contextlib.redirect_stdout(io.StringIO()):
            coco = pycoco.COCO(str(gt_path))
            coco_dt = coco.loadRes([dict(d) for d in dt])
            ev = COCOeval(coco, coco_dt, "keypoints")
            ev.evaluate()
            ev.accumulate()
            ev.summarize()
        ours = KeypointEval(gt, dt).run(print_fn=None)
        np.testing.assert_allclose(ours, ev.stats, atol=1e-9,
                                   err_msg=f"seed {seed}")
