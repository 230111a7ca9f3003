"""GT heatmapper tests: parity with a naive per-pixel oracle implementing the
reference math directly (py_cocodata_server/py_data_heatmapper.py), plus a
golden check against the reference's heatmap_test.npz fixture when present."""

import math
import os

import numpy as np
import pytest

from improved_body_parts_tpu.configs import (
    BKG_START, HEAT_START, LIMBS_CONN, NUM_PARTS, CanonicalConfig, ModelConfig,
)
from improved_body_parts_tpu.data.heatmaps import Heatmapper, erode3


def _oracle(joints, mask_all, cfg):
    """Literal per-pixel transcription of the reference heatmapper math."""
    hm = Heatmapper(cfg)
    H, W = hm.h, hm.w
    out = np.zeros((H, W, 50), np.float32)
    stride = cfg.stride
    # keypoints
    for j in range(NUM_PARTS):
        for person in joints:
            x, y, v = person[j]
            if v >= 2:
                continue
            half = hm.gaussian_size // 2
            x_min = int(round(x / stride) - half)
            x_max = int(round(x / stride) + half + 1)
            y_min = int(round(y / stride) - half)
            y_max = int(round(y / stride) + half + 1)
            if x_max < 0 or y_max < 0:
                continue
            x_min, y_min = max(x_min, 0), max(y_min, 0)
            for yy in range(y_min, min(y_max, H)):
                for xx in range(x_min, min(x_max, W)):
                    gx = xx * stride + stride / 2 - 0.5
                    gy = yy * stride + stride / 2 - 0.5
                    g = math.exp(-((gx - x) ** 2 + (gy - y) ** 2) / hm.double_sigma2)
                    out[yy, xx, HEAT_START + j] = max(out[yy, xx, HEAT_START + j], g)
    # limbs
    for li, (fr, to) in enumerate(LIMBS_CONN):
        count = np.zeros((H, W), np.float32)
        for person in joints:
            if person[fr, 2] >= 2 or person[to, 2] >= 2:
                continue
            x1, y1 = person[fr, :2]
            x2, y2 = person[to, :2]
            dx, dy = x2 - x1, y2 - y1
            if dx * dx + dy * dy == 0:
                continue
            min_sx = int(round((min(x1, x2) - hm.paf_pad) / stride))
            max_sx = int(round((max(x1, x2) + hm.paf_pad) / stride))
            min_sy = int(round((min(y1, y2) - hm.paf_pad) / stride))
            max_sy = int(round((max(y1, y2) + hm.paf_pad) / stride))
            if max_sx < 0 or max_sy < 0:
                continue
            min_sx, min_sy = max(min_sx, 0), max(min_sy, 0)
            norm = math.sqrt(dx * dx + dy * dy)
            for yy in range(min_sy, min(max_sy + 1, H)):
                for xx in range(min_sx, min(max_sx + 1, W)):
                    gx = xx * stride + stride / 2 - 0.5
                    gy = yy * stride + stride / 2 - 0.5
                    dist = abs(dx * (y1 - gy) - (x1 - gx) * dy) / (norm + 1e-6)
                    g = math.exp(-dist * dist / (2 * hm.paf_sigma ** 2))
                    g = 0.01 if g <= hm.limb_thre else g
                    out[yy, xx, li] += g
                    count[yy, xx] += 1
        nz = count > 0
        out[:, :, li][nz] /= count[nz]
    if mask_all is not None:
        out[:, :, BKG_START] = erode3(mask_all)
    out[:, :, BKG_START + 1] = out[:, :, HEAT_START:BKG_START].max(axis=2)
    return np.clip(out, 0, 1)


@pytest.fixture(scope="module")
def small_cfg():
    # 64x64 input -> 16x16 maps keeps the per-pixel oracle fast
    return CanonicalConfig(width=64, height=64)


def test_heatmapper_matches_oracle(small_cfg):
    rng = np.random.RandomState(1)
    joints = np.zeros((3, NUM_PARTS, 3), np.float32)
    joints[:, :, :2] = rng.uniform(-10, 74, (3, NUM_PARTS, 2))
    joints[:, :, 2] = rng.randint(0, 4, (3, NUM_PARTS))
    mask_all = (rng.rand(16, 16) > 0.4).astype(np.float32)

    got = Heatmapper(small_cfg).create_heatmaps(joints, mask_all)
    want = _oracle(joints, mask_all, small_cfg)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_heatmap_peak_location(small_cfg):
    joints = np.zeros((1, NUM_PARTS, 3), np.float32)
    joints[0, :, 2] = 2.0          # all absent ...
    joints[0, 0] = [33.5, 21.5, 1]  # ... except the nose
    hm = Heatmapper(small_cfg).create_heatmaps(joints, None)
    ch = hm[:, :, HEAT_START]
    yy, xx = np.unravel_index(ch.argmax(), ch.shape)
    # grid center (x=33.5, y=21.5) -> cell (8, 5)
    assert (xx, yy) == (8, 5)
    assert ch.max() == pytest.approx(1.0, abs=1e-3)
    # reverse-keypoint background mirrors the max over keypoint channels
    np.testing.assert_allclose(hm[:, :, BKG_START + 1], ch, atol=1e-6)


def test_reference_fixture_golden():
    """Run the heatmapper on the reference's saved fixture inputs
    (heatmap_test.npz: img/joints/mask_all/mask_miss) and check structural
    invariants — values in [0,1], peaks at annotated joints."""
    path = "/root/reference/heatmap_test.npz"
    if not os.path.exists(path):
        pytest.skip("reference fixture not available")
    data = np.load(path)
    joints, mask_all = data["joints"], data["mask_all"]
    cfg = CanonicalConfig()
    hm = Heatmapper(cfg).create_heatmaps(joints, mask_all)
    assert hm.shape == (128, 128, 50)
    assert hm.min() >= 0.0 and hm.max() <= 1.0
    for person in joints:
        for j in range(NUM_PARTS):
            x, y, v = person[j]
            if v < 2 and 0 <= x < cfg.width and 0 <= y < cfg.height:
                cx, cy = int(x // cfg.stride), int(y // cfg.stride)
                assert hm[cy, cx, HEAT_START + j] > 0.5, (j, x, y)
