"""The offline-builder seam, closed end-to-end WITHOUT pycocotools: a
fabricated on-disk mini-COCO (polygon people with keypoints, a crowd RLE
region, a no-keypoint person) -> build_records -> reference-format h5 ->
CocoH5Dataset -> two jitted train steps. Also unit-locks the coco_shim
RLE/polygon decoding the fallback path relies on.

reference: data/coco_masks_hdf5.py:39-123 (mask gates), 126-266 (instance
selection), py_data_iterator.py:111-146 (h5 consumption)."""

import dataclasses
import json
import os

import numpy as np
import pytest

from improved_body_parts_tpu.data.coco_shim import (
    MiniCOCO, decode_rle_counts, polygons_to_mask, rle_to_mask,
)


# ---------------------------------------------------------------------------
# shim codecs
# ---------------------------------------------------------------------------

def encode_rle_counts(counts):
    """Test-local inverse of decode_rle_counts (the COCO varint coding:
    5-bit groups, bit 0x20 = continuation, delta-coding from run 3 on)."""
    out = []
    for i, x in enumerate(counts):
        if i > 2:
            x = x - counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not (x == 0 and not (c & 0x10)) and \
                not (x == -1 and (c & 0x10))
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def mask_to_uncompressed_rle(mask):
    flat = np.asarray(mask, np.uint8).flatten(order="F")
    changes = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate([[0], changes, [flat.size]])
    counts = np.diff(bounds).tolist()
    if flat[0] == 1:                      # runs must start with background
        counts = [0] + counts
    return {"counts": counts, "size": list(mask.shape)}


def test_rle_roundtrip_compressed_and_uncompressed():
    rng = np.random.RandomState(0)
    mask = (rng.rand(37, 23) > 0.7).astype(np.uint8)
    rle = mask_to_uncompressed_rle(mask)
    np.testing.assert_array_equal(rle_to_mask(rle, 37, 23), mask)
    compressed = {"counts": encode_rle_counts(rle["counts"]),
                  "size": [37, 23]}
    assert decode_rle_counts(compressed["counts"]) == rle["counts"]
    np.testing.assert_array_equal(rle_to_mask(compressed, 37, 23), mask)


def test_polygon_mask_covers_rect():
    m = polygons_to_mask([[10, 5, 30, 5, 30, 25, 10, 25]], 40, 50)
    assert m[15, 20] == 1 and m[6, 11] == 1
    assert m[2, 2] == 0 and m[30, 40] == 0


# ---------------------------------------------------------------------------
# fabricated mini-COCO -> build -> h5 -> train
# ---------------------------------------------------------------------------

def _rect_poly(x0, y0, x1, y1):
    return [[x0, y0, x1, y0, x1, y1, x0, y1]]


def _kps_in_rect(x0, y0, x1, y1):
    xs = np.linspace(x0 + 3, x1 - 3, 17)
    ys = y0 + (np.arange(17) % 5) / 4.0 * (y1 - y0 - 6) + 3
    out = []
    for x, y in zip(xs, ys):
        out += [float(x), float(y), 2]
    return out


def _fabricate_mini_coco(root):
    import cv2
    H, W = 160, 200
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "train2017"), exist_ok=True)
    images, anns = [], []

    def add_image(iid):
        name = "%012d.jpg" % iid
        img = np.full((H, W, 3), 90, np.uint8)
        cv2.imwrite(os.path.join(root, "train2017", name), img)
        images.append({"id": iid, "file_name": name, "height": H, "width": W})

    aid = 1

    def add_ann(iid, seg, kps, area, bbox, iscrowd=0):
        nonlocal aid
        nk = int(np.count_nonzero(np.asarray(kps[2::3]) > 0)) if kps else 0
        anns.append({"id": aid, "image_id": iid, "category_id": 1,
                     "segmentation": seg, "keypoints": kps or [0] * 51,
                     "num_keypoints": nk, "area": area, "bbox": bbox,
                     "iscrowd": iscrowd})
        aid += 1

    # image 1: two keypointed mains + a no-keypoint person + a crowd region
    add_image(1)
    add_ann(1, _rect_poly(20, 20, 80, 140), _kps_in_rect(20, 20, 80, 140),
            7200, [20, 20, 60, 120])
    add_ann(1, _rect_poly(120, 20, 180, 140), _kps_in_rect(120, 20, 180, 140),
            7200, [120, 20, 60, 120])
    add_ann(1, _rect_poly(90, 145, 112, 156), None, 242, [90, 145, 22, 11])
    crowd_mask = np.zeros((H, W), np.uint8)
    crowd_mask[0:12, 0:14] = 1
    add_ann(1, mask_to_uncompressed_rle(crowd_mask), None, 168,
            [0, 0, 14, 12], iscrowd=1)

    # image 2: one person
    add_image(2)
    add_ann(2, _rect_poly(60, 30, 130, 150), _kps_in_rect(60, 30, 130, 150),
            8400, [60, 30, 70, 120])

    # image 3: only a no-keypoint person -> masks but no samples
    add_image(3)
    add_ann(3, _rect_poly(40, 40, 100, 100), None, 3600, [40, 40, 60, 60])

    gt = {"images": images, "annotations": anns,
          "categories": [{"id": 1, "name": "person"}]}
    with open(os.path.join(root, "annotations",
                           "person_keypoints_train2017.json"), "w") as f:
        json.dump(gt, f)


def test_builder_to_training_seam(tmp_path):
    import h5py

    from improved_body_parts_tpu.data import build_records

    root = str(tmp_path)
    _fabricate_mini_coco(root)
    build_records.build(root, root)
    h5_path = os.path.join(root, "coco_train_dataset512.h5")
    assert os.path.exists(h5_path)

    with h5py.File(h5_path, "r") as f:
        # one sample per main person: 2 (img 1) + 1 (img 2) + 0 (img 3)
        assert len(f["dataset"]) == 3
        mm = f["masks"]["%012d" % 1][:, :, 0]     # mask_miss (inverted)
        ma = f["masks"]["%012d" % 1][:, :, 1]     # mask_all
        assert mm[80, 50] == 255                  # keypointed person: kept
        assert mm[150, 100] == 0                  # no-keypoint person: missed
        assert mm[5, 5] == 0                      # crowd region: missed
        assert mm[158, 2] == 255                  # background: kept
        assert ma[80, 50] == 255 and ma[150, 100] == 255 and ma[5, 5] == 255
        assert ma[158, 2] == 0
        meta = json.loads(f["dataset"]["0000000"].attrs["meta"])
        # the rider list holds the OTHER keypointed person, not the
        # unannotated ones
        assert meta["numOtherPeople"] == 1 and len(meta["joints"]) == 2

    # h5 -> pipeline -> two jitted train steps on the tiny model
    import jax
    import jax.numpy as jnp

    from improved_body_parts_tpu import train_lib
    from improved_body_parts_tpu.configs import (
        CanonicalConfig, ModelConfig, TrainConfig)
    from improved_body_parts_tpu.data.pipeline import CocoH5Dataset
    from improved_body_parts_tpu.models.imhn import create_model, init_model

    config = CanonicalConfig(width=128, height=128,
                             model=ModelConfig(nstack=1, inp_dim=16, increase=8))
    ds = CocoH5Dataset(h5_path, config)
    assert len(ds) == 3
    model = create_model(config.model, dtype=jnp.float32)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), 128, 128)
    state = train_lib.create_train_state(params, batch_stats, config.train)
    step = train_lib.make_train_step(model, config)
    losses = []
    for imgs, mask, heat in ds.batches(batch_size=2, steps=2, seed=3):
        assert imgs.shape == (2, 128, 128, 3)
        assert mask.shape == (2, 32, 32, 1)
        assert heat.shape == (2, 32, 32, 50)
        state, metrics = step(state, jnp.asarray(imgs), jnp.asarray(mask),
                              jnp.asarray(heat), jnp.float32(1e-4))
        losses.append(float(metrics["loss"]))
    assert len(losses) == 2 and all(np.isfinite(losses))
