"""Data-pipeline tests: affine transformer math, flip part-swap, and the
hdf5 reader end-to-end on a synthetically constructed reference-format file."""

import json
import os

import numpy as np
import pytest

from improved_body_parts_tpu.configs import (
    LEFT_PARTS, NUM_PARTS, RIGHT_PARTS, CanonicalConfig, PARTS_DICT,
)
from improved_body_parts_tpu.data.pipeline import (
    AugmentSelection, CocoH5Dataset, Transformer,
)


def identity_scale_provided(cfg):
    # scale_size = target_dist / (sp * h/(h-1)) * 1 == 1  =>  sp = td*(h-1)/h
    return cfg.aug.target_dist * (cfg.height - 1) / cfg.height


def test_identity_affine_maps_objpos_to_center():
    cfg = CanonicalConfig()
    sp = identity_scale_provided(cfg)
    aug = AugmentSelection.identity()
    M, scale_size = aug.affine((100.0, 80.0), sp, cfg)
    assert scale_size == pytest.approx(1.0)
    pt = M @ np.array([100.0, 80.0, 1.0])
    assert pt[0] == pytest.approx(cfg.width / 2 - 0.5)
    assert pt[1] == pytest.approx(cfg.height / 2 - 0.5)
    # a point 10px right of objpos stays 10px right (scale 1, no rotation)
    pt2 = M @ np.array([110.0, 80.0, 1.0])
    assert pt2[0] - pt[0] == pytest.approx(10.0)


def test_flip_affine_mirrors_and_swaps_parts():
    cfg = CanonicalConfig()
    sp = identity_scale_provided(cfg)
    tr = Transformer(cfg)
    img = np.zeros((256, 256, 3), np.uint8)
    mask = np.full((256, 256), 255, np.uint8)
    joints = np.zeros((1, NUM_PARTS, 3))
    joints[0, :, 2] = 2.0
    lsho, rsho = PARTS_DICT["Lsho"], PARTS_DICT["Rsho"]
    joints[0, lsho] = [140.0, 128.0, 1.0]
    joints[0, rsho] = [116.0, 128.0, 1.0]

    aug = AugmentSelection(flip=True)
    out_img, out_miss, out_all, out_joints = tr.transform(
        img, mask, mask.copy() * 0, joints, (128.0, 128.0), sp, aug=aug,
        rng=np.random.RandomState(0))
    # the Lsho pixel (viewer-right, +12) mirrors to viewer-left (-12) and is
    # re-labeled Rsho; vice versa for Rsho
    cx = cfg.width / 2 - 0.5
    assert out_joints[0, rsho, 0] == pytest.approx(cx - 12.0, abs=1e-6)
    assert out_joints[0, lsho, 0] == pytest.approx(cx + 12.0, abs=1e-6)
    # visibility codes survive untouched
    assert out_joints[0, rsho, 2] == 1.0
    assert out_joints[0, PARTS_DICT["nose"], 2] == 2.0
    assert out_img.shape == (512, 512, 3) and out_img.dtype == np.float32
    assert out_miss.shape == (128, 128)


def _write_fake_h5(path):
    """Reference layout: dataset/images/masks groups (coco_masks_hdf5.py:270-314)."""
    import h5py
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (240, 320, 3), np.uint8)
    mask_miss = np.full((240, 320), 255, np.uint8)
    mask_all = np.zeros((240, 320), np.uint8)
    mask_all[60:200, 100:220] = 255
    joints = np.zeros((1, 17, 3))
    joints[0, :, 2] = 2.0
    joints[0, 0] = [160.0, 80.0, 1.0]     # nose
    joints[0, 5] = [180.0, 110.0, 1.0]    # Lsho
    joints[0, 6] = [140.0, 110.0, 1.0]    # Rsho
    meta = {"image": "000000000001",
            "joints": joints.tolist(),
            "objpos": [[160.0, 120.0]],
            "scale_provided": [140.0 / 512]}
    with h5py.File(path, "w") as f:
        data_grp = f.create_group("dataset")
        img_grp = f.create_group("images")
        mask_grp = f.create_group("masks")
        img_grp.create_dataset("000000000001", data=img)
        mask_grp.create_dataset(
            "000000000001", data=np.stack([mask_miss, mask_all], axis=2))
        ds = data_grp.create_dataset("0000000", data=json.dumps(meta))
        ds.attrs["meta"] = json.dumps(meta)


def test_h5_dataset_end_to_end(tmp_path):
    path = str(tmp_path / "fake512.h5")
    _write_fake_h5(path)
    ds = CocoH5Dataset(path, CanonicalConfig(), augment=False)
    assert len(ds) == 1
    img, mask, heat = ds[0]
    assert img.shape == (512, 512, 3)
    assert mask.shape == (128, 128, 1)
    assert heat.shape == (128, 128, 50)
    assert 0.0 <= img.min() and img.max() <= 1.0
    # the neck channel must fire: neck is synthesized from both shoulders
    from improved_body_parts_tpu.configs import HEAT_START
    neck_ch = heat[:, :, HEAT_START + PARTS_DICT["neck"]]
    assert neck_ch.max() > 0.9
    # batch iterator contract used by train.py
    batches = list(ds.batches(2, steps=2, seed=0))
    assert len(batches) == 2
    assert batches[0][0].shape == (2, 512, 512, 3)
    assert batches[0][2].shape == (2, 128, 128, 50)
