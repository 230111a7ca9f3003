"""Config-table sanity tests (ports of the reference's __main__ asserts,
config/config.py:114-121, 290-293)."""

import numpy as np

from improved_body_parts_tpu import configs as C


def test_limb_tables():
    assert C.LIMB_FROM.tolist() == [1, 1, 1, 1, 1, 0, 0, 14, 15, 1,
                                    2, 3, 1, 5, 6, 1, 8, 9, 1, 11, 12,
                                    0, 0, 2, 8, 5, 11, 16, 17, 8]
    assert C.LIMB_TO.tolist() == [0, 14, 15, 16, 17, 14, 15, 16, 17,
                                  2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13,
                                  2, 5, 8, 12, 11, 9, 2, 5, 11]
    assert C.LIMBS_CONN.shape == (30, 2)


def test_channel_layout():
    assert C.PAF_LAYERS == 30
    assert C.HEAT_LAYERS == 18
    assert C.NUM_LAYERS == 50
    assert C.PAF_START == 0
    assert C.HEAT_START == 30
    assert C.BKG_START == 48


def test_flip_orders_are_involutions():
    # applying a flip permutation twice must be identity
    for ord_ in (C.FLIP_HEAT_ORD, C.FLIP_PAF_ORD, C.FLIP_CHANNEL_ORD):
        assert np.array_equal(ord_[ord_], np.arange(len(ord_)))


def test_flip_orders_swap_left_right():
    # flipping the heat channels must exchange left/right part indices
    for l, r in zip(C.LEFT_PARTS, C.RIGHT_PARTS):
        assert C.FLIP_HEAT_ORD[l] == r
        assert C.FLIP_HEAT_ORD[r] == l
    # flipping the paf channels must map each limb onto its mirrored limb
    def mirror(j):
        j = int(j)
        if j in C.LEFT_PARTS:
            return int(C.RIGHT_PARTS[list(C.LEFT_PARTS).index(j)])
        if j in C.RIGHT_PARTS:
            return int(C.LEFT_PARTS[list(C.RIGHT_PARTS).index(j)])
        return j
    for i in range(C.NUM_LIMBS):
        fr, to = C.LIMBS_CONN[i]
        mi = C.FLIP_PAF_ORD[i]
        mfr, mto = C.LIMBS_CONN[mi]
        # limb gaussians are direction-symmetric, so endpoint order may flip
        # (e.g. limb 29 Rhip->Lhip maps to itself)
        assert {mirror(fr), mirror(to)} == {int(mfr), int(mto)}


def test_registry():
    cfg = C.get_config("Canonical")
    assert cfg.width == 512 and cfg.stride == 4
    assert cfg.mask_shape == (128, 128)
    assert cfg.parts_shape == (128, 128, 50)
    assert cfg.model.nstack == 4 and cfg.model.inp_dim == 256
    v = C.get_config("Canonical384x3")
    assert v.width == 384 and v.model.nstack == 3


def test_coco_conversion_neck_synthesis():
    joints = np.zeros((2, 17, 3))
    # person 0: both shoulders visible
    joints[0, C.COCO_PARTS_DICT["Rsho"]] = [10.0, 20.0, 1.0]
    joints[0, C.COCO_PARTS_DICT["Lsho"]] = [30.0, 40.0, 0.0]
    joints[0, C.COCO_PARTS_DICT["nose"]] = [5.0, 5.0, 1.0]
    # person 1: left shoulder absent
    joints[1, C.COCO_PARTS_DICT["Rsho"]] = [10.0, 20.0, 1.0]
    joints[1, C.COCO_PARTS_DICT["Lsho"]] = [0.0, 0.0, 2.0]

    out = C.convert_coco_joints(joints)
    assert out.shape == (2, 18, 3)
    neck = C.PARTS_DICT["neck"]
    np.testing.assert_allclose(out[0, neck, :2], [20.0, 30.0])
    assert out[0, neck, 2] == 0.0  # min(1, 0)
    assert out[1, neck, 2] == 2.0  # absent
    assert out[0, C.PARTS_DICT["nose"], 0] == 5.0
    # every CMU part except neck is sourced directly from the 17 COCO parts,
    # so the zero-filled source rows are copied verbatim
    assert out[0, C.PARTS_DICT["Rank"], 2] == 0.0
