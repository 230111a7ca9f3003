"""Offline-builder logic tests: visibility re-encoding, main-person
selection gates, and per-instance packing (reference coco_masks_hdf5.py
semantics) — the pycocotools-dependent mask/IO paths are exercised only
when COCO is present."""

import numpy as np

from improved_body_parts_tpu.data.build_records import (
    encode_visibility, image_instances, person_records, select_main_persons,
)


def _ann(bbox, num_kp, area, kp_visibility=2):
    kp = []
    for i in range(17):
        kp += [10.0 * i, 5.0 * i, kp_visibility if i < num_kp else 0]
    return {"bbox": bbox, "area": area, "num_keypoints": num_kp,
            "keypoints": kp, "iscrowd": 0}


def test_encode_visibility():
    assert encode_visibility(2) == 1   # labeled+visible -> visible
    assert encode_visibility(1) == 0   # labeled+invisible -> invisible
    assert encode_visibility(0) == 2   # unlabeled -> absent


def test_person_records_scale_and_center():
    anns = [_ann([10, 20, 30, 40], 10, 2000)]
    recs = person_records(anns)
    assert recs[0]["objpos"] == [25.0, 40.0]
    assert recs[0]["scale_provided"] == 40 / 512
    assert recs[0]["joint"].shape == (17, 3)
    assert recs[0]["joint"][0, 2] == 1  # visible


def test_main_person_gates():
    persons = person_records([
        _ann([0, 0, 100, 200], 10, 5000),      # valid main
        _ann([0, 0, 100, 200], 3, 5000),       # too few keypoints
        _ann([0, 0, 10, 10], 10, 500),         # area too small
        _ann([10, 10, 100, 200], 10, 5000),    # too close to first main
        _ann([300, 300, 100, 200], 10, 5000),  # far away -> second main
    ])
    mains = select_main_persons(persons)
    assert len(mains) == 2
    assert mains[0] is persons[0] and mains[1] is persons[4]


def test_image_instances_one_per_main():
    anns = [_ann([0, 0, 100, 200], 10, 5000),
            _ann([300, 300, 100, 200], 10, 5000),
            _ann([600, 0, 50, 50], 0, 4000)]     # zero-kp rider excluded
    meta = {"width": 800, "height": 600}
    insts = list(image_instances(meta, 7, 0, anns, "COCO"))
    assert len(insts) == 2
    for inst in insts:
        # main person first + the other main rides along; zero-kp excluded
        assert len(inst["joints"]) == 2
        assert inst["numOtherPeople"] == 1
        assert inst["image_id"] == 7
        assert inst["isValidation"] == 0
    val_insts = list(image_instances(meta, 7, 0, anns, "COCO_val"))
    assert val_insts[0]["isValidation"] == 1
