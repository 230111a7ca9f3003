"""Pose data model and rendering helpers.

Re-implementation of the reference data model (utils/common.py:17-299:
``CocoPart``, ``BodyPart``, ``Human``, ``draw_humans``) on top of numpy
keypoint arrays.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, List, Optional, Tuple

import numpy as np

from improved_body_parts_tpu.configs import DRAW_LIST, LIMBS_CONN, NUM_PARTS, PARTS


class CocoPart(enum.IntEnum):
    """Canonical (CMU-order) part ids. reference: utils/common.py:17-36."""
    Nose = 0
    Neck = 1
    RShoulder = 2
    RElbow = 3
    RWrist = 4
    LShoulder = 5
    LElbow = 6
    LWrist = 7
    RHip = 8
    RKnee = 9
    RAnkle = 10
    LHip = 11
    LKnee = 12
    LAnkle = 13
    REye = 14
    LEye = 15
    REar = 16
    LEar = 17


@dataclasses.dataclass
class BodyPart:
    """One detected joint. reference: utils/common.py:267-288."""
    uidx: str
    part_idx: int
    x: float
    y: float
    score: float

    def get_part_name(self) -> str:
        return PARTS[self.part_idx]


class Human:
    """One assembled person. reference: utils/common.py:39-237."""

    def __init__(self, pairs=()):
        self.body_parts: Dict[int, BodyPart] = {}
        self.pairs: List = list(pairs)
        self.uidx_list = set()
        self.score: float = 0.0

    def part_count(self) -> int:
        return len(self.body_parts)

    def get_max_score(self) -> float:
        return max([p.score for p in self.body_parts.values()], default=0.0)

    def get_face_box(self, img_w: int, img_h: int,
                     mode: int = 0) -> Optional[dict]:
        """Rough face bounding box from facial keypoints
        (reference: utils/common.py:102-180, simplified heuristic)."""
        face_ids = [CocoPart.Nose, CocoPart.REye, CocoPart.LEye,
                    CocoPart.REar, CocoPart.LEar]
        pts = [(self.body_parts[i].x, self.body_parts[i].y)
               for i in face_ids if i in self.body_parts]
        if len(pts) < 2:
            return None
        xs, ys = zip(*pts)
        cx, cy = float(np.mean(xs)), float(np.mean(ys))
        size = max(max(xs) - min(xs), max(ys) - min(ys)) * 2.0
        size = max(size, 8.0)
        return dict(x=cx, y=cy, w=size, h=size)

    def get_upper_body_box(self, img_w: int, img_h: int) -> Optional[dict]:
        """Upper-body box from shoulders/hips/nose
        (reference: utils/common.py:182-227, simplified heuristic)."""
        ids = [CocoPart.Nose, CocoPart.Neck, CocoPart.RShoulder,
               CocoPart.LShoulder, CocoPart.RHip, CocoPart.LHip]
        pts = [(self.body_parts[i].x, self.body_parts[i].y)
               for i in ids if i in self.body_parts]
        if len(pts) < 3:
            return None
        xs, ys = zip(*pts)
        x0, x1 = min(xs), max(xs)
        y0, y1 = min(ys), max(ys)
        return dict(x=(x0 + x1) / 2, y=(y0 + y1) / 2,
                    w=max(x1 - x0, 8.0), h=max(y1 - y0, 8.0))


# per-part drawing colors (BGR). reference: utils/common.py:240-263
COCO_COLORS = [
    [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
    [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
    [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
    [255, 0, 255], [255, 0, 170], [255, 0, 85],
]


def humans_from_arrays(kps: np.ndarray, scores: np.ndarray) -> List[Human]:
    """Build Human objects from (N,18,3) keypoints + (N,) scores."""
    humans = []
    for pid in range(len(kps)):
        h = Human()
        for j in range(NUM_PARTS):
            x, y, v = kps[pid, j]
            if v > 0:
                h.body_parts[j] = BodyPart(f"{pid}-{j}", j, float(x), float(y), 1.0)
        h.score = float(scores[pid])
        humans.append(h)
    return humans


def draw_humans(img: np.ndarray, kps: np.ndarray,
                draw_limbs: Tuple[int, ...] = DRAW_LIST,
                radius: int = 4, thickness: int = 3) -> np.ndarray:
    """Draw skeletons on a BGR image. reference: utils/common.py:291-299,
    demo_image.py:174-192 (circle/line rendering of the refactor path)."""
    import cv2
    canvas = img.copy()
    for person in kps:
        for j in range(NUM_PARTS):
            x, y, v = person[j]
            if v > 0:
                cv2.circle(canvas, (int(round(x)), int(round(y))), radius,
                           COCO_COLORS[j % len(COCO_COLORS)], -1)
        for li in draw_limbs:
            fr, to = LIMBS_CONN[li]
            if person[fr, 2] > 0 and person[to, 2] > 0:
                p1 = (int(round(person[fr, 0])), int(round(person[fr, 1])))
                p2 = (int(round(person[to, 0])), int(round(person[to, 1])))
                cv2.line(canvas, p1, p2, COCO_COLORS[li % len(COCO_COLORS)],
                         thickness)
    return canvas
