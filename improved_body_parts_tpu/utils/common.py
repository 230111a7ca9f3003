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


def _round(v):
    """reference utils/common.py:6-7."""
    return int(round(v))


def _find_part(parts, part_idx) -> Optional["BodyPart"]:
    """First part with the given index, else None
    (reference _include_part, utils/common.py:10-14)."""
    for p in parts:
        if p.part_idx == part_idx:
            return p
    return None


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

    def _scored_parts(self, thre: float) -> List["BodyPart"]:
        return [p for p in self.body_parts.values() if p.score > thre]

    def get_face_box(self, img_w: int, img_h: int,
                     mode: int = 0) -> Optional[dict]:
        """Face bounding box. Full reference mode logic
        (utils/common.py:81-159): size voted by the largest of the
        neck-to-nose, eye-to-eye and ear-to-ear spans; the x anchor shifts
        by which eyes are present; mode=0 returns a center-format box,
        mode=1 a corner-format box with stricter eye requirements.

        BodyPart coordinates here are PIXELS (the reference stores
        normalized coords and multiplies by img_w/img_h at use; the math
        below is the same expression with that multiply pre-applied)."""
        parts = self._scored_parts(0.2)
        nose = _find_part(parts, CocoPart.Nose)
        if nose is None:
            return None
        size = 0.0
        neck = _find_part(parts, CocoPart.Neck)
        if neck is not None:
            size = max(size, (neck.y - nose.y) * 0.8)
        reye = _find_part(parts, CocoPart.REye)
        leye = _find_part(parts, CocoPart.LEye)
        if reye is not None and leye is not None:
            size = max(size, (reye.x - leye.x) * 2.0)
            # reference: img_w * hypot(NORMALIZED dx, NORMALIZED dy) —
            # with pixel coords that is hypot(dx, dy * img_w / img_h)
            size = max(size, np.hypot(reye.x - leye.x,
                                      (reye.y - leye.y) * img_w / img_h) * 2.0)
        if mode == 1 and reye is None and leye is None:
            return None
        rear = _find_part(parts, CocoPart.REar)
        lear = _find_part(parts, CocoPart.LEar)
        if rear is not None and lear is not None:
            size = max(size, (rear.x - lear.x) * 1.6)
        if size <= 0:
            return None
        if reye is None and leye is not None:
            x = nose.x - (size // 3 * 2)
        elif reye is not None and leye is None:
            x = nose.x - (size // 3)
        else:
            x = nose.x - size // 2
        x2 = x + size
        if mode == 0:
            y = nose.y - size // 3
        else:
            y = nose.y - _round(size / 2 * 1.2)
        y2 = y + size
        x = max(0, x)
        y = max(0, y)
        x2 = min(img_w - x, x2 - x) + x
        y2 = min(img_h - y, y2 - y) + y
        if _round(x2 - x) == 0.0 or _round(y2 - y) == 0.0:
            return None
        if mode == 0:
            return {"x": _round((x + x2) / 2), "y": _round((y + y2) / 2),
                    "w": _round(x2 - x), "h": _round(y2 - y)}
        return {"x": _round(x), "y": _round(y),
                "w": _round(x2 - x), "h": _round(y2 - y)}

    def get_upper_body_box(self, img_w: int, img_h: int) -> Optional[dict]:
        """Upper-body box (torso + head), center format. Full reference
        heuristics (utils/common.py:161-231): bbox of the 10 upper parts,
        expanded upward by the nose/neck distance and widened by the
        shoulder geometry. Pixel-coordinate version of the same math."""
        if not (img_w > 0 and img_h > 0):
            raise ValueError("img size should be positive")
        parts = self._scored_parts(0.3)
        upper_ids = (0, 1, 2, 5, 8, 11, 14, 15, 16, 17)
        coords = [(p.x, p.y) for p in parts if p.part_idx in upper_ids]
        if len(coords) < 5:
            return None
        x = min(c[0] for c in coords)
        y = min(c[1] for c in coords)
        x2 = max(c[0] for c in coords)
        y2 = max(c[1] for c in coords)
        nose = _find_part(parts, CocoPart.Nose)
        neck = _find_part(parts, CocoPart.Neck)
        if nose is not None and neck is not None:
            y -= (neck.y - y) * 0.8
        rsho = _find_part(parts, CocoPart.RShoulder)
        lsho = _find_part(parts, CocoPart.LShoulder)
        if rsho is not None and lsho is not None:
            half_w = x2 - x
            dx = half_w * 0.15
            x -= dx
            x2 += dx
        elif neck is not None:
            if lsho is not None and rsho is None:
                half_w = abs(lsho.x - neck.x) * 1.15
                x = min(neck.x - half_w, x)
                x2 = max(neck.x + half_w, x2)
            elif lsho is None and rsho is not None:
                half_w = abs(rsho.x - neck.x) * 1.15
                x = min(neck.x - half_w, x)
                x2 = max(neck.x + half_w, x2)
        x = max(0, x)
        y = max(0, y)
        x2 = min(img_w - x, x2 - x) + x
        y2 = min(img_h - y, y2 - y) + y
        if _round(x2 - x) == 0.0 or _round(y2 - y) == 0.0:
            return None
        return {"x": _round((x + x2) / 2), "y": _round((y + y2) / 2),
                "w": _round(x2 - x), "h": _round(y2 - y)}


# per-part drawing colors (BGR). reference: utils/common.py:240-263
COCO_COLORS = [
    [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
    [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
    [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
    [255, 0, 255], [255, 0, 170], [255, 0, 85],
]

# the demo's 25-color limb palette + the board that walks it, one color per
# drawn limb type. reference: demo_image.py:31-34, :218
LIMB_COLORS = [
    [128, 114, 250], [130, 238, 238], [48, 167, 238], [180, 105, 255],
    [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
    [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
    [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
    [255, 0, 255], [255, 0, 170], [255, 0, 85], [193, 193, 255],
    [106, 106, 255], [20, 147, 255],
]
COLOR_BOARD = [0, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21]


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


def draw_humans_ellipse(img: np.ndarray, kps: np.ndarray,
                        draw_limbs: Tuple[int, ...] = DRAW_LIST) -> np.ndarray:
    """The reference demo's limb rendering: each limb is a filled ellipse
    polygon alpha-blended onto the canvas (0.4 canvas + 0.6 overlay), with
    black endpoint circles, one palette color per drawn limb type
    (demo_image.py:217-240)."""
    import math

    import cv2
    canvas = img.copy()
    for color_idx, li in enumerate(draw_limbs):
        fr, to = LIMBS_CONN[li]
        color = LIMB_COLORS[COLOR_BOARD[color_idx % len(COLOR_BOARD)]]
        for person in kps:
            if person[fr, 2] <= 0 or person[to, 2] <= 0:
                continue
            cur = canvas.copy()
            xs = (float(person[fr, 0]), float(person[to, 0]))
            ys = (float(person[fr, 1]), float(person[to, 1]))
            m_x, m_y = np.mean(xs), np.mean(ys)
            length = math.hypot(ys[0] - ys[1], xs[0] - xs[1])
            angle = math.degrees(math.atan2(ys[0] - ys[1], xs[0] - xs[1]))
            polygon = cv2.ellipse2Poly((int(m_x), int(m_y)),
                                       (int(length / 2), 3), int(angle),
                                       0, 360, 1)
            cv2.circle(cur, (int(xs[0]), int(ys[0])), 4, color=[0, 0, 0],
                       thickness=2)
            cv2.circle(cur, (int(xs[1]), int(ys[1])), 4, color=[0, 0, 0],
                       thickness=2)
            cv2.fillConvexPoly(cur, polygon, color)
            canvas = cv2.addWeighted(canvas, 0.4, cur, 0.6, 0)
    return canvas


def show_color_vector(img: np.ndarray, paf: np.ndarray, heat: np.ndarray,
                      out_prefix: str = "maps") -> List[str]:
    """Heatmap/PAF diagnostic overlays (reference demo_image.py:246-283
    ``show_color_vector``): the PAF channel-16 flow field as an HSV
    angle/magnitude image, a raw PAF channel, the background channel, the
    reverse-mask channel and one keypoint channel, each blended over the
    input. Saves figures to ``{out_prefix}_*.png`` (headless substitute for
    the reference's plt.show) and returns the paths."""
    import cv2
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    hsv = np.zeros_like(img)
    hsv[..., 1] = 255
    mag, ang = cv2.cartToPolar(paf[:, :, 16].astype(np.float32),
                               1.5 * paf[:, :, 16].astype(np.float32))
    hsv[..., 0] = ang * 180 / np.pi / 2
    hsv[..., 2] = cv2.normalize(mag, None, 0, 255, cv2.NORM_MINMAX)
    limb_flow = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)

    panels = [
        ("flow", lambda ax: (ax.imshow(img[:, :, ::-1]),
                             ax.imshow(limb_flow, alpha=0.5))),
        ("paf11", lambda ax: (ax.imshow(img[:, :, ::-1]),
                              ax.imshow(paf[:, :, 11], alpha=0.6))),
        ("background", lambda ax: (ax.imshow(heat[:, :, -1]),
                                   ax.imshow(img[:, :, ::-1], alpha=0.25))),
        ("mask", lambda ax: (ax.imshow(heat[:, :, -2]),
                             ax.imshow(img[:, :, ::-1], alpha=0.5))),
        ("keypoint4", lambda ax: (ax.imshow(img[:, :, ::-1]),
                                  ax.imshow(heat[:, :, 4], alpha=0.5))),
    ]
    paths = []
    for name, render in panels:
        fig, ax = plt.subplots(figsize=(8, 8))
        render(ax)
        ax.set_axis_off()
        path = f"{out_prefix}_{name}.png"
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
        paths.append(path)
    return paths
