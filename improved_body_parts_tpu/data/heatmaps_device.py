"""Device-side ground-truth rendering: the Heatmapper as a jittable program.

Why this exists: over a network-attached TPU the training feed is PAYLOAD
bound — at bs8 512² the dense fp32 GT heatmaps are ~26 MB/step, as large as
the images themselves (NOTES round-3 feed measurements). The reference
rasterizes GT on the host and ships dense tensors to the accelerator
(py_cocodata_server/py_data_heatmapper.py:10-357 feeding
train_distributed.py:256-258); the TPU-native design ships only the compact
scene description — (P,18,3) joints + a stride-resolution mask — and
rasterizes the gaussians INSIDE the jitted train step, where the VPU does
the dense math for free and nothing dense ever crosses the wire.

Semantics are locked element-for-element to the host oracle
``data/heatmaps.py`` (itself parity-locked to the reference heatmapper):

  * keypoint channels: windowed separable gaussians at grid-cell centers,
    window = ±gaussian_size/2 cells around rint(p/stride) with only the
    LOWER bound clamped to 0, max-combined across people;
  * limb channels: perpendicular-distance gaussians inside the limb bbox
    expanded by paf_thre (rounded to cells, mins clamped to 0), floored at
    0.01 below the threshold, summed then averaged where windows overlap;
  * background ch 48: 3×3 edge-padded erosion of mask_all;
    ch 49: max over the keypoint channels; final clip to [0,1].

People are consumed via ``lax.scan`` so the working set stays at one
(channels, h, w) plane regardless of the padded people count P; padded
slots use visibility code 2 ("absent") and contribute nothing, exactly like
the host path's visibility gating.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from improved_body_parts_tpu.configs import (
    BKG_START, HEAT_START, LIMBS_CONN, NUM_PARTS, CanonicalConfig,
)


def erode3_device(mask: jnp.ndarray) -> jnp.ndarray:
    """3×3 min-erosion with edge padding (host oracle: heatmaps.erode3)."""
    p = jnp.pad(mask, 1, mode="edge")
    h, w = mask.shape
    out = mask
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            out = jnp.minimum(out, jax.lax.dynamic_slice(p, (1 + dy, 1 + dx),
                                                         (h, w)))
    return out


class DeviceHeatmapper:
    """Constants mirror data/heatmaps.Heatmapper.__init__ exactly."""

    def __init__(self, config: CanonicalConfig = CanonicalConfig()):
        aug = config.aug
        self.stride = float(config.stride)
        self.h = config.height // config.stride
        self.w = config.width // config.stride
        self.double_sigma2 = 2.0 * aug.sigma * aug.sigma
        self.paf_sigma = aug.paf_sigma
        self.limb_thre = aug.limb_gaussian_thre
        self.paf_pad = float(config.paf_thre)
        self.gaussian_size = math.ceil(
            math.sqrt(-self.double_sigma2 * math.log(aug.keypoint_gaussian_thre))
            / config.stride) * 2
        self.grid_x = np.arange(self.w, dtype=np.float32) * self.stride \
            + self.stride / 2 - 0.5
        self.grid_y = np.arange(self.h, dtype=np.float32) * self.stride \
            + self.stride / 2 - 0.5
        self.limbs_from = np.asarray([fr for fr, _ in LIMBS_CONN])
        self.limbs_to = np.asarray([to for _, to in LIMBS_CONN])

    # ------------------------------------------------------------------
    def _person_kp(self, pts: jnp.ndarray, vis: jnp.ndarray) -> jnp.ndarray:
        """(18,2) pts + (18,) bool -> (18,h,w) windowed gaussians."""
        half = self.gaussian_size // 2
        gx = jnp.asarray(self.grid_x)
        gy = jnp.asarray(self.grid_y)
        cx = jnp.round(pts[:, 0] / self.stride)              # (18,)
        cy = jnp.round(pts[:, 1] / self.stride)
        ix = jnp.arange(self.w, dtype=jnp.float32)[None, :]
        iy = jnp.arange(self.h, dtype=jnp.float32)[None, :]
        win_x = (ix >= jnp.maximum(cx[:, None] - half, 0)) & \
                (ix <= cx[:, None] + half)
        win_y = (iy >= jnp.maximum(cy[:, None] - half, 0)) & \
                (iy <= cy[:, None] + half)
        ex = jnp.exp(-jnp.square(gx[None, :] - pts[:, 0:1]) / self.double_sigma2)
        ey = jnp.exp(-jnp.square(gy[None, :] - pts[:, 1:2]) / self.double_sigma2)
        g = (ey * win_y)[:, :, None] * (ex * win_x)[:, None, :]
        return g * vis[:, None, None]

    def _person_limbs(self, pts: jnp.ndarray, vis: jnp.ndarray):
        """(18,2)+(18,) -> ((30,h,w) floored gaussians, (30,h,w) window)."""
        p1 = pts[self.limbs_from]                            # (30,2)
        p2 = pts[self.limbs_to]
        valid = vis[self.limbs_from] & vis[self.limbs_to]
        x1, y1 = p1[:, 0], p1[:, 1]
        x2, y2 = p2[:, 0], p2[:, 1]
        dx, dy = x2 - x1, y2 - y1
        dnorm2 = dx * dx + dy * dy
        valid = valid & (dnorm2 > 0)
        norm = jnp.sqrt(dnorm2)

        # bbox window in grid cells; mins clamped to 0, maxes unclamped
        # (an all-negative bbox yields an empty window, = the host's skip)
        min_sx = jnp.maximum(jnp.round(
            (jnp.minimum(x1, x2) - self.paf_pad) / self.stride), 0)
        min_sy = jnp.maximum(jnp.round(
            (jnp.minimum(y1, y2) - self.paf_pad) / self.stride), 0)
        max_sx = jnp.round((jnp.maximum(x1, x2) + self.paf_pad) / self.stride)
        max_sy = jnp.round((jnp.maximum(y1, y2) + self.paf_pad) / self.stride)
        ix = jnp.arange(self.w, dtype=jnp.float32)[None, :]
        iy = jnp.arange(self.h, dtype=jnp.float32)[None, :]
        win = ((ix >= min_sx[:, None]) & (ix <= max_sx[:, None]))[:, None, :] \
            & ((iy >= min_sy[:, None]) & (iy <= max_sy[:, None]))[:, :, None] \
            & valid[:, None, None]

        X = jnp.asarray(self.grid_x)[None, None, :]          # (1,1,w)
        Y = jnp.asarray(self.grid_y)[None, :, None]          # (1,h,1)
        dist = jnp.abs(dx[:, None, None] * (y1[:, None, None] - Y)
                       - (x1[:, None, None] - X) * dy[:, None, None]) \
            / (norm[:, None, None] + 1e-6)
        g = jnp.exp(-jnp.square(dist) / (2 * self.paf_sigma ** 2))
        g = jnp.where(g <= self.limb_thre, 0.01, g)
        return jnp.where(win, g, 0.0), win.astype(jnp.float32)

    # ------------------------------------------------------------------
    def render(self, joints: jnp.ndarray,
               mask_all: jnp.ndarray | None = None) -> jnp.ndarray:
        """(P,18,3) joints (vis code 2/3 = absent; padded slots use 2) +
        optional (h,w) mask_all -> (h,w,50) float32, == the host oracle."""
        joints = joints.astype(jnp.float32)

        def body(carry, person):
            kp_max, limb_acc, limb_cnt = carry
            pts, vis = person[:, :2], person[:, 2] < 2
            kp_max = jnp.maximum(kp_max, self._person_kp(pts, vis))
            g, win = self._person_limbs(pts, vis)
            return (kp_max, limb_acc + g, limb_cnt + win), None

        init = (jnp.zeros((NUM_PARTS, self.h, self.w), jnp.float32),
                jnp.zeros((len(self.limbs_from), self.h, self.w), jnp.float32),
                jnp.zeros((len(self.limbs_from), self.h, self.w), jnp.float32))
        (kp, acc, cnt), _ = jax.lax.scan(body, init, joints)

        limbs = jnp.where(cnt > 0, acc / jnp.maximum(cnt, 1.0), 0.0)
        if mask_all is None:
            bkg = jnp.zeros((self.h, self.w), jnp.float32)
        else:
            bkg = erode3_device(mask_all.astype(jnp.float32))
        hm = jnp.concatenate([limbs, kp, bkg[None], kp.max(axis=0)[None]],
                             axis=0)
        assert hm.shape[0] == BKG_START + 2 and HEAT_START == limbs.shape[0]
        return jnp.clip(hm, 0.0, 1.0).transpose(1, 2, 0)


def pad_people(joints: np.ndarray, max_people: int) -> np.ndarray:
    """Pad/truncate (n,18,3) host joints to (max_people,18,3); padded slots
    get visibility 2 (absent) so the renderer ignores them."""
    out = np.full((max_people, NUM_PARTS, 3), 0.0, np.float32)
    out[:, :, 2] = 2.0
    n = min(len(joints), max_people)
    out[:n] = joints[:n]
    return out
