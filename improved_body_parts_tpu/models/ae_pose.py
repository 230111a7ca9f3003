"""Associative-Embedding-style vanilla stacked hourglass (second model
family).

Re-implementation of the reference AE baseline (models/ae_pose.py:21-77,
models/ae_layer.py): simple conv stem, N single-output hourglasses with two
BN-free 3x3 refinement convs, a 1x1 head per stack, and full-scale
merge_preds/merge_features identity mappings between stacks. Unlike the
IMHN (models/imhn.py) this supervises only the full-resolution scale —
the forward returns [nstack][1] maps so the same multi-task loss applies
with a single-scale weight.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from improved_body_parts_tpu.configs import ModelConfig
from improved_body_parts_tpu.models.imhn import (
    ConvBlock, Residual, max_pool2, upsample_nearest2,
)


class AEHourglass(nn.Module):
    """Classic single-output recursive hourglass (reference ae_layer.py)."""
    depth: int = 4
    nfeat: int = 256
    increase: int = 128
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)

        def level(d: int, h):
            c = self.nfeat + self.increase * d
            c_next = c + self.increase
            up1 = Residual(c, name=f"d{d}_up1", **kw)(h, train)
            low = max_pool2(h)
            low = Residual(c_next, name=f"d{d}_low1", **kw)(low, train)
            if d == self.depth - 1:
                low2 = Residual(c_next, name=f"d{d}_inner", **kw)(low, train)
            else:
                low2 = level(d + 1, low)
            low3 = Residual(c, name=f"d{d}_low2", **kw)(low2, train)
            return up1 + upsample_nearest2(low3)

        return level(0, x)


class AEPoseNet(nn.Module):
    """Stacked AE hourglass. Input NHWC [0,1]; output [nstack][1] maps at
    stride 4 (reference ae_pose.py:46-57 forward)."""
    cfg: ModelConfig = ModelConfig()
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        cfg = self.cfg
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        x = imgs.astype(self.dtype)
        # stem: 7x7/s2 -> 3x3 -> pool -> 3x3 -> 3x3 (ae_pose.py:25-30)
        x = ConvBlock(64, kernel=7, stride=2, name="pre0", **kw)(x, train)
        x = ConvBlock(128, kernel=3, name="pre1", **kw)(x, train)
        x = max_pool2(x)
        x = ConvBlock(128, kernel=3, name="pre2", **kw)(x, train)
        x = ConvBlock(cfg.inp_dim, kernel=3, name="pre3", **kw)(x, train)

        preds: List[List[jnp.ndarray]] = []
        for t in range(cfg.nstack):
            f = AEHourglass(depth=cfg.depth, nfeat=cfg.inp_dim,
                            increase=cfg.increase, name=f"hg{t}", **kw)(x, train)
            f = ConvBlock(cfg.inp_dim, kernel=3, bn=False, name=f"refine{t}_0",
                          dtype=self.dtype)(f, train)
            f = ConvBlock(cfg.inp_dim, kernel=3, bn=False, name=f"refine{t}_1",
                          dtype=self.dtype)(f, train)
            pred = ConvBlock(cfg.oup_dim, kernel=1, bn=False, relu=False,
                             dtype=self.dtype, name=f"out{t}")(f, train)
            preds.append([pred.astype(jnp.float32)])
            if t != cfg.nstack - 1:
                x = (x
                     + ConvBlock(cfg.inp_dim, kernel=1, bn=False, relu=False,
                                 dtype=self.dtype, name=f"merge_pred{t}")(pred, train)
                     + ConvBlock(cfg.inp_dim, kernel=1, bn=False, relu=False,
                                 dtype=self.dtype, name=f"merge_feat{t}")(f, train))
        return preds
