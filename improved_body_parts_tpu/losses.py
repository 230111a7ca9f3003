"""Focal L2 multi-scale, multi-stack supervision loss — one vmappable pure function.

Re-designed from the reference loss (models/loss_model.py:23-161,
models/loss_model_parallel.py) for XLA:

  * NHWC tensors; GT down-scaling is an exact average pool (the reference's
    ``adaptive_avg_pool2d``, loss_model.py:52) expressed as a reshape-mean,
    which XLA fuses into the surrounding elementwise graph.
  * mask_miss is bilinearly resized per scale then zeroed below 0.5
    (loss_model.py:55-56).
  * Channel re-weighting: person-mask channel (index BKG_START, i.e. -2)
    x multi_task_weight, keypoint channels x keypoint_task_weight
    (loss_model.py:148-149).
  * Focal factor: st = where(gt >= 0.01, s, 1-s); factor = |1-st|^gamma with
    gamma=1 in the live path (loss_model.py:151-152).
  * Stack losses weighted by nstack_weight / sum, scale losses by
    scale_weight / sum, divided by batch size (loss_model.py:37-40,156-161).

Everything is fp32 — predictions are cast before loss for bf16 training.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from improved_body_parts_tpu.configs import (
    BKG_START, HEAT_START, NUM_LAYERS, TrainConfig,
)


def channel_weights(multi_task_weight: float, keypoint_task_weight: float) -> jnp.ndarray:
    """Per-channel loss weight vector (50,). reference: loss_model.py:148-149."""
    w = jnp.ones((NUM_LAYERS,), jnp.float32)
    w = w.at[HEAT_START:BKG_START].multiply(keypoint_task_weight)
    w = w.at[BKG_START].multiply(multi_task_weight)  # channel -2: person mask
    return w


def avg_pool_to(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Exact adaptive average pool for integer-divisible sizes (NHWC)."""
    n, h, w, c = x.shape
    kh, kw = h // out_h, w // out_w
    if kh == 1 and kw == 1:
        return x
    return x.reshape(n, out_h, kh, out_w, kw, c).mean(axis=(2, 4))


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear (half-pixel) resize, matching torch align_corners=False."""
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    return jax.image.resize(x, (n, out_h, out_w, c), method="linear")


def focal_l2(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray,
             gamma: float = 1.0) -> jnp.ndarray:
    """Focal L2 per-element loss, summed over all but the stack axis.

    pred: (nstack, N, h, w, C); gt: (N, h, w, C); mask: (N, h, w, C) weighted.
    Returns (nstack,) sums. reference: loss_model.py:133-161.
    """
    st = jnp.where(gt >= 0.01, pred, 1.0 - pred)
    factor = jnp.abs(1.0 - st)
    if gamma != 1.0:
        factor = factor ** gamma
    out = jnp.square(pred - gt) * factor * mask[None]
    return out.sum(axis=(1, 2, 3, 4))


def plain_l2(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Plain L2 variant (reference loss_model.py:102-131, loss_model_parallel.py)."""
    out = jnp.square(pred - gt) * mask[None]
    return out.sum(axis=(1, 2, 3, 4))


def offset_l1_loss(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray,
                   nstack_weight=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """L1 loss for offset maps (reference loss_model.py:83-100; the offset
    head is unused by the live training path but kept for parity).

    pred/gt/mask: (nstack, N, h, w, 2). Returns a scalar."""
    per_stack = (jnp.abs(pred - gt) * mask).sum(axis=(1, 2, 3, 4))
    nw = jnp.asarray(nstack_weight[:pred.shape[0]], jnp.float32)
    return jnp.sum(per_stack * nw) / jnp.sum(nw)


def multi_task_loss(preds: Sequence[Sequence[jnp.ndarray]],
                    gt_heatmaps: jnp.ndarray,
                    mask_miss: jnp.ndarray,
                    cfg: TrainConfig = TrainConfig(),
                    use_focal: bool = True) -> jnp.ndarray:
    """Total training loss.

    preds:       [nstack][5] NHWC (N, 128/2^s, 128/2^s, 50) network outputs.
    gt_heatmaps: (N, 128, 128, 50) ground truth at stride 4.
    mask_miss:   (N, 128, 128, 1) binary unannotated-region mask.
    Returns a scalar. reference: loss_model.py:23-40.
    """
    nstack = len(preds)
    num_scales = len(preds[0])
    assert len(cfg.scale_weight) >= num_scales and len(cfg.nstack_weight) >= nstack
    # smaller model variants (fewer stacks/scales) use the leading weights
    nstack_weight = cfg.nstack_weight[:nstack]
    scale_weight = cfg.scale_weight[:num_scales]

    ch_w = channel_weights(cfg.multi_task_weight, cfg.keypoint_task_weight)
    batch = gt_heatmaps.shape[0]

    scale_losses = []
    for s in range(num_scales):
        stack_preds = jnp.stack(
            [preds[t][s].astype(jnp.float32) for t in range(nstack)], axis=0)
        h, w = stack_preds.shape[2], stack_preds.shape[3]
        gt = avg_pool_to(gt_heatmaps, h, w)
        mask = resize_bilinear(mask_miss, h, w)
        mask = jnp.where(mask < 0.5, 0.0, mask)         # loss_model.py:56
        mask = mask * ch_w[None, None, None, :]          # broadcast (N,h,w,50)
        if use_focal:
            per_stack = focal_l2(stack_preds, gt, mask, cfg.focal_gamma)
        else:
            per_stack = plain_l2(stack_preds, gt, mask)
        nw = jnp.asarray(nstack_weight, jnp.float32)
        scale_losses.append(jnp.sum(per_stack * nw) / jnp.sum(nw))

    sw = jnp.asarray(scale_weight, jnp.float32)
    total = sum(l * w for l, w in zip(scale_losses, sw))
    return total / jnp.sum(sw) / batch
