"""Loss tests: parity with a straightforward numpy oracle of the reference
focal-L2 (models/loss_model.py:23-161)."""

import jax.numpy as jnp
import numpy as np

from improved_body_parts_tpu.configs import BKG_START, HEAT_START, NUM_LAYERS, TrainConfig
from improved_body_parts_tpu.losses import (
    avg_pool_to, channel_weights, multi_task_loss, resize_bilinear,
)


def _numpy_oracle(preds, gt, mask, cfg):
    """Direct transcription of the reference math in numpy (NHWC)."""
    nstack = len(preds)
    scale_losses = []
    for s in range(len(preds[0])):
        p = np.stack([np.asarray(preds[t][s]) for t in range(nstack)])  # (T,N,h,w,C)
        h, w = p.shape[2], p.shape[3]
        n, H, W, C = gt.shape
        kh, kw = H // h, W // w
        g = gt.reshape(n, h, kh, w, kw, C).mean(axis=(2, 4))
        m = np.asarray(resize_bilinear(jnp.asarray(mask), h, w))
        m = np.where(m < 0.5, 0.0, m)
        m = np.repeat(m, C, axis=-1)
        m[..., BKG_START] *= cfg.multi_task_weight
        m[..., HEAT_START:BKG_START] *= cfg.keypoint_task_weight
        st = np.where(g >= 0.01, p, 1 - p)
        factor = np.abs(1 - st)
        out = (p - g) ** 2 * factor * m[None]
        per_stack = out.sum(axis=(1, 2, 3, 4))
        nw = np.array(cfg.nstack_weight)
        scale_losses.append((per_stack * nw).sum() / nw.sum())
    sw = np.array(cfg.scale_weight)
    return float((np.array(scale_losses) * sw).sum() / sw.sum() / gt.shape[0])


def test_channel_weights():
    w = channel_weights(0.1, 3.0)
    assert w.shape == (NUM_LAYERS,)
    assert float(w[0]) == 1.0
    assert float(w[HEAT_START]) == 3.0
    assert abs(float(w[BKG_START]) - 0.1) < 1e-7
    assert float(w[BKG_START + 1]) == 1.0


def test_avg_pool_exact():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    y = avg_pool_to(x, 2, 2)
    np.testing.assert_allclose(np.asarray(y)[0, :, :, 0],
                               [[2.5, 4.5], [10.5, 12.5]])


def test_focal_loss_matches_oracle():
    rng = np.random.RandomState(0)
    cfg = TrainConfig(nstack_weight=(1.0, 2.0), scale_weight=(0.5, 1.5))
    N, H = 2, 16
    preds = [[jnp.asarray(rng.rand(N, H // (2 ** s), H // (2 ** s), NUM_LAYERS)
                          .astype(np.float32)) for s in range(2)]
             for _ in range(2)]
    gt = rng.rand(N, H, H, NUM_LAYERS).astype(np.float32)
    mask = (rng.rand(N, H, H, 1) > 0.3).astype(np.float32)

    got = float(multi_task_loss(preds, jnp.asarray(gt), jnp.asarray(mask), cfg))
    want = _numpy_oracle(preds, gt, mask, cfg)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_loss_zero_when_perfect_and_background_empty():
    cfg = TrainConfig(nstack_weight=(1.0,), scale_weight=(1.0,))
    N, H = 1, 8
    gt = np.zeros((N, H, H, NUM_LAYERS), np.float32)
    pred = jnp.asarray(gt.copy())
    mask = np.ones((N, H, H, 1), np.float32)
    loss = float(multi_task_loss([[pred]], jnp.asarray(gt), jnp.asarray(mask), cfg))
    assert loss == 0.0
