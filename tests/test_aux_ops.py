"""Tests for auxiliary parity utilities: offset maps, offset L1 loss,
center padding, gaussian smoothing, process sharding helper."""

import jax.numpy as jnp
import numpy as np
import pytest

from improved_body_parts_tpu.configs import CanonicalConfig, NUM_PARTS
from improved_body_parts_tpu.data.heatmaps import create_offset_maps
from improved_body_parts_tpu.infer.predict import (
    center_pad_to_bucket, gaussian_blur,
)
from improved_body_parts_tpu.losses import offset_l1_loss
from improved_body_parts_tpu.parallel.mesh import process_batch_slice


def test_offset_maps_point_directions():
    cfg = CanonicalConfig(width=64, height=64)
    joints = np.zeros((1, NUM_PARTS, 3), np.float32)
    joints[0, :, 2] = 2.0
    joints[0, 0] = [33.5, 21.5, 1.0]   # exactly the center of cell (8, 5)
    vectors, mask = create_offset_maps(joints, cfg)
    assert vectors.shape == (16, 16, 2) and mask.shape == (16, 16, 2)
    # at the joint's own cell the offset is ~0
    assert abs(vectors[5, 8, 0]) < 1e-6 and abs(vectors[5, 8, 1]) < 1e-6
    assert mask[5, 8, 0] == 1.0
    # one cell right: grid_x - x = +stride -> positive x offset
    assert vectors[5, 9, 0] > 0 and abs(vectors[5, 9, 1]) < 1e-6
    # untouched cells are masked out
    assert mask[0, 15, 0] == 0.0


def test_offset_l1_loss():
    pred = jnp.ones((2, 1, 4, 4, 2))
    gt = jnp.zeros((2, 1, 4, 4, 2))
    mask = jnp.ones((2, 1, 4, 4, 2))
    loss = float(offset_l1_loss(pred, gt, mask, nstack_weight=(1.0, 3.0)))
    # per stack sum = 32; weighted (32*1 + 32*3)/4 = 32
    assert loss == pytest.approx(32.0)


def test_center_pad():
    img = np.zeros((100, 130, 3), np.uint8)
    padded, pad, (h, w) = center_pad_to_bucket(img, bucket=64, pad_value=99)
    assert padded.shape == (128, 192, 3)
    assert pad == [14, 31, 14, 31]
    assert padded[0, 0, 0] == 99 and padded[14, 31, 0] == 0


def test_gaussian_blur_preserves_mass_and_smooths():
    m = np.zeros((2, 16, 16), np.float32)
    m[0, 8, 8] = 1.0
    out = np.asarray(gaussian_blur(jnp.asarray(m), kernel_size=5, sigma=1.0))
    assert out.shape == m.shape
    assert out[0, 8, 8] < 1.0                      # peak spread out
    assert out[0].sum() == pytest.approx(1.0, abs=1e-5)  # mass preserved
    np.testing.assert_allclose(out[1], 0.0)


def test_process_batch_slice_single_process():
    s = process_batch_slice(8)
    assert (s.start, s.stop) == (0, 8)
