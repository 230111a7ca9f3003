"""Affine warp tests: rotation round-trips and the image-to-stride-map
rotation-center correspondence used by rotation TTA."""

import jax.numpy as jnp
import numpy as np
import pytest

from improved_body_parts_tpu.ops.warp import affine_warp, rotation_matrix


def test_rotation_identity():
    img = np.random.RandomState(0).rand(16, 16, 2).astype(np.float32)
    m = rotation_matrix((7.5, 7.5), 0.0)
    out = np.asarray(affine_warp(jnp.asarray(img), m))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_rotation_roundtrip_recovers_interior():
    # smooth content (bilinear resampling cannot round-trip white noise)
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32)
    img = np.exp(-(((xx - 18) ** 2 + (yy - 13) ** 2) / (2 * 4.0 ** 2)))[..., None]
    c = (15.5, 15.5)
    fwd = rotation_matrix(c, -30.0)
    bwd = rotation_matrix(c, 30.0)
    rot = affine_warp(jnp.asarray(img), fwd)
    back = np.asarray(affine_warp(rot, bwd))
    # compare away from borders (fill contaminates the rim)
    np.testing.assert_allclose(back[8:24, 8:24], img[8:24, 8:24], atol=0.03)


def test_rotation_center_is_fixed_point():
    img = np.zeros((33, 33, 1), np.float32)
    img[16, 16, 0] = 1.0
    m = rotation_matrix((16.0, 16.0), 45.0)
    out = np.asarray(affine_warp(jnp.asarray(img), m))
    yx = np.unravel_index(out[..., 0].argmax(), out[..., 0].shape)
    assert yx == (16, 16)
    assert out[16, 16, 0] == pytest.approx(1.0, abs=1e-3)


def test_stride_map_center_convention():
    """A peak rotated in image space must land where the map-space
    un-rotation (with the half-pixel center mapping) expects it."""
    stride = 4
    H = W = 64  # image space
    # place a blob at image coords, rotate image, downsample 4x, un-rotate
    # the map with the stride-space center: the blob must return home
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    blob = np.exp(-(((xx - 20) ** 2 + (yy - 28) ** 2) / (2 * 3.0 ** 2)))
    ang = 30.0
    rot_img = np.asarray(affine_warp(
        jnp.asarray(blob[..., None]), rotation_matrix((W / 2, H / 2), -ang)))
    # stride-4 downsample (average pool) of the rotated image
    m = rot_img[..., 0].reshape(H // stride, stride, W // stride, stride).mean((1, 3))
    cx_s = (W / 2 + 0.5) / stride - 0.5
    cy_s = (H / 2 + 0.5) / stride - 0.5
    back = np.asarray(affine_warp(
        jnp.asarray(m[..., None]), rotation_matrix((cx_s, cy_s), ang)))[..., 0]
    py, px = np.unravel_index(back.argmax(), back.shape)
    # expected stride cell of (20, 28) via half-pixel mapping
    ex = (20 + 0.5) / stride - 0.5
    ey = (28 + 0.5) / stride - 0.5
    assert abs(px - ex) <= 1.0 and abs(py - ey) <= 1.0, (px, py, ex, ey)
