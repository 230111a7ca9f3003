"""Device-side GT rendering (data/heatmaps_device.py) parity tests.

The jitted rasterizer must reproduce the host Heatmapper (itself
parity-locked element-wise to the reference py_data_heatmapper.py) so that
training with the compact feed — joints over the wire instead of 26 MB of
dense gaussians per step — optimizes exactly the same objective.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from improved_body_parts_tpu import train_lib
from improved_body_parts_tpu.configs import (
    NUM_PARTS, CanonicalConfig, ModelConfig, TrainConfig,
)
from improved_body_parts_tpu.data.heatmaps import Heatmapper, erode3
from improved_body_parts_tpu.data.heatmaps_device import (
    DeviceHeatmapper, erode3_device, pad_people,
)
from improved_body_parts_tpu.data.synthetic import SyntheticDataset, random_people


def _scene(rng: np.random.RandomState, size: int, n_people: int) -> np.ndarray:
    """Random joints with awkward cases: mixed visibility codes, off-image
    coordinates, and one zero-length limb."""
    joints = random_people(rng, size, size, max_people=n_people)
    joints = joints[:n_people] if len(joints) >= n_people else np.concatenate(
        [joints] * n_people)[:n_people]
    # visibility codes 0/1 visible, 2/3 absent (reference coding)
    joints[:, :, 2] = rng.choice([0, 1, 1, 1, 2, 3], joints.shape[:2])
    # push some joints off-image on both sides
    joints[0, 3, :2] = [-37.2, 11.0]
    joints[0, 4, :2] = [size + 55.0, size * 0.5]
    if n_people > 1:
        # zero-length limb: Lelb == Lwri, both visible (host path skips it)
        joints[1, 6, :] = [size * 0.4, size * 0.4, 0]
        joints[1, 7, :] = joints[1, 6, :]
    return joints


@pytest.mark.parametrize("n_people", [1, 3])
def test_render_matches_host_oracle(n_people):
    size = 128
    cfg = CanonicalConfig(width=size, height=size)
    host = Heatmapper(cfg)
    dev = DeviceHeatmapper(cfg)
    render = jax.jit(dev.render)
    rng = np.random.RandomState(42 + n_people)
    for trial in range(3):
        joints = _scene(rng, size, n_people)
        mask_all = (rng.rand(host.h, host.w) > 0.3).astype(np.float32)
        want = host.create_heatmaps(joints, mask_all)
        got = np.asarray(render(jnp.asarray(joints), jnp.asarray(mask_all)))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=0,
                                   err_msg=f"trial {trial}")


def test_padded_people_slots_are_inert():
    size = 128
    cfg = CanonicalConfig(width=size, height=size)
    dev = DeviceHeatmapper(cfg)
    rng = np.random.RandomState(7)
    joints = _scene(rng, size, 2)
    mask_all = np.ones((size // 4, size // 4), np.float32)
    a = np.asarray(dev.render(jnp.asarray(joints), jnp.asarray(mask_all)))
    padded = pad_people(joints, 8)
    assert padded.shape == (8, NUM_PARTS, 3) and (padded[2:, :, 2] == 2).all()
    b = np.asarray(dev.render(jnp.asarray(padded), jnp.asarray(mask_all)))
    np.testing.assert_array_equal(a, b)


def test_erode3_device_matches_host():
    rng = np.random.RandomState(3)
    mask = (rng.rand(33, 47) > 0.4).astype(np.float32)
    got = np.asarray(erode3_device(jnp.asarray(mask)))
    np.testing.assert_array_equal(got, erode3(mask))


def test_compact_step_optimizes_the_same_objective():
    """One train step fed dense host GT vs compact (joints, mask_all) GT
    rendered in-graph: same loss, same resulting parameters (the images are
    kept fp32-identical to isolate the GT path)."""
    config = CanonicalConfig(
        width=64, height=64,
        model=ModelConfig(nstack=2, inp_dim=32, increase=16),
        train=dataclasses.replace(TrainConfig(), swa=False))
    from improved_body_parts_tpu.models.imhn import create_model, init_model
    model = create_model(config.model, dtype=jnp.float32)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), 64, 64)

    host_hm = Heatmapper(config)
    rng = np.random.RandomState(11)
    B, P = 2, 6
    imgs = rng.rand(B, 64, 64, 3).astype(np.float32)
    mask = np.ones((B, 16, 16, 1), np.float32)
    joints = np.stack([pad_people(_scene(rng, 64, 2), P) for _ in range(B)])
    mask_all = (rng.rand(B, 16, 16) > 0.2).astype(np.float32)
    heats = np.stack([host_hm.create_heatmaps(joints[b], mask_all[b])
                      for b in range(B)])

    def fresh_state():
        return train_lib.create_train_state(params, batch_stats, config.train)

    dense_step = train_lib.make_train_step(model, config, donate=False)
    s1, m1 = dense_step(fresh_state(), imgs, mask, heats, jnp.float32(1e-2))

    compact_step = train_lib.make_train_step(model, config, donate=False,
                                             compact_gt=True)
    s2, m2 = compact_step(fresh_state(), imgs, mask, (joints, mask_all),
                          jnp.float32(1e-2))

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        s1.params, s2.params)
    assert max(jax.tree_util.tree_leaves(deltas)) < 1e-5


def test_u8_feed_matches_fp32_feed_within_quantization():
    """The uint8 wire format (--feed compact-u8) must optimize the same
    objective as the fp32/bf16 feed up to the ≤1/510 image quantization:
    same-step losses agree to ~1e-3 relative, and the wire image round-trips
    to within 1/510 of the fp32 original."""
    config = CanonicalConfig(
        width=64, height=64,
        model=ModelConfig(nstack=2, inp_dim=32, increase=16),
        train=dataclasses.replace(TrainConfig(), swa=False))
    from improved_body_parts_tpu.models.imhn import create_model, init_model
    model = create_model(config.model, dtype=jnp.float32)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), 64, 64)

    rng = np.random.RandomState(5)
    B, P = 2, 6
    imgs = rng.rand(B, 64, 64, 3).astype(np.float32)
    imgs_u8 = np.clip(np.rint(imgs * 255.0), 0, 255).astype(np.uint8)
    assert np.abs(imgs_u8.astype(np.float32) / 255.0 - imgs).max() <= 1 / 509.0
    mask = np.ones((B, 16, 16, 1), np.float32)
    joints = np.stack([pad_people(_scene(rng, 64, 2), P) for _ in range(B)])
    mask_all = np.ones((B, 16, 16), np.float32)

    def fresh_state():
        return train_lib.create_train_state(params, batch_stats, config.train)

    step = train_lib.make_train_step(model, config, donate=False,
                                     compact_gt=True)
    _, m_f32 = step(fresh_state(), imgs, mask, (joints, mask_all),
                    jnp.float32(1e-2))
    _, m_u8 = step(fresh_state(), imgs_u8, mask, (joints, mask_all),
                   jnp.float32(1e-2))
    assert float(m_u8["loss"]) == pytest.approx(float(m_f32["loss"]), rel=2e-3)

    # dataset wire format: uint8 images, same GT tuple as the bf16 path
    ds = SyntheticDataset(config, length=8, image_size=64)
    (img_b, _, gt_b), = list(ds.batches(2, 1, seed=3, compact=True,
                                        image_u8=True))
    assert img_b.dtype == np.uint8
    (img_f, _, _), = list(ds.batches(2, 1, seed=3, compact=True))
    assert np.abs(img_b.astype(np.float32) / 255.0 -
                  img_f.astype(np.float32)).max() < 4e-3  # quant + bf16


def test_synthetic_compact_batches_feed_a_jitted_step():
    """End-to-end smoke: SyntheticDataset(compact=True) -> compact train
    step (bf16 images over the wire), loss finite and decreasing-ish."""
    config = CanonicalConfig(
        width=64, height=64,
        model=ModelConfig(nstack=2, inp_dim=32, increase=16),
        train=dataclasses.replace(TrainConfig(), swa=False))
    from improved_body_parts_tpu.models.imhn import create_model, init_model
    model = create_model(config.model, dtype=jnp.float32)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), 64, 64)
    state = train_lib.create_train_state(params, batch_stats, config.train)
    step = train_lib.make_train_step(model, config, donate=False,
                                     compact_gt=True)
    ds = SyntheticDataset(config, length=16, image_size=64)
    losses = []
    for imgs, masks, gt in ds.batches(4, 3, seed=1, compact=True):
        assert imgs.dtype == jnp.bfloat16
        assert gt[0].shape[1:] == (8, NUM_PARTS, 3)
        state, metrics = step(state, imgs, masks, gt, jnp.float32(1e-2))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]
