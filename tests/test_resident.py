"""Device-resident feed (data/resident.py): identity-mode loss parity with
the compact-u8 wire feed, device-warp parity with the host cv2 Transformer
(geometry exact, interpolation within cv2's 5-bit fixed point), multihost
plan slicing, and the h5 store builder incl. the oversize-downscale path."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from improved_body_parts_tpu import train_lib
from improved_body_parts_tpu.configs import CanonicalConfig, ModelConfig
from improved_body_parts_tpu.data.pipeline import AugmentSelection, Transformer
from improved_body_parts_tpu.data.resident import (
    ResidentFeed, _invert_affine, build_store,
)
from improved_body_parts_tpu.data.synthetic import SyntheticDataset
from improved_body_parts_tpu.models.imhn import create_model, init_model


def _tiny(size=64):
    config = CanonicalConfig(width=size, height=size,
                             model=ModelConfig(nstack=1, inp_dim=8, increase=4))
    model = create_model(config.model, dtype=jnp.float32)
    params, bs = init_model(model, jax.random.PRNGKey(0), size, size)
    return config, model, params, bs


def test_resident_identity_matches_compact_u8():
    """Unaugmented resident steps must reproduce the compact-u8 wire feed's
    losses exactly: the identity warp is a bit-exact copy and both paths
    rasterize GT from the same padded joints."""
    size = 64
    config, model, params, bs = _tiny(size)
    ds = SyntheticDataset(config, length=6, image_size=size)
    store_h = build_store(ds)
    store = store_h.device_arrays()
    feed = ResidentFeed(store_h, config, augment=False, max_people=8)

    state_r = train_lib.create_train_state(params, bs, config.train)
    state_c = train_lib.create_train_state(params, bs, config.train)
    step_r = train_lib.make_resident_train_step(model, config, donate=False)
    step_c = train_lib.make_train_step(model, config, compact_gt=True,
                                       donate=False)

    n = 0
    for idx, inv_m, joints in feed.plan_batches(2, steps=2, seed=0):
        state_r, m_r = step_r(state_r, store, jnp.asarray(idx),
                              jnp.asarray(inv_m), jnp.asarray(joints),
                              jnp.float32(1e-4))
        samples = [ds.get_compact(int(i), max_people=8, image_u8=True)
                   for i in idx]
        imgs = jnp.asarray(np.stack([s[0] for s in samples]))
        mm = jnp.asarray(np.stack([s[1] for s in samples]).astype(np.float32))
        gt = (jnp.asarray(np.stack([s[2][0] for s in samples])),
              jnp.asarray(np.stack([s[2][1] for s in samples]
                                   ).astype(np.float32)))
        state_c, m_c = step_c(state_c, imgs, mm, gt, jnp.float32(1e-4))
        np.testing.assert_allclose(float(m_r["loss"]), float(m_c["loss"]),
                                   rtol=1e-5)
        n += 1
    assert n == 2


def test_device_warp_matches_cv2_transformer():
    """The device image/mask warp under a full AugmentSelection (rotate +
    scale + shift + flip) must match the host cv2 path: joints EXACTLY (same
    host math), interior pixels within cv2 INTER_LINEAR's 5-bit fixed-point
    quantization, decimated masks within the same bound."""
    import cv2

    size = 64
    config = CanonicalConfig(width=size, height=size)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (80, 96, 3), np.uint8)
    mask_miss = rng.randint(0, 2, (80, 96), np.uint8) * 255
    mask_all = (rng.rand(80, 96) > 0.7).astype(np.uint8) * 255
    joints = np.zeros((2, 18, 3), np.float32)
    joints[:, :, 0] = rng.uniform(10, 86, (2, 18))
    joints[:, :, 1] = rng.uniform(10, 70, (2, 18))
    joints[:, :, 2] = 1.0
    aug = AugmentSelection(flip=True, tint=False, degree=12.0, shift=(3, -2),
                           scale=1.1)
    objpos, scale_provided = (48.0, 40.0), 0.5

    # host path (cv2): transform wants masks float-ready; it returns
    # everything warped + normalized
    h_img, h_mm, h_ma, h_joints = Transformer(config).transform(
        img, mask_miss, mask_all, joints.copy(), objpos, scale_provided,
        aug=aug)

    # device path
    from improved_body_parts_tpu.ops.warp import affine_warp
    M, _ = aug.affine(objpos, scale_provided, config)
    inv = _invert_affine(M)
    fill = np.float32([124, 127, 127]) / 255.0
    d_img = np.asarray(affine_warp(jnp.asarray(img, jnp.float32) / 255.0,
                                   inv, fill_value=fill, out_hw=(size, size)))
    d_mm = np.asarray(affine_warp(
        jnp.asarray(mask_miss, jnp.float32)[..., None] / 255.0, inv,
        fill_value=1.0, out_hw=(size, size)))[..., 0]
    d_ma = np.asarray(affine_warp(
        jnp.asarray(mask_all, jnp.float32)[..., None] / 255.0, inv,
        fill_value=0.0, out_hw=(size, size)))[..., 0]
    s = config.stride
    d_mm = d_mm.reshape(size // s, s, size // s, s).mean(axis=(1, 3))
    d_ma = d_ma.reshape(size // s, s, size // s, s).mean(axis=(1, 3))

    # joints: identical host math -> exact
    from improved_body_parts_tpu.data.resident import ResidentStore
    store = ResidentStore(img[None], None, None, [joints],
                          np.asarray([objpos], np.float32),
                          np.asarray([scale_provided], np.float32))
    feed = ResidentFeed(store, config, augment=True)
    planned_inv, planned = feed.plan_for(0, aug)
    np.testing.assert_allclose(planned_inv, inv, atol=1e-6)
    np.testing.assert_allclose(planned[:2], h_joints, atol=1e-4)
    assert (planned[2:, :, 2] == 2).all()        # padded slots absent

    # image: compare interior pixels (cv2 blends the content edge with the
    # border color over a 1-px band; our warp cuts over, a documented
    # deviation) within cv2's fixed-point quantization
    yy, xx = np.mgrid[0:size, 0:size]
    xin = inv[0, 0] * xx + inv[0, 1] * yy + inv[0, 2]
    yin = inv[1, 0] * xx + inv[1, 1] * yy + inv[1, 2]
    interior = (xin > 0.51) & (xin < 96 - 1.51) & \
               (yin > 0.51) & (yin < 80 - 1.51)
    assert interior.mean() > 0.3          # the comparison is non-trivial
    diff = np.abs(d_img - h_img)[interior]
    assert diff.max() < 16.0 / 255.0, diff.max()
    assert diff.mean() < 1.5 / 255.0, diff.mean()
    # masks: decimation dilutes the edge band; mean-level agreement
    assert np.abs(d_mm - h_mm).mean() < 0.02
    assert np.abs(d_ma - h_ma).mean() < 0.02


def test_multi_resident_dispatch_matches_single_steps():
    """K=2 scan steps in one dispatch must equal two single resident steps
    (same optimizer trajectory, stacked metrics)."""
    size = 64
    config, model, params, bs = _tiny(size)
    ds = SyntheticDataset(config, length=4, image_size=size)
    store_h = build_store(ds)
    store = store_h.device_arrays()
    feed = ResidentFeed(store_h, config, augment=True, max_people=8)

    plans = list(feed.plan_batches(2, steps=2, seed=3))
    single = train_lib.make_resident_train_step(model, config, donate=False)
    multi = train_lib.make_multi_resident_train_step(model, config,
                                                     donate=False)

    state_s = train_lib.create_train_state(params, bs, config.train)
    losses = []
    for (idx, inv_m, joints), lr in zip(plans, (1e-4, 2e-4)):
        state_s, m = single(state_s, store, jnp.asarray(idx),
                            jnp.asarray(inv_m), jnp.asarray(joints),
                            jnp.float32(lr))
        losses.append(float(m["loss"]))

    state_m = train_lib.create_train_state(params, bs, config.train)
    stack = lambda k: jnp.asarray(np.stack([p[k] for p in plans]))
    state_m, mm = multi(state_m, store, stack(0), stack(1), stack(2),
                        jnp.asarray([1e-4, 2e-4], jnp.float32))
    np.testing.assert_allclose(np.asarray(mm["loss"]), losses, rtol=1e-5)
    assert int(state_m.step) == int(state_s.step) == 2
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
        state_m.params, state_s.params)


def test_plan_batches_world_slicing():
    config = CanonicalConfig(width=64, height=64)
    ds = SyntheticDataset(config, length=5, image_size=64)
    store = build_store(ds)
    feed = ResidentFeed(store, config, augment=True)
    full = list(feed.plan_batches(4, steps=2, seed=7, rank=0, world=1))
    half0 = list(feed.plan_batches(4, steps=2, seed=7, rank=0, world=2))
    half1 = list(feed.plan_batches(4, steps=2, seed=7, rank=1, world=2))
    for (fi, fm, fj), (ai, am, aj), (bi, bm, bj) in zip(full, half0, half1):
        np.testing.assert_array_equal(fi, np.concatenate([ai, bi]))
        np.testing.assert_allclose(fm, np.concatenate([am, bm]))
        np.testing.assert_allclose(fj, np.concatenate([aj, bj]))


def test_h5_store_builder_and_augmented_step(tmp_path):
    """build_store over the fabricated reference-format h5: canvas padding
    with the border colors, oversize downscale, then one augmented resident
    train step with finite loss."""
    import h5py  # noqa: F401  (ensures the optional dep is present)

    from improved_body_parts_tpu.data import build_records, resident
    from improved_body_parts_tpu.data.pipeline import CocoH5Dataset
    from tests.test_builder_seam import _fabricate_mini_coco

    root = str(tmp_path)
    _fabricate_mini_coco(root)
    build_records.build(root, root)
    h5_path = os.path.join(root, "coco_train_dataset512.h5")

    size = 64
    config, model, params, bs = _tiny(size)
    ds = CocoH5Dataset(h5_path, config)

    # canvas padding: records are 160x200 -> pad to 192x256
    store = resident.build_store(ds, canvas_hw=(192, 256))
    assert store.images.shape == (3, 192, 256, 3)
    assert tuple(store.images[0, 170, 40]) == (124, 127, 127)   # pad color
    assert store.mask_miss[0, 170, 40] == 255                   # pad: kept
    assert store.mask_all[0, 170, 40] == 0

    # oversize downscale: canvas smaller than the records
    small = resident.build_store(ds, canvas_hw=(80, 100))
    assert small.images.shape == (3, 80, 100, 3)
    for j in small.joints:
        vis = j[:, :, 2] < 2
        assert j[:, :, 0][vis].max() <= 100 and j[:, :, 1][vis].max() <= 80
    np.testing.assert_allclose(small.scale_provided,
                               store.scale_provided * 0.5)

    # one augmented resident step end-to-end
    feed = ResidentFeed(store, config, augment=True)
    dev = store.device_arrays()
    state = train_lib.create_train_state(params, bs, config.train)
    step = train_lib.make_resident_train_step(model, config, donate=False)
    for idx, inv_m, joints in feed.plan_batches(2, steps=1, seed=1):
        state, metrics = step(state, dev, jnp.asarray(idx),
                              jnp.asarray(inv_m), jnp.asarray(joints),
                              jnp.float32(1e-4))
        assert np.isfinite(float(metrics["loss"]))


def test_sharded_store_matches_replicated():
    """Pod-scale store sharding: with the store sharded over the mesh's data
    axis (P('data') record ranges + shard-local indices + the shard_map
    gather in train_lib) the gathered records must be BIT-EXACTLY the ones a
    replicated store yields for the equivalent global indices, and the full
    train step's loss must match the replicated-store step (loose tolerance:
    the two XLA programs differ, so reduction order drifts ~1e-5 relative —
    the same program-level drift NOTES documents for the feed A/Bs)."""
    from improved_body_parts_tpu.parallel import mesh as mesh_lib

    size = 64
    config, model, params, bs = _tiny(size)
    mesh = mesh_lib.make_mesh(4, spatial=1)
    n_data = mesh.shape[mesh_lib.DATA_AXIS]
    ds = SyntheticDataset(config, length=8, image_size=size)
    store_h = build_store(ds)
    assert len(store_h) % n_data == 0

    batch_sh = mesh_lib.batch_sharding(mesh)
    repl = mesh_lib.replicated(mesh)
    store_repl = store_h.device_arrays(sharding=repl)
    store_shard = store_h.device_arrays(sharding=batch_sh)

    state_s = jax.device_put(
        train_lib.create_train_state(params, bs, config.train), repl)
    state_r = jax.device_put(
        train_lib.create_train_state(params, bs, config.train), repl)
    step_s = train_lib.make_resident_train_step(model, config, donate=False,
                                                store_mesh=mesh)
    step_r = train_lib.make_resident_train_step(model, config, donate=False)

    feed = ResidentFeed(store_h, config, augment=True, max_people=8)
    n_local = len(store_h) // n_data
    B = 8
    per_shard_b = B // n_data
    shard_of = np.arange(B) // per_shard_b

    # 1) the shard_map gather itself is bit-exact vs global indexing
    from jax.sharding import PartitionSpec as P
    gather = jax.jit(jax.shard_map(
        lambda a, i: a[i], mesh=mesh,
        in_specs=(P(mesh_lib.DATA_AXIS), P(mesh_lib.DATA_AXIS)),
        out_specs=P(mesh_lib.DATA_AXIS)))
    rng = np.random.RandomState(0)
    local_probe = rng.randint(0, n_local, B).astype(np.int32)
    got = np.asarray(gather(store_shard["images"],
                            jax.device_put(local_probe, batch_sh)))
    want = store_h.images[shard_of * n_local + local_probe]
    np.testing.assert_array_equal(got, want)

    # 2) the full step's loss matches the replicated-store step
    losses = []
    for local_idx, inv_m, joints in feed.plan_batches(
            B, steps=2, seed=3, store_shards=n_data):
        args = [jax.device_put(jnp.asarray(a), batch_sh)
                for a in (local_idx, inv_m, joints)]
        state_s, m_s = step_s(state_s, store_shard, *args,
                              jnp.float32(1e-4))
        global_idx = (shard_of * n_local + local_idx).astype(np.int32)
        args_r = [jax.device_put(jnp.asarray(a), batch_sh)
                  for a in (global_idx, inv_m, joints)]
        state_r, m_r = step_r(state_r, store_repl, *args_r,
                              jnp.float32(1e-4))
        np.testing.assert_allclose(float(m_s["loss"]), float(m_r["loss"]),
                                   rtol=5e-5)
        losses.append(float(m_s["loss"]))
    assert len(losses) == 2 and np.isfinite(np.asarray(losses)).all()
