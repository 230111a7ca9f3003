"""Predictor integration tests on the CPU mesh with a tiny model: single
image, batched and multi-scale/rotation TTA paths must agree structurally,
and TTA at scale (1.0,) must reproduce the single-scale result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from improved_body_parts_tpu.configs import CanonicalConfig, ModelConfig
from improved_body_parts_tpu.infer.predict import (
    Predictor, pad_image_to_bucket, packed_size, unpack_results,
)
from improved_body_parts_tpu.models.imhn import create_model, init_model


@pytest.fixture(scope="module")
def predictor():
    config = CanonicalConfig(width=128, height=128,
                             model=ModelConfig(nstack=2, inp_dim=32, increase=16))
    model = create_model(config.model, dtype=jnp.float32)
    params, bs = init_model(model, jax.random.PRNGKey(0), 128, 128)
    return Predictor(model, {"params": params, "batch_stats": bs}, config)


def test_pad_image_to_bucket():
    img = np.zeros((100, 150, 3), np.uint8)
    padded, (h, w) = pad_image_to_bucket(img, bucket=64, pad_value=128)
    assert padded.shape == (128, 192, 3)
    assert (h, w) == (100, 150)
    assert padded[105, 5, 0] == 128  # pad region filled with pad_value
    assert padded.dtype == np.uint8


def test_predict_skeletons_runs(predictor):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (128, 128, 3), np.uint8)
    kps, scores, aux = predictor.predict_skeletons(img)
    assert kps.shape[1:] == (18, 3)
    assert len(scores) == len(kps)


def test_packed_roundtrip(predictor):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (128, 128, 3), np.uint8)
    packed, paf, heat, _ = predictor.predict_maps(img)
    buf = np.asarray(packed)
    P = predictor.config.infer.max_peaks
    assert buf.shape == (packed_size(P),)
    peaks, conns = unpack_results(buf, P)
    assert peaks.xy.shape == (18, P, 2)
    assert conns.valid.shape == (30, P)


def test_tta_scale1_matches_single(predictor):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (128, 128, 3), np.uint8)
    packed_s, _, _, _ = predictor.predict_maps(img)
    packed_t, _, _, _ = predictor.predict_maps_tta(img, scales=(1.0,),
                                                   angles=(0.0,))
    np.testing.assert_allclose(np.asarray(packed_s), np.asarray(packed_t),
                               rtol=1e-4, atol=1e-5)


def test_tta_multiscale_and_rotation_runs(predictor):
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (128, 128, 3), np.uint8)
    kps, scores, _ = predictor.predict_skeletons(img, scales=(0.5, 1.0),
                                                 angles=(0.0, 15.0))
    assert kps.shape[1:] == (18, 3)


class _PlantedPeakModel:
    """Stub model emitting fixed stride-4 maps with a nose-channel gaussian
    at given stride cells — nose is flip-self-symmetric, and the planted
    cells sit on the horizontal center so flip-averaging preserves them."""

    def __init__(self, cells):
        self.cells = cells   # list of (cy, cx) stride cells

    def apply(self, variables, imgs, train=False):
        from improved_body_parts_tpu.configs import NUM_LAYERS, PAF_LAYERS
        B, H, W = imgs.shape[:3]
        h4, w4 = H // 4, W // 4
        out = np.zeros((h4, w4, NUM_LAYERS), np.float32)
        yy, xx = np.mgrid[0:h4, 0:w4]
        for cy, cx in self.cells:
            out[..., PAF_LAYERS] = np.maximum(
                out[..., PAF_LAYERS],
                np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 1.5 ** 2)))
        return [[jnp.broadcast_to(jnp.asarray(out), (B, h4, w4, NUM_LAYERS))]]


def test_predictor_suppresses_pad_band_peaks():
    """A peak planted in the bucket pad band (y > content) must be filtered
    by the default predictor but kept in reference-refactor mode
    (reference parse_skeletons.py:272-281 vs evaluate.py:74-80)."""
    config = CanonicalConfig(width=128, height=128,
                             model=ModelConfig(nstack=1, inp_dim=8, increase=4))
    img = np.full((100, 100, 3), 60, np.uint8)   # pads to 128x128
    # canvas 128 -> 32 stride cells; mirror of x-cell c is 31-c, so a blob
    # straddling x=15.5 is flip-stable. y-cell 29 -> ~117 px, in the pad band.
    cells = [(10, 15), (10, 16), (29, 15), (29, 16)]
    model = _PlantedPeakModel(cells)
    for suppress in (True, False):
        pred = Predictor(model, {}, config, suppress_pad_peaks=suppress)
        packed, _, _, (h, w) = pred.predict_maps(img)
        peaks, _ = unpack_results(np.asarray(packed), config.infer.max_peaks)
        nose = peaks.valid[0]
        ys = peaks.xy[0][nose][:, 1]
        n_pad = (ys >= 100.0).sum()
        assert (n_pad == 0) if suppress else (n_pad >= 1), (suppress, ys)
        assert (ys < 100.0).sum() >= 1           # content peak always kept


def test_predict_batch_sharded_matches_unsharded():
    """Mesh-sharded serving scale-out: predict_batch(mesh=...) shards the
    batch over the data axis and must reproduce the unsharded results
    exactly — including when the batch (3) is not divisible by the data
    axis (8) and gets padded with repeats of the last frame."""
    from improved_body_parts_tpu.parallel.mesh import make_mesh

    config = CanonicalConfig(width=128, height=128,
                             model=ModelConfig(nstack=1, inp_dim=8, increase=4))
    cells = [(10, 15), (10, 16), (20, 15), (20, 16)]
    pred = Predictor(_PlantedPeakModel(cells), {}, config)
    mesh = make_mesh()
    P = config.infer.max_peaks
    rng = np.random.RandomState(4)

    # packed-buffer parity on a divisible batch (8 over 8 devices)
    imgs8 = rng.randint(0, 255, (8, 128, 128, 3), np.uint8)
    hs = np.full((8,), 128.0, np.float32)
    chw = np.tile(np.float32([128, 128]), (8, 1))
    base = np.asarray(pred._device_fn_batch(8, 128, 128)(
        pred.variables, jnp.asarray(imgs8), jnp.asarray(hs), jnp.asarray(chw)))
    shard = np.asarray(pred._device_fn_batch(8, 128, 128, mesh=mesh)(
        pred._mesh_variables(mesh), jnp.asarray(imgs8), jnp.asarray(hs),
        jnp.asarray(chw)))
    assert unpack_results(base[0], P)[0].valid.any()   # non-trivial compare
    np.testing.assert_allclose(shard, base, rtol=1e-5, atol=1e-6)

    # host API pads a non-divisible batch (3 -> 8) and trims the results
    out_b = pred.predict_batch(imgs8[:3])
    out_s = pred.predict_batch(imgs8[:3], mesh=mesh)
    assert len(out_s) == len(out_b) == 3
    for (kb, sb), (ks, ss) in zip(out_b, out_s):
        np.testing.assert_allclose(ks, kb, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(ss, sb, rtol=1e-5, atol=1e-5)


def test_predict_batch(predictor):
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 255, (2, 128, 128, 3), np.uint8)
    out = predictor.predict_batch(imgs)
    assert len(out) == 2
    # batched result for image 0 must equal the single-image result
    kps_b, scores_b = out[0]
    kps_s, scores_s, _ = predictor.predict_skeletons(imgs[0])
    assert kps_b.shape == kps_s.shape
    if len(kps_s):
        np.testing.assert_allclose(kps_b, kps_s, rtol=1e-4, atol=1e-4)


def test_batch_tta_matches_single_tta(predictor):
    """The batched TTA program (serving path, _device_fn_batch_tta) must
    produce the same packed buffers as the single-image TTA program
    (_device_fn_tta) — scale resize, rotation warp, crop-back, averaging,
    and vmapped postprocessing all included."""
    rng = np.random.RandomState(5)
    B, h, w = 2, 128, 128
    imgs = rng.randint(0, 255, (B, h, w, 3), np.uint8)
    scales, angles = (0.75, 1.0), (0.0, 10.0)
    fn_b = predictor._device_fn_batch_tta(B, h, w, scales, angles)
    img_hs = jnp.asarray(np.full((B,), float(h), np.float32))
    chws = jnp.asarray(np.tile(np.float32([h, w]), (B, 1)))
    packed_b = np.asarray(fn_b(predictor.variables, jnp.asarray(imgs),
                               img_hs, chws))
    fn_s = predictor._device_fn_tta(h, w, scales, angles)
    for b in range(B):
        p, _, _ = fn_s(predictor.variables, jnp.asarray(imgs[b]),
                       jnp.float32(h), jnp.asarray([h, w], np.float32))
        np.testing.assert_allclose(packed_b[b], np.asarray(p), atol=1e-4)
    # public API smoke: scales/angles reach the batched program
    out = predictor.predict_batch(imgs, scales=scales, angles=angles)
    assert len(out) == B


def test_split_tta_matches_fused_tta_maps(predictor):
    """tools/eval_tta_split.py's per-scale host loop (plain programs + cv2
    map resizes) must reproduce the fused TTA program's averaged maps —
    the fallback arm used when the fused multi-scale program exceeds the
    remote compile service's limits. Tolerance covers the split path's
    uint8 input-resize quantization (the fused program resizes float)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from eval_tta_split import split_tta_maps

    rng = np.random.RandomState(9)
    img = rng.randint(0, 255, (100, 120, 3), np.uint8)
    scales = (0.75, 1.0)

    split_avg, _ = split_tta_maps(predictor, img, scales)

    from improved_body_parts_tpu.infer.predict import pad_image_to_bucket
    padded, (oh, ow) = pad_image_to_bucket(
        img, bucket=predictor.config.infer.max_downsample,
        pad_value=predictor.config.infer.pad_value)
    fn = predictor._device_fn_tta(padded.shape[0], padded.shape[1],
                                  scales, (0.0,))
    _, paf, heat = fn(predictor.variables, jnp.asarray(padded),
                      jnp.float32(oh), jnp.asarray([oh, ow], np.float32))
    fused_avg = np.concatenate([np.asarray(paf), np.asarray(heat)], axis=-1)

    assert split_avg.shape == fused_avg.shape
    err = np.abs(split_avg - fused_avg)
    span = fused_avg.max() - fused_avg.min() + 1e-9
    assert err.max() / span < 0.05, (err.max(), span)
    assert err.mean() / span < 0.005, (err.mean(), span)
