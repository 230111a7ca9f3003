"""PipelinedServer: batching, coordinate mapping, shutdown semantics —
exercised against a stub predictor (no device needed)."""

import threading

import numpy as np

from improved_body_parts_tpu.infer.serving import PipelinedServer


class _StubPredictor:
    """Letterboxes like the real Predictor (square boxsize=64) and
    'detects' one person whose nose sits at the letterboxed image center."""

    def __init__(self):
        self.calls = []
        self.lock = threading.Lock()

    def letterbox(self, img):
        size = 64
        h, w = img.shape[:2]
        scale = min(size / h, size / w)
        out = np.zeros((size, size, 3), np.uint8)
        return out, scale

    def predict_batch(self, imgs, img_hs=None, use_cpp=None,
                      content_hws=None, **kw):
        with self.lock:
            self.calls.append(len(imgs))
        out = []
        for _ in range(len(imgs)):
            kps = np.zeros((1, 18, 3))
            kps[0, 0] = [32.0, 16.0, 1.0]
            out.append((kps, np.array([2.5])))
        return out


def test_serving_batches_and_maps_coords():
    pred = _StubPredictor()
    serve = PipelinedServer(pred, batch_size=4, depth=1, flush_ms=50.0)
    # 128x256 image -> letterbox scale 0.25; nose (32,16) -> (128, 64)
    imgs = [np.zeros((128, 256, 3), np.uint8) for _ in range(6)]
    results = serve.predict_many(imgs)
    serve.close()
    assert len(results) == 6
    for kps, scores in results:
        assert kps.shape == (1, 18, 3)
        np.testing.assert_allclose(kps[0, 0, :2], [128.0, 64.0])
        assert scores[0] == 2.5
    # every dispatch is padded to the full batch size (one compiled program)
    assert all(c == 4 for c in pred.calls)
    # 6 submits at batch 4 -> 2 dispatches (flush window batches the burst)
    assert len(pred.calls) == 2


def test_serving_close_rejects_new_work():
    serve = PipelinedServer(_StubPredictor(), batch_size=2, depth=2)
    serve.close()
    try:
        serve.submit(np.zeros((32, 32, 3), np.uint8))
        raise AssertionError("expected RuntimeError after close")
    except RuntimeError:
        pass


def test_backpressure_bounds_queue_under_sustained_overload():
    """A producer faster than the device must BLOCK in submit rather than
    grow the input queue: pending() never exceeds max_pending, everything
    still completes, and the producer is measurably throttled."""
    import time

    class _SlowStub(_StubPredictor):
        def predict_batch(self, imgs, img_hs=None, use_cpp=None,
                          content_hws=None, **kw):
            time.sleep(0.03)
            return super().predict_batch(imgs, img_hs, use_cpp, content_hws)

    pred = _SlowStub()
    serve = PipelinedServer(pred, batch_size=2, depth=1, flush_ms=1.0,
                            max_pending=4)
    img = np.zeros((64, 64, 3), np.uint8)
    futs, peak = [], 0
    t0 = time.time()
    for _ in range(40):
        futs.append(serve.submit(img))
        peak = max(peak, serve.pending())
    submit_elapsed = time.time() - t0
    results = [f.result(timeout=30) for f in futs]
    serve.close()
    assert len(results) == 40
    assert peak <= 4, peak
    # 40 images / bs2 * 30 ms = ~600 ms of device time; an unthrottled
    # producer would finish instantly
    assert submit_elapsed > 0.3, submit_elapsed


def test_close_with_full_queue_does_not_deadlock():
    import time

    class _SlowStub(_StubPredictor):
        def predict_batch(self, imgs, img_hs=None, use_cpp=None,
                          content_hws=None, **kw):
            time.sleep(0.02)
            return super().predict_batch(imgs, img_hs, use_cpp, content_hws)

    serve = PipelinedServer(_SlowStub(), batch_size=2, depth=2, flush_ms=1.0,
                            max_pending=2)
    img = np.zeros((32, 32, 3), np.uint8)
    futs = [serve.submit(img) for _ in range(12)]
    serve.close()            # must drain and join despite the tiny bound
    assert all(f.done() for f in futs)


def test_serving_equals_sequential_letterbox_real_model():
    """The serving path (threaded, batched, vmapped program) must produce
    EXACTLY the sequential ``predict_skeletons(fixed_size=True)`` results —
    person counts, coordinates, and scores. Guards the evaluate.py
    ``--pipeline`` mode: any divergence between the two paths is a code bug
    (a measured non-bug divergence once looked exactly like this: letterbox
    UPSCALING out-of-scale content fragments detections in BOTH paths
    equally)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from improved_body_parts_tpu.configs import CanonicalConfig, ModelConfig
    from improved_body_parts_tpu.infer.predict import Predictor
    from improved_body_parts_tpu.models.imhn import create_model, init_model

    config = CanonicalConfig(width=64, height=64,
                             model=ModelConfig(nstack=1, inp_dim=24,
                                               increase=8))
    config = dataclasses.replace(
        config, infer=dataclasses.replace(config.infer, boxsize=64, thre1=0.01,
                                          thre2=0.01, min_person_score=0.0,
                                          min_person_parts=1))
    model = create_model(config.model, dtype=jnp.float32)
    params, bs = init_model(model, jax.random.PRNGKey(2), 64, 64)
    pred = Predictor(model, {"params": params, "batch_stats": bs}, config)

    rng = np.random.RandomState(7)
    imgs = [rng.randint(0, 255, (int(rng.randint(40, 90)),
                                 int(rng.randint(40, 90)), 3), np.uint8)
            for _ in range(5)]

    seq = [pred.predict_skeletons(im, fixed_size=True)[:2] for im in imgs]

    serve = PipelinedServer(pred, batch_size=3, depth=2, flush_ms=20.0)
    pipe = serve.predict_many(imgs)
    serve.close()

    for (ks, ss), (kp, sp) in zip(seq, pipe):
        assert len(ks) == len(kp)
        np.testing.assert_allclose(ks, kp, atol=1e-4)
        np.testing.assert_allclose(ss, sp, atol=1e-5)


def test_serving_tta_equals_sequential_tta_real_model():
    """``PipelinedServer(scales=..., angles=...)`` (the evaluate.py
    ``--pipeline --scale-search/--rotation-search`` mode) must reproduce the
    sequential ``predict_skeletons(fixed_size=True, scales=..., angles=...)``
    results — the batched TTA program and the single-image TTA program are
    the same math (Predictor._device_fn_batch_tta vs _device_fn_tta)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from improved_body_parts_tpu.configs import CanonicalConfig, ModelConfig
    from improved_body_parts_tpu.infer.predict import Predictor
    from improved_body_parts_tpu.models.imhn import create_model, init_model

    config = CanonicalConfig(width=64, height=64,
                             model=ModelConfig(nstack=1, inp_dim=24,
                                               increase=8))
    config = dataclasses.replace(
        config, infer=dataclasses.replace(config.infer, boxsize=64, thre1=0.01,
                                          thre2=0.01, min_person_score=0.0,
                                          min_person_parts=1))
    model = create_model(config.model, dtype=jnp.float32)
    params, bs = init_model(model, jax.random.PRNGKey(2), 64, 64)
    pred = Predictor(model, {"params": params, "batch_stats": bs}, config)

    rng = np.random.RandomState(11)
    imgs = [rng.randint(0, 255, (int(rng.randint(40, 90)),
                                 int(rng.randint(40, 90)), 3), np.uint8)
            for _ in range(4)]
    scales, angles = (0.75, 1.0), (0.0, 10.0)

    seq = [pred.predict_skeletons(im, fixed_size=True, scales=scales,
                                  angles=angles)[:2] for im in imgs]

    serve = PipelinedServer(pred, batch_size=2, depth=2, flush_ms=20.0,
                            scales=scales, angles=angles)
    pipe = serve.predict_many(imgs)
    serve.close()

    for (ks, ss), (kp, sp) in zip(seq, pipe):
        assert len(ks) == len(kp)
        if len(ks):
            np.testing.assert_allclose(ks, kp, atol=1e-4)
            np.testing.assert_allclose(ss, sp, atol=1e-5)
