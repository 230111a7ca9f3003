"""Post-training int8 quantization (models/quantize.py).

The reference has no quantized path (fp16 via apex AMP O1 is its fastest
mode, /root/reference/demo_image.py:300-304); these tests lock the PTQ
pipeline's two guarantees: BN folding is exact (fp parity) and the int8
forward tracks the fp forward closely enough to feed the postproc chain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from improved_body_parts_tpu.configs import ModelConfig
from improved_body_parts_tpu.models.imhn import create_model, init_model
from improved_body_parts_tpu.models import quantize as qz

TINY = ModelConfig(nstack=2, inp_dim=32, increase=16)


def _randomized_variables(model, rng, size=128):
    """Init then perturb params + batch_stats so BN folding is non-trivial
    (fresh init has mean=0/var=1/scale=1 — folding would be a no-op)."""
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), size, size)
    keys = iter(jax.random.split(rng, 4096))

    def perturb(p):
        return p + 0.05 * jax.random.normal(next(keys), p.shape, jnp.float32)

    params = jax.tree_util.tree_map(perturb, params)

    def perturb_stats(path, p):
        name = path[-1].key
        k = next(keys)
        if name == "var":
            return jax.random.uniform(k, p.shape, jnp.float32, 0.5, 1.5)
        return 0.2 * jax.random.normal(k, p.shape, jnp.float32)

    batch_stats = jax.tree_util.tree_map_with_path(perturb_stats, batch_stats)
    return params, batch_stats


@pytest.fixture(scope="module")
def fp32_setup():
    model = create_model(TINY, dtype=jnp.float32)
    params, batch_stats = _randomized_variables(model, jax.random.PRNGKey(7))
    imgs = jax.random.uniform(jax.random.PRNGKey(3), (2, 128, 128, 3),
                              jnp.float32)
    ref = model.apply({"params": params, "batch_stats": batch_stats},
                      imgs, train=False)
    return model, params, batch_stats, imgs, ref


def test_fold_conv_bn_is_exact(fp32_setup):
    _, params, batch_stats, imgs, ref = fp32_setup
    folded = qz.fold_conv_bn(params, batch_stats)
    calib_model = create_model(TINY, dtype=jnp.float32, quant="calib")
    # 'calib' without a mutable quant_calib collection == folded fp forward
    out = calib_model.apply({"params": folded}, imgs, train=False)
    for s in range(len(ref[0])):
        r = np.asarray(ref[-1][s])
        o = np.asarray(out[-1][s])
        np.testing.assert_allclose(o, r, rtol=1e-4,
                                   atol=1e-4 * np.abs(r).max())


def test_calibration_scales_cover_inputs(fp32_setup):
    _, params, batch_stats, imgs, _ = fp32_setup
    folded = qz.fold_conv_bn(params, batch_stats)
    stats = qz.calibrate(TINY, folded, [np.asarray(imgs)], dtype=jnp.float32)
    leaves = jax.tree_util.tree_leaves(stats)
    assert leaves, "no calibration stats sown"
    for v in leaves:
        v = float(np.asarray(v))
        assert np.isfinite(v) and v > 0
    # first conv sees the image itself: absmax == image max
    assert np.isclose(float(np.asarray(stats["pre"]["conv1"]["absmax"][0]
                            if isinstance(stats["pre"]["conv1"]["absmax"],
                                          tuple)
                            else stats["pre"]["conv1"]["absmax"])),
                      float(np.abs(np.asarray(imgs)).max()), rtol=1e-6)


def test_int8_param_tree_shape(fp32_setup):
    _, params, batch_stats, imgs, _ = fp32_setup
    qmodel, qvars = qz.quantize_model(TINY, {"params": params,
                                             "batch_stats": batch_stats},
                                      [np.asarray(imgs)], dtype=jnp.float32)
    n_q = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(qvars["params"]):
        name = path[-1].key
        if name == "kernel_q":
            assert leaf.dtype == jnp.int8
            n_q += 1
        elif name in ("w_scale", "a_scale", "bias"):
            assert leaf.dtype == jnp.float32
            assert np.all(np.isfinite(np.asarray(leaf)))
    # every ConvBlock quantized; SE Dense kernels stay fp
    n_conv = sum(1 for p, _ in
                 jax.tree_util.tree_leaves_with_path(params)
                 if p[-1].key == "kernel" and p[-2].key == "conv")
    assert n_q == n_conv
    assert "batch_stats" not in qvars


def test_int8_forward_tracks_fp(fp32_setup):
    model, params, batch_stats, imgs, ref = fp32_setup
    qmodel, qvars = qz.quantize_model(TINY, {"params": params,
                                             "batch_stats": batch_stats},
                                      [np.asarray(imgs)], dtype=jnp.float32)
    out = qmodel.apply(qvars, imgs, train=False)
    r = np.asarray(ref[-1][0]).ravel()
    o = np.asarray(out[-1][0]).ravel()
    # int8 error accumulates through ~20 convs: demand high correlation and
    # a bounded fraction of the fp dynamic range, not elementwise equality
    corr = np.corrcoef(r, o)[0, 1]
    assert corr > 0.98, corr
    span = np.abs(r).max()
    assert np.abs(o - r).max() < 0.15 * span, (np.abs(o - r).max(), span)


def test_quantized_predictor_end_to_end(fp32_setup):
    """The int8 (model, variables) pair is a drop-in for the Predictor:
    the full padded flip-TTA -> peaks -> connections device program must
    compile and produce the packed-result structure."""
    from improved_body_parts_tpu.configs import CanonicalConfig
    from improved_body_parts_tpu.infer.predict import Predictor

    _, params, batch_stats, imgs, _ = fp32_setup
    qmodel, qvars = qz.quantize_model(TINY, {"params": params,
                                             "batch_stats": batch_stats},
                                      [np.asarray(imgs)], dtype=jnp.float32)
    config = CanonicalConfig(width=128, height=128, model=TINY)
    pred = Predictor(qmodel, qvars, config)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (128, 128, 3), np.uint8)
    kps, scores, aux = pred.predict_skeletons(img)
    assert kps.shape[1:] == (18, 3)
    assert len(scores) == len(kps)


def test_quantized_checkpoint_roundtrip(fp32_setup, tmp_path):
    """save_quantized -> load_quantized restores bit-identical int8 params
    and a model producing the exact same outputs; is_quantized_checkpoint
    distinguishes exports from fp train states."""
    _, params, batch_stats, imgs, _ = fp32_setup
    qmodel, qvars = qz.quantize_model(TINY, {"params": params,
                                             "batch_stats": batch_stats},
                                      [np.asarray(imgs)], dtype=jnp.float32)
    ckpt = str(tmp_path / "int8")
    qz.save_quantized(ckpt, qvars)
    assert qz.is_quantized_checkpoint(ckpt)
    assert not qz.is_quantized_checkpoint(str(tmp_path))
    model2, qvars2 = qz.load_quantized(TINY, ckpt, dtype=jnp.float32)
    for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(qvars["params"]),
            jax.tree_util.tree_leaves_with_path(qvars2["params"])):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    a = np.asarray(qmodel.apply(qvars, imgs, train=False)[-1][0])
    b = np.asarray(model2.apply(qvars2, imgs, train=False)[-1][0])
    np.testing.assert_array_equal(a, b)


def test_int8_jits_and_is_deterministic(fp32_setup):
    _, params, batch_stats, imgs, _ = fp32_setup
    qmodel, qvars = qz.quantize_model(TINY, {"params": params,
                                             "batch_stats": batch_stats},
                                      [np.asarray(imgs)], dtype=jnp.float32)
    fn = jax.jit(lambda v, x: qmodel.apply(v, x, train=False)[-1][0])
    a = np.asarray(fn(qvars, imgs))
    b = np.asarray(fn(qvars, imgs))
    np.testing.assert_array_equal(a, b)
