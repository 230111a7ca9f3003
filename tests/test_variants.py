"""Model-variant tests: independent (no cross-stack), extra attention,
light config, and the AE stacked-hourglass family."""

import jax
import jax.numpy as jnp
import numpy as np

from improved_body_parts_tpu.configs import ModelConfig, TrainConfig, get_config
from improved_body_parts_tpu.losses import multi_task_loss
from improved_body_parts_tpu.models.ae_pose import AEPoseNet
from improved_body_parts_tpu.models.imhn import create_model, init_model


def _tiny(**kw):
    return ModelConfig(nstack=2, inp_dim=32, increase=16, **kw)


def test_independent_variant_has_no_merges():
    model = create_model(_tiny(cross_stack=False), dtype=jnp.float32)
    params, bs = init_model(model, jax.random.PRNGKey(0), 64, 64)
    assert not any(k.startswith("merge_") for k in params)
    out = model.apply({"params": params, "batch_stats": bs},
                      jnp.zeros((1, 64, 64, 3)), train=False)
    assert len(out) == 2 and len(out[0]) == 5


def test_extra_attention_variant():
    model = create_model(_tiny(extra_attention=True), dtype=jnp.float32)
    params, bs = init_model(model, jax.random.PRNGKey(0), 64, 64)
    assert "chattn0_s0" in params and "chattn1_s4" in params
    out = model.apply({"params": params, "batch_stats": bs},
                      jnp.zeros((1, 64, 64, 3)), train=False)
    assert out[0][0].shape == (1, 16, 16, 50)


def test_variant_registry():
    assert get_config("Independent").model.cross_stack is False
    assert get_config("Independent").model.legacy_blocks is True
    assert get_config("FinalAttention").model.extra_attention is True
    assert get_config("Light512").model.inp_dim == 128


def test_legacy_independent_family():
    """The AE-family IndependentPoseNet (models/posenet_independent.py:39-96
    + models/layers.py): plain-conv stem, old hourglass (no refine conv),
    per-scale-width features without SE, scale-0-only stack chaining."""
    model = create_model(_tiny(cross_stack=False, legacy_blocks=True),
                         dtype=jnp.float32)
    params, bs = init_model(model, jax.random.PRNGKey(0), 64, 64)
    # legacy hourglass has no refine convs, stem is pre0..pre3
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"/".join(str(k.key) for k in path) for path, _ in flat}
    assert any(n.startswith("pre0/") for n in names)
    assert not any("_refine" in n for n in names)
    assert not any("_se" in n for n in names)          # no SE in features
    assert any(n.startswith("merge_pred0/") for n in names)  # scale-0 chain
    assert not any(n.startswith("merge_pred0_s1") for n in names)
    out = model.apply({"params": params, "batch_stats": bs},
                      jnp.zeros((1, 64, 64, 3)), train=False)
    assert len(out) == 2 and len(out[0]) == 5
    assert out[0][0].shape == (1, 16, 16, 50)
    assert out[0][4].shape == (1, 1, 1, 50)


def test_ae_pose_forward_and_loss():
    cfg = _tiny()
    model = AEPoseNet(cfg=cfg, dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert len(out) == 2          # nstack
    assert len(out[0]) == 1       # single supervised scale
    assert out[0][0].shape == (2, 16, 16, 50)

    # the shared loss applies with single-scale weights
    gt = jnp.zeros((2, 16, 16, 50))
    mask = jnp.ones((2, 16, 16, 1))
    tcfg = TrainConfig(nstack_weight=(1.0, 1.0), scale_weight=(1.0,))
    loss = multi_task_loss(out, gt, mask, tcfg)
    assert np.isfinite(float(loss))
