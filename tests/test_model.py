"""IMHN model structure tests: output pyramid shapes, channel widths, flip
equivariance plumbing, and parameter-count sanity (reference __main__ smoke
blocks, models/posenet.py:205-222)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from improved_body_parts_tpu.configs import ModelConfig
from improved_body_parts_tpu.models.imhn import (
    Hourglass, PoseNet, create_model, init_model, param_count, upsample_nearest2,
)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ModelConfig(nstack=2, inp_dim=32, increase=16, oup_dim=50)
    model = create_model(cfg, dtype=jnp.float32)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), 64, 64)
    return model, params, batch_stats


def test_output_pyramid_shapes(tiny_model):
    model, params, batch_stats = tiny_model
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out = model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)
    assert len(out) == 2          # nstack
    assert len(out[0]) == 5       # scales
    # stride 4 base: 64/4 = 16, halving per scale
    expect = [(2, 16, 16, 50), (2, 8, 8, 50), (2, 4, 4, 50), (2, 2, 2, 50), (2, 1, 1, 50)]
    for s, e in enumerate(expect):
        assert out[0][s].shape == e, (s, out[0][s].shape)
        assert out[1][s].shape == e


def test_hourglass_channel_widths():
    hg = Hourglass(depth=4, nfeat=32, increase=16, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 32), jnp.float32)
    variables = hg.init(jax.random.PRNGKey(0), x, train=False)
    outs = hg.apply(variables, x, train=False)
    # widths 32, 48, 64, 80, 96 at H, H/2, H/4, H/8, H/16
    shapes = [o.shape for o in outs]
    assert shapes == [(1, 64, 64, 32), (1, 32, 32, 48), (1, 16, 16, 64),
                      (1, 8, 8, 80), (1, 4, 4, 96)]


def test_upsample_nearest():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = upsample_nearest2(x)
    expect = np.array([[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]], np.float32)
    np.testing.assert_array_equal(np.asarray(y)[0, :, :, 0], expect)


def test_full_model_param_count():
    """Full-size IMHN parameter count must match the reference architecture.

    Counting the reference layer definitions analytically (backbone 1.01M +
    4x hourglass 22.44M + 4x features 8.89M + 4x heads 0.06M + 3x merges
    0.79M) gives ~129.0M parameters; we assert within ~1% of that.
    """
    model = create_model(ModelConfig(), dtype=jnp.bfloat16)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda rng, x: model.init(rng, x, train=False), jax.random.PRNGKey(0), dummy)
    params = shapes["params"]
    n = param_count(params)
    assert abs(n - 129.0e6) < 1.5e6, n
    assert params["pre"]["conv1"]["conv"]["kernel"].shape == (7, 7, 3, 64)
    assert params["out3_s0"]["conv"]["kernel"].shape == (1, 1, 256, 50)
    # identity-mapping merges exist for stacks 0..2 only
    assert "merge_pred2_s4" in params and "merge_pred3_s0" not in params


def test_jit_and_grad(tiny_model):
    model, params, batch_stats = tiny_model
    x = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.5

    @jax.jit
    def fwd(p, bs, x):
        return model.apply({"params": p, "batch_stats": bs}, x, train=False)[0][0]

    y = fwd(params, batch_stats, x)
    assert jnp.all(jnp.isfinite(y))

    def loss_fn(p):
        out = model.apply({"params": p, "batch_stats": batch_stats}, x,
                          train=True, mutable=["batch_stats"])[0]
        return sum(jnp.sum(jnp.square(o)) for stack in out for o in stack)

    g = jax.grad(loss_fn)(params)
    gnorm = sum(jnp.sum(jnp.square(v)) for v in jax.tree_util.tree_leaves(g))
    assert jnp.isfinite(gnorm)


def test_remat_numerics_identical(tiny_model):
    """--remat (backbone + hourglasses + feature trunks under
    jax.checkpoint) must not change forward values, gradients or the param
    tree structure — it only trades backward-pass FLOPs for memory."""
    model, params, batch_stats = tiny_model
    cfg_r = ModelConfig(nstack=2, inp_dim=32, increase=16, oup_dim=50,
                        remat=True)
    model_r = create_model(cfg_r, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)

    # identical param structure -> same checkpoint compatibility
    params_r, bs_r = init_model(model_r, jax.random.PRNGKey(0), 64, 64)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_r))

    out = model.apply({"params": params, "batch_stats": batch_stats},
                      x, train=False)
    out_r = model_r.apply({"params": params, "batch_stats": batch_stats},
                          x, train=False)
    np.testing.assert_allclose(np.asarray(out[1][0]), np.asarray(out_r[1][0]),
                               atol=1e-6)

    def loss_fn(m, p):
        o, _ = m.apply({"params": p, "batch_stats": batch_stats}, x,
                       train=True, mutable=["batch_stats"])
        return sum(jnp.sum(jnp.square(s)) for st in o for s in st)

    g = jax.grad(lambda p: loss_fn(model, p))(params)
    g_r = jax.grad(lambda p: loss_fn(model_r, p))(params)
    # gradients agree to recomputation-rounding level: the rematerialized
    # backward recomputes activations through differently-fused XLA
    # arithmetic, so bitwise equality is not expected (measured max 2.7e-4
    # relative on fp32)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-3)
