"""SWA frozen-BN train step: running statistics must stay fixed while
parameters still update (reference train_distributed_SWA.py:221)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from improved_body_parts_tpu import train_lib
from improved_body_parts_tpu.configs import (
    CanonicalConfig, ModelConfig, NUM_LAYERS, TrainConfig,
)
from improved_body_parts_tpu.models.imhn import create_model, init_model


def test_freeze_bn_keeps_stats_but_updates_params():
    config = CanonicalConfig(width=64, height=64,
                             model=ModelConfig(nstack=1, inp_dim=32, increase=16),
                             train=dataclasses.replace(
                                 TrainConfig(), nstack_weight=(1.0,)))
    model = create_model(config.model, dtype=jnp.float32)
    params, bs = init_model(model, jax.random.PRNGKey(0), 64, 64)
    state = train_lib.create_train_state(params, bs, config.train)

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    mask = jnp.ones((2, 16, 16, 1), jnp.float32)
    heat = jnp.asarray(rng.rand(2, 16, 16, NUM_LAYERS) * 0.5, jnp.float32)

    frozen = train_lib.make_train_step(model, config, donate=False,
                                       freeze_bn=True)
    new_state, metrics = frozen(state, imgs, mask, heat, jnp.float32(1e-2))
    assert np.isfinite(float(metrics["loss"]))

    # batch stats identical, params changed
    bs0 = jax.tree_util.tree_leaves(state.batch_stats)
    bs1 = jax.tree_util.tree_leaves(new_state.batch_stats)
    for a, b in zip(bs0, bs1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.array_equal(np.asarray(p0), np.asarray(p1))

    # the normal step DOES move batch stats
    normal = train_lib.make_train_step(model, config, donate=False)
    moved_state, _ = normal(state, imgs, mask, heat, jnp.float32(1e-2))
    moved = any(not np.array_equal(np.asarray(a), np.asarray(b))
                for a, b in zip(bs0, jax.tree_util.tree_leaves(moved_state.batch_stats)))
    assert moved
