"""Training tests: LR-schedule parity with the reference formula, one SPMD
train step over the fake 8-CPU mesh (loss decreases, abnormal-loss skip
works), SWA accumulation, heatmapper sanity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from improved_body_parts_tpu import train_lib
from improved_body_parts_tpu.configs import (
    BKG_START, HEAT_START, NUM_LAYERS, CanonicalConfig, ModelConfig, TrainConfig,
)
from improved_body_parts_tpu.models.imhn import create_model, init_model
from improved_body_parts_tpu.parallel import mesh as mesh_lib


def test_learning_rate_schedule():
    cfg = TrainConfig(learning_rate=2.5e-5)
    # warmup: epoch 0 step 0, len_epoch 100 -> lr * 1/300
    lr0 = train_lib.learning_rate(cfg, 0, 0, 100, data_parallel=4)
    assert lr0 == pytest.approx(2.5e-5 * 4 * 1 / 300)
    # after warmup, before first step-down
    lr = train_lib.learning_rate(cfg, 10, 0, 100, data_parallel=4)
    assert lr == pytest.approx(1e-4)
    # epoch 30 -> factor 2
    lr = train_lib.learning_rate(cfg, 30, 0, 100, data_parallel=4)
    assert lr == pytest.approx(1e-4 * 0.2 ** 2)
    # late schedule: epoch 83 -> (83-78)//5 = 1
    lr = train_lib.learning_rate(cfg, 83, 0, 100, data_parallel=1)
    assert lr == pytest.approx(2.5e-5 * 0.2)


def test_cyclic_lr():
    cfg = TrainConfig(swa_lr_max=1e-5, swa_lr_min=1e-6, swa_freq_epochs=5)
    lrs = [train_lib.cyclic_learning_rate(cfg, e, 0) for e in range(6)]
    assert lrs[0] == pytest.approx(1e-5)
    assert lrs[4] == pytest.approx(1e-6)
    assert lrs[5] == pytest.approx(1e-5)  # cycle restarts


@pytest.fixture(scope="module")
def tiny_setup():
    config = CanonicalConfig(
        width=64, height=64,
        model=ModelConfig(nstack=2, inp_dim=32, increase=16),
        train=dataclasses.replace(TrainConfig(), swa=True))
    model = create_model(config.model, dtype=jnp.float32)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), 64, 64)
    state = train_lib.create_train_state(params, batch_stats, config.train)
    return config, model, state


def _fake_batch(batch=8, hw=64):
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(batch, hw, hw, 3), jnp.float32)
    mask = jnp.ones((batch, hw // 4, hw // 4, 1), jnp.float32)
    heat = jnp.asarray(rng.rand(batch, hw // 4, hw // 4, NUM_LAYERS) * 0.5,
                       jnp.float32)
    return imgs, mask, heat


def test_train_step_on_mesh_loss_decreases(tiny_setup):
    config, model, state = tiny_setup
    assert jax.device_count() == 8, "conftest must fake 8 CPU devices"
    mesh = mesh_lib.make_mesh(8, spatial=2)
    imgs, mask, heat = mesh_lib.shard_batch(mesh, _fake_batch())
    step = train_lib.make_train_step(model, config, donate=False)
    losses = []
    for i in range(6):
        state, metrics = step(state, imgs, mask, heat, jnp.float32(1e-2))
        losses.append(float(metrics["loss"]))
        assert float(metrics["skipped"]) == 0.0
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 6


def test_abnormal_loss_skips_update(tiny_setup):
    config, model, state = tiny_setup
    cfg2 = dataclasses.replace(config, train=dataclasses.replace(
        config.train, abnormal_loss_thresh=1e-9))  # force every loss "abnormal"
    step = train_lib.make_train_step(model, cfg2, donate=False)
    imgs, mask, heat = _fake_batch(batch=2)
    new_state, metrics = step(state, imgs, mask, heat, jnp.float32(1e-2))
    assert float(metrics["skipped"]) == 1.0
    # params unchanged
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(new_state.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_equals_continuous_training(tiny_setup, tmp_path):
    """Save at step 3, restore with a structure target, continue to step 6 —
    must match an uninterrupted 6-step run exactly (VERDICT round-1 item;
    also the ADVICE repro: a plain-dict orbax restore loses the optax
    NamedTuple structure and tx.update crashes)."""
    from improved_body_parts_tpu.utils import checkpoint as ckpt_lib

    config, model, state0 = tiny_setup
    imgs, mask, heat = _fake_batch(batch=2)
    step = train_lib.make_train_step(model, config, donate=False)

    state = state0
    for i in range(6):
        state, metrics = step(state, imgs, mask, heat, jnp.float32(1e-2))
        if i == 2:
            ckpt_lib.save_train_state(str(tmp_path / "ck"), {
                "params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "step": int(state.step),
                "epoch": 0, "train_loss": float(metrics["loss"]),
            }, step=0)
    final_uninterrupted = state

    # resume exactly as train.py --resume does: template from a fresh state
    fresh = train_lib.create_train_state(state0.params, state0.batch_stats,
                                         config.train)
    template = {"params": fresh.params, "batch_stats": fresh.batch_stats,
                "opt_state": fresh.opt_state, "step": 0, "epoch": 0,
                "train_loss": 0.0,
                # key absent from the checkpoint: must come back from target
                "swa_params": fresh.swa_params}
    restored = ckpt_lib.restore_train_state(str(tmp_path / "ck"), target=template)
    # structure must survive: same treedef as a live opt_state
    assert (jax.tree_util.tree_structure(restored["opt_state"])
            == jax.tree_util.tree_structure(fresh.opt_state))
    state = fresh._replace(params=restored["params"],
                           batch_stats=restored["batch_stats"],
                           opt_state=restored["opt_state"],
                           step=jnp.asarray(restored["step"], jnp.int32))
    for _ in range(3):
        state, _ = step(state, imgs, mask, heat, jnp.float32(1e-2))

    assert int(state.step) == int(final_uninterrupted.step) == 6
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(final_uninterrupted.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_swa_accumulation(tiny_setup):
    _, _, state = tiny_setup
    s1 = train_lib.swa_update(state)
    assert int(s1.swa_count) == 1
    p = jax.tree_util.tree_leaves(state.params)[0]
    avg = jax.tree_util.tree_leaves(s1.swa_params)[0]
    np.testing.assert_allclose(np.asarray(avg), np.asarray(p), rtol=1e-6)
    swapped = train_lib.swa_swap(s1)
    np.testing.assert_allclose(np.asarray(jax.tree_util.tree_leaves(swapped.params)[0]),
                               np.asarray(avg), rtol=1e-6)


def test_staged_batches_preserves_order_and_sharding():
    """The double-buffered feed (mesh.staged_batches) must yield exactly the
    assemble_global_batch results, in order, and propagate source errors."""
    mesh = mesh_lib.make_mesh(8, spatial=1)
    host = [(np.full((8, 4, 4, 3), i, np.float32),
             np.full((8, 1, 1, 1), i, np.float32)) for i in range(5)]
    got = list(mesh_lib.staged_batches(mesh, iter(host), depth=2))
    assert len(got) == 5
    for i, (imgs, masks) in enumerate(got):
        assert imgs.sharding.spec == mesh_lib.batch_sharding(mesh).spec
        assert float(np.asarray(imgs)[0, 0, 0, 0]) == i
        assert float(np.asarray(masks)[0, 0, 0, 0]) == i

    def boom():
        yield host[0]
        raise ValueError("source failed")

    it = mesh_lib.staged_batches(mesh, boom())
    next(it)
    with pytest.raises(ValueError, match="source failed"):
        next(it)


def test_multi_step_dispatch_equals_sequential(tiny_setup):
    """make_multi_train_step (K steps per dispatch via lax.scan) must yield
    the same final state and per-step metrics as K sequential
    make_train_step dispatches — the dispatch-amortization path is a pure
    batching of the step, not a semantic change."""
    config, model, state = tiny_setup
    mesh = mesh_lib.make_mesh(8, spatial=1)

    rng = np.random.RandomState(7)
    K = 3
    host = [(rng.rand(8, 64, 64, 3).astype(np.float32),
             np.ones((8, 16, 16, 1), np.float32),
             (rng.rand(8, 16, 16, NUM_LAYERS) * 0.5).astype(np.float32))
            for _ in range(K)]
    lrs = np.asarray([1e-2, 5e-3, 2e-3], np.float32)

    seq_step = train_lib.make_train_step(model, config, donate=False)
    seq_state, seq_losses = state, []
    for (im, mk, ht), lr in zip(host, lrs):
        batch = mesh_lib.shard_batch(mesh, (im, mk, ht))
        seq_state, m = seq_step(seq_state, batch[0], batch[1], batch[2],
                                jnp.float32(lr))
        seq_losses.append(float(m["loss"]))

    multi_step = train_lib.make_multi_train_step(model, config, donate=False)
    (n_steps, chunk), = list(mesh_lib.staged_chunks(mesh, iter(host), k=K))
    assert n_steps == K
    assert chunk[0].shape == (K, 8, 64, 64, 3)
    assert chunk[0].sharding.spec == mesh_lib.chunked_batch_sharding(mesh).spec
    multi_state, metrics = multi_step(state, chunk[0], chunk[1], chunk[2],
                                      jnp.asarray(lrs))

    # The scan body fuses differently than the standalone jit, so f32
    # reduction order differs in ulps — and Adam amplifies any gradient
    # noise into ~lr-sized param deltas (update ≈ lr·g/√v regardless of
    # |g|), making elementwise param equality unattainable across program
    # structures. The SEMANTIC check is the loss trajectory: any
    # batch-order / lr-order / BN-threading bug shifts these fast-moving
    # losses at the percent level, far above fusion noise (observed:
    # steps 1-2 bit-equal, step 3 off by 3e-4 relative).
    np.testing.assert_allclose(np.asarray(metrics["loss"]),
                               np.asarray(seq_losses), rtol=1e-3)
    assert int(multi_state.step) == int(seq_state.step) == K
    # params: trajectories must agree to a small fraction of the total
    # parameter MOVEMENT (diff-norm vs update-norm), not of the weights
    def _norm(tree_a, tree_b):
        return float(np.sqrt(sum(
            float(np.sum((np.asarray(a) - np.asarray(b)) ** 2))
            for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                            jax.tree_util.tree_leaves(tree_b)))))
    drift = _norm(multi_state.params, seq_state.params)
    moved = _norm(seq_state.params, state.params)
    assert moved > 0 and drift < 0.25 * moved, (drift, moved)


def test_staged_chunks_short_tail():
    """A batch stream not divisible by K must come back as a full chunk plus
    a short tail with the true step count."""
    mesh = mesh_lib.make_mesh(8, spatial=1)
    host = [(np.full((8, 4, 4, 3), i, np.float32),) for i in range(5)]
    got = list(mesh_lib.staged_chunks(mesh, iter(host), k=2))
    assert [n for n, _ in got] == [2, 2, 1]
    vals = [np.asarray(c[0])[:, 0, 0, 0, 0].tolist() for _, c in got]
    assert vals == [[0.0, 1.0], [2.0, 3.0], [4.0]]
