"""Checkpoint tests: the torch->flax key mapping must cover the full IMHN
parameter tree exactly (no missing / extra / mis-shaped leaves), and orbax
round-trips must preserve the training state."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from improved_body_parts_tpu.configs import ModelConfig
from improved_body_parts_tpu.models.imhn import create_model
from improved_body_parts_tpu.utils import checkpoint as ckpt


def reference_state_dict_keys(nstack=4, depth=4):
    """Enumerate the reference PoseNet state_dict keys (with 'posenet.'
    prefix), derived from its module structure (models/posenet.py:69-84,
    models/layers_transposed.py)."""
    keys = []

    def bn(prefix):
        return [f"{prefix}.weight", f"{prefix}.bias",
                f"{prefix}.running_mean", f"{prefix}.running_var",
                f"{prefix}.num_batches_tracked"]

    def residual(prefix, ins, outs):
        ks = []
        for idx in ("0", "3", "6"):
            ks.append(f"{prefix}.convBlock.{idx}.weight")
        for idx in ("1", "4", "7"):
            ks += bn(f"{prefix}.convBlock.{idx}")
        if ins != outs:
            ks.append(f"{prefix}.skipConv.0.weight")
            ks += bn(f"{prefix}.skipConv.1")
        return ks

    def conv(prefix, use_bn=True):
        ks = [f"{prefix}.conv.weight"]
        if use_bn:
            ks += bn(f"{prefix}.bn")
        else:
            ks.append(f"{prefix}.conv.bias")
        return ks

    # backbone
    keys.append("posenet.pre.conv1.weight")
    keys += bn("posenet.pre.bn1")
    keys += residual("posenet.pre.res1", 64, 128)
    keys += residual("posenet.pre.res2", 128, 128)
    for i in range(6):
        keys += conv(f"posenet.pre.dilation.{i}")

    for t in range(nstack):
        for d in range(depth):
            c = 256 + 128 * d
            cn = c + 128
            keys += residual(f"posenet.hourglass.{t}.hg.{d}.0", c, c)
            keys += residual(f"posenet.hourglass.{t}.hg.{d}.1", c, cn)
            keys += residual(f"posenet.hourglass.{t}.hg.{d}.2", cn, c)
            keys += conv(f"posenet.hourglass.{t}.hg.{d}.3")
            if d == depth - 1:
                keys += residual(f"posenet.hourglass.{t}.hg.{d}.4", cn, cn)
        for s in range(5):
            keys += conv(f"posenet.features.{t}.before_regress.{s}.0")
            keys += conv(f"posenet.features.{t}.before_regress.{s}.1")
            keys += [f"posenet.features.{t}.before_regress.{s}.2.fc.0.weight",
                     f"posenet.features.{t}.before_regress.{s}.2.fc.0.bias",
                     f"posenet.features.{t}.before_regress.{s}.2.fc.2.weight",
                     f"posenet.features.{t}.before_regress.{s}.2.fc.2.bias"]
            keys += conv(f"posenet.outs.{t}.{s}", use_bn=False)
            if t < nstack - 1:
                keys += conv(f"posenet.merge_preds.{t}.{s}.conv")
                keys += conv(f"posenet.merge_features.{t}.{s}.conv")
    return keys


def _tree_get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


@pytest.fixture(scope="module")
def expected_trees():
    model = create_model(ModelConfig(), dtype=jnp.bfloat16)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda rng, x: model.init(rng, x, train=False), jax.random.PRNGKey(0), dummy)
    return shapes["params"], shapes["batch_stats"]


def test_mapping_covers_full_tree(expected_trees):
    expected_params, expected_bs = expected_trees
    state_dict = {}
    for key in reference_state_dict_keys():
        mapped = ckpt.map_reference_key(key)
        if key.endswith("num_batches_tracked"):
            assert mapped is None
            state_dict[key] = np.zeros((), np.int64)
            continue
        assert mapped is not None, f"unmapped reference key: {key}"
        path, leaf = mapped
        if leaf in ("running_mean", "running_var"):
            shape = _tree_get(expected_bs, path + (
                "mean" if leaf == "running_mean" else "var",)).shape
            state_dict[key] = np.random.rand(*shape).astype(np.float32)
        elif leaf == "weight":  # BN scale
            shape = _tree_get(expected_params, path + ("scale",)).shape
            state_dict[key] = np.random.rand(*shape).astype(np.float32)
        elif leaf == "kernel":
            shape = _tree_get(expected_params, path + ("kernel",)).shape
            if len(shape) == 4:   # flax HWIO -> synth torch OIHW
                tshape = (shape[3], shape[2], shape[0], shape[1])
            else:                  # flax (I,O) -> torch (O,I)
                tshape = (shape[1], shape[0])
            state_dict[key] = np.random.rand(*tshape).astype(np.float32)
        else:  # bias
            shape = _tree_get(expected_params, path + ("bias",)).shape
            state_dict[key] = np.random.rand(*shape).astype(np.float32)

    params, batch_stats = ckpt.convert_torch_state_dict(state_dict)
    issues = ckpt.verify_tree_match(params, expected_params)
    issues += ckpt.verify_tree_match(batch_stats, expected_bs, "bs")
    assert not issues, "\n".join(issues[:40])


def test_conv_kernel_transpose_roundtrip():
    torch_kernel = np.arange(2 * 3 * 5 * 7).reshape(2, 3, 5, 7).astype(np.float32)
    sd = {"posenet.pre.conv1.weight": torch_kernel}
    params, _ = ckpt.convert_torch_state_dict(sd)
    flax_kernel = np.asarray(params["pre"]["conv1"]["conv"]["kernel"])
    assert flax_kernel.shape == (5, 7, 3, 2)
    np.testing.assert_array_equal(flax_kernel, torch_kernel.transpose(2, 3, 1, 0))


def test_orbax_roundtrip(tmp_path):
    state = {
        "params": {"layer": {"kernel": jnp.arange(6.0).reshape(2, 3)}},
        "batch_stats": {"layer": {"mean": jnp.zeros((3,))}},
        "epoch": 7,
    }
    ckpt.save_train_state(str(tmp_path / "ckpt"), state, step=7)
    restored = ckpt.restore_train_state(str(tmp_path / "ckpt"))
    np.testing.assert_array_equal(np.asarray(restored["params"]["layer"]["kernel"]),
                                  np.arange(6.0).reshape(2, 3))
    assert int(restored["epoch"]) == 7


def test_at_step_suffix_selects_epoch(tmp_path):
    """'DIR@N' addresses epoch/step N among the kept per-epoch checkpoints
    (used by the AP-vs-epoch curve evals)."""
    for step in (3, 5):
        ckpt.save_train_state(
            str(tmp_path / "ckpt"),
            {"params": {"w": jnp.full((2,), float(step))}, "epoch": step},
            step=step, keep=5)
    r3 = ckpt.restore_train_state(str(tmp_path / "ckpt") + "@3")
    assert int(r3["epoch"]) == 3
    np.testing.assert_array_equal(np.asarray(r3["params"]["w"]),
                                  np.full((2,), 3.0))
    latest = ckpt.restore_train_state(str(tmp_path / "ckpt"))
    assert int(latest["epoch"]) == 5


def test_numpy_fallback_restore(tmp_path):
    """The backend-agnostic raw restore (used when a checkpoint written on
    one backend is opened on another, e.g. TPU ckpt on a CPU box) returns
    the same tree as the sharded restore, as host numpy."""
    state = {
        "params": {"layer": {"kernel": jnp.arange(6.0).reshape(2, 3)}},
        "batch_stats": {"layer": {"mean": jnp.ones((3,))}},
        "epoch": 7,
    }
    ckpt.save_train_state(str(tmp_path / "ckpt"), state, step=3)
    raw = ckpt._restore_numpy(str(tmp_path / "ckpt"), 3)
    assert isinstance(raw["params"]["layer"]["kernel"], np.ndarray)
    np.testing.assert_array_equal(raw["params"]["layer"]["kernel"],
                                  np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(raw["batch_stats"]["layer"]["mean"],
                                  np.ones((3,)))
    assert int(raw["epoch"]) == 7
    assert ckpt._is_device_mismatch(
        ValueError("Device TPU v5 lite0 was not found in jax.local_devices()."))
