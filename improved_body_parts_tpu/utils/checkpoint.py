"""Checkpointing: orbax save/restore for training state and a converter from
the reference's released torch ``.pth`` checkpoints to our Flax param pytree.

The reference saves ``{'weights': model.module.state_dict(), 'optimizer_weight',
'train_loss', 'epoch'}`` (train_distributed.py:326-338) and restores weights
only for inference (demo_image.py:292-295, evaluate.py:308-309). Here:

  * training state (params + batch_stats + opt_state + epoch) goes through
    orbax (``save_train_state`` / ``restore_train_state``);
  * ``convert_torch_state_dict`` maps the reference's module names
    (models/posenet.py:69-84, models/layers_transposed.py) onto our Flax
    module tree so the published epoch-52 checkpoint can be loaded without
    retraining — torch OIHW conv kernels transpose to HWIO, Linear (O,I)
    transposes to (I,O), BatchNorm running stats land in batch_stats.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# torch .pth -> flax conversion
# ---------------------------------------------------------------------------

def _strip_prefixes(key: str) -> str:
    for pre in ("module.", "posenet."):
        if key.startswith(pre):
            key = key[len(pre):]
    return key


_RES_CONV = {  # reference Residual.convBlock sequential indices -> our names
    "0": "conv1", "3": "conv2", "6": "conv3",
}
_RES_BN = {
    "1": "conv1", "4": "conv2", "7": "conv3",
}


def _residual_subpath(rest: str):
    """Map 'convBlock.0.weight' style suffixes inside a Residual block."""
    m = re.match(r"convBlock\.(\d)\.(weight|bias|running_mean|running_var|num_batches_tracked)$", rest)
    if m:
        idx, leaf = m.groups()
        if idx in _RES_CONV and leaf == "weight":
            return (_RES_CONV[idx], "conv"), "kernel"
        if idx in _RES_BN:
            return (_RES_BN[idx], "bn"), leaf
        return None
    m = re.match(r"skipConv\.(\d)\.(weight|bias|running_mean|running_var|num_batches_tracked)$", rest)
    if m:
        idx, leaf = m.groups()
        if idx == "0" and leaf == "weight":
            return ("skip", "conv"), "kernel"
        if idx == "1":
            return ("skip", "bn"), leaf
    return None


def _conv_subpath(rest: str):
    """Map Conv/DilatedConv module suffixes ('conv.weight', 'bn.bias', ...)."""
    m = re.match(r"conv\.(weight|bias)$", rest)
    if m:
        return ("conv",), ("kernel" if m.group(1) == "weight" else "bias")
    m = re.match(r"bn\.(weight|bias|running_mean|running_var|num_batches_tracked)$", rest)
    if m:
        return ("bn",), m.group(1)
    return None


def _se_subpath(rest: str):
    m = re.match(r"fc\.(\d)\.(weight|bias)$", rest)
    if m:
        idx, leaf = m.groups()
        name = "fc1" if idx == "0" else "fc2"
        return (name,), ("kernel" if leaf == "weight" else "bias")
    return None


def map_reference_key(key: str):
    """Map one reference state_dict key to (flax_path_tuple, leaf_kind).

    leaf_kind in {'kernel','bias','weight','running_mean','running_var'} —
    BN 'weight'/'bias' become scale/bias params, running stats batch_stats.
    Returns None for ignorable keys (num_batches_tracked, criterion buffers).
    """
    key = _strip_prefixes(key)
    if key.startswith("criterion.") or key.endswith("num_batches_tracked"):
        return None

    # backbone
    m = re.match(r"pre\.conv1\.weight$", key)
    if m:
        return ("pre", "conv1", "conv"), "kernel"
    m = re.match(r"pre\.bn1\.(\w+)$", key)
    if m:
        return ("pre", "conv1", "bn"), m.group(1)
    m = re.match(r"pre\.(res[12])\.(.+)$", key)
    if m:
        sub = _residual_subpath(m.group(2))
        if sub is None:
            return None
        path, leaf = sub
        return ("pre", m.group(1)) + path, leaf
    m = re.match(r"pre\.dilation\.(\d)\.(.+)$", key)
    if m:
        sub = _conv_subpath(m.group(2))
        if sub is None:
            return None
        path, leaf = sub
        return ("pre", f"dilated{m.group(1)}") + path, leaf

    # hourglass stacks: hourglass.{t}.hg.{d}.{k}...
    m = re.match(r"hourglass\.(\d+)\.hg\.(\d)\.(\d)\.(.+)$", key)
    if m:
        t, d, k, rest = m.groups()
        names = {"0": f"d{d}_up1", "1": f"d{d}_low1", "2": f"d{d}_low2",
                 "3": f"d{d}_refine", "4": f"d{d}_inner"}
        name = names[k]
        sub = _conv_subpath(rest) if k == "3" else _residual_subpath(rest)
        if sub is None:
            return None
        path, leaf = sub
        return (f"hg{t}", name) + path, leaf

    # per-scale feature trunks: features.{t}.before_regress.{s}.{i}...
    m = re.match(r"features\.(\d+)\.before_regress\.(\d)\.(\d)\.(.+)$", key)
    if m:
        t, s, i, rest = m.groups()
        if i in ("0", "1"):
            sub = _conv_subpath(rest)
            if sub is None:
                return None
            path, leaf = sub
            return (f"features{t}", f"s{s}_conv{int(i)+1}") + path, leaf
        if i == "2":
            sub = _se_subpath(rest)
            if sub is None:
                return None
            path, leaf = sub
            return (f"features{t}", f"s{s}_se") + path, leaf
        return None

    # heads: outs.{t}.{s}.conv.{weight,bias}
    m = re.match(r"outs\.(\d+)\.(\d)\.(.+)$", key)
    if m:
        t, s, rest = m.groups()
        sub = _conv_subpath(rest)
        if sub is None:
            return None
        path, leaf = sub
        return (f"out{t}_s{s}",) + path, leaf

    # identity-mapping merges: merge_{preds,features}.{t}.{s}.conv....
    m = re.match(r"merge_(preds|features)\.(\d+)\.(\d)\.conv\.(.+)$", key)
    if m:
        kind, t, s, rest = m.groups()
        sub = _conv_subpath(rest)
        if sub is None:
            return None
        path, leaf = sub
        name = f"merge_pred{t}_s{s}" if kind == "preds" else f"merge_feat{t}_s{s}"
        return (name,) + path, leaf

    return None


def convert_torch_state_dict(state_dict: Dict[str, Any]) -> Tuple[dict, dict]:
    """Convert a reference state_dict (torch tensors or numpy) to
    (params, batch_stats) nested dicts matching our PoseNet."""
    params: dict = {}
    batch_stats: dict = {}

    def insert(tree, path, leaf_name, value):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf_name] = value

    for key, val in state_dict.items():
        mapped = map_reference_key(key)
        if mapped is None:
            continue
        path, leaf = mapped
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        if leaf == "kernel":
            if arr.ndim == 4:        # torch conv OIHW -> flax HWIO
                arr = arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 2:      # torch Linear (O, I) -> flax (I, O)
                arr = arr.T
            insert(params, path, "kernel", jnp.asarray(arr, jnp.float32))
        elif leaf == "bias":
            insert(params, path, "bias", jnp.asarray(arr, jnp.float32))
        elif leaf == "weight":       # BN scale
            insert(params, path, "scale", jnp.asarray(arr, jnp.float32))
        elif leaf == "running_mean":
            insert(batch_stats, path, "mean", jnp.asarray(arr, jnp.float32))
        elif leaf == "running_var":
            insert(batch_stats, path, "var", jnp.asarray(arr, jnp.float32))
        # num_batches_tracked ignored
    return params, batch_stats


def export_to_torch_state_dict(params: dict, batch_stats: dict,
                               template: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of ``convert_torch_state_dict``: fill a reference-format
    state_dict (keys/shapes taken from ``template``, e.g. the real reference
    ``PoseNet().state_dict()``) with our Flax leaves, so a checkpoint trained
    here can be loaded by the reference code (models/posenet.py:50-122) for
    apples-to-apples A/B runs. Returns {key: numpy array}; keys the mapper
    ignores (num_batches_tracked, criterion buffers) keep the template value.
    Raises KeyError/ValueError on a missing leaf or shape mismatch."""
    def fetch(tree, path, leaf):
        node = tree
        for p in path:
            node = node[p]
        return np.asarray(node[leaf])

    out: Dict[str, np.ndarray] = {}
    for key, tval in template.items():
        tshape = tuple(getattr(tval, "shape", ()))
        mapped = map_reference_key(key)
        if mapped is None:
            arr = np.asarray(tval.detach().cpu().numpy()
                             if hasattr(tval, "detach") else tval)
            out[key] = arr
            continue
        path, leaf = mapped
        if leaf == "kernel":
            arr = fetch(params, path, "kernel")
            if arr.ndim == 4:        # flax HWIO -> torch conv OIHW
                arr = arr.transpose(3, 2, 0, 1)
            elif arr.ndim == 2:      # flax (I, O) -> torch Linear (O, I)
                arr = arr.T
        elif leaf == "bias":
            arr = fetch(params, path, "bias")
        elif leaf == "weight":       # BN scale
            arr = fetch(params, path, "scale")
        elif leaf == "running_mean":
            arr = fetch(batch_stats, path, "mean")
        elif leaf == "running_var":
            arr = fetch(batch_stats, path, "var")
        else:  # pragma: no cover - mapper never returns other kinds
            raise ValueError(f"unknown leaf kind {leaf} for {key}")
        arr = np.ascontiguousarray(np.asarray(arr, np.float32))
        if tuple(arr.shape) != tshape:
            raise ValueError(f"shape mismatch for {key}: "
                             f"got {arr.shape} want {tshape}")
        out[key] = arr
    return out


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference ``.pth`` file ({'weights': state_dict, ...})."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt.get("weights", ckpt)


def load_for_inference(path: str, model) -> dict:
    """Load either an orbax train-state directory or a torch .pth into
    model variables ({'params', 'batch_stats'})."""
    if path.endswith(".pth") or path.endswith(".pt"):
        state_dict = load_torch_checkpoint(path)
        params, batch_stats = convert_torch_state_dict(state_dict)
        return {"params": params, "batch_stats": batch_stats}
    state = restore_train_state(path)
    return {"params": state["params"], "batch_stats": state["batch_stats"]}


def verify_tree_match(converted: dict, expected: dict, path="") -> list:
    """Return a list of mismatch descriptions between two nested dicts of
    arrays (missing keys / extra keys / shape mismatches)."""
    issues = []
    ck = set(converted.keys()) if isinstance(converted, dict) else set()
    ek = set(expected.keys()) if isinstance(expected, dict) else set()
    for k in sorted(ek - ck):
        issues.append(f"missing {path}/{k}")
    for k in sorted(ck - ek):
        issues.append(f"extra {path}/{k}")
    for k in sorted(ck & ek):
        c, e = converted[k], expected[k]
        if isinstance(e, dict):
            issues.extend(verify_tree_match(c, e, f"{path}/{k}"))
        else:
            cs = tuple(getattr(c, "shape", ()))
            es = tuple(getattr(e, "shape", ()))
            if cs != es:
                issues.append(f"shape {path}/{k}: got {cs} want {es}")
    return issues


# ---------------------------------------------------------------------------
# orbax train-state checkpointing
# ---------------------------------------------------------------------------

def save_train_state(ckpt_dir: str, state: dict, step: int, keep: int = 3) -> None:
    """Save {'params','batch_stats','opt_state','epoch',...} with orbax.

    Equivalent role to the reference's epoch checkpoints
    (train_distributed.py:326-338)."""
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(
            ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=keep)) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))


def _restore_numpy(ckpt_dir: str, step: int) -> dict:
    """Backend-agnostic raw restore: read every leaf as host numpy, ignoring
    the sharding/device metadata saved with the checkpoint. This is what
    makes a checkpoint written on TPU loadable on a CPU-only machine (and
    vice versa) — orbax's default restore re-creates the saved
    ``jax.sharding`` and fails when those devices don't exist."""
    import jax.tree_util as jtu
    import orbax.checkpoint as ocp
    path = os.path.join(os.path.abspath(ckpt_dir), str(step), "default")
    ck = ocp.PyTreeCheckpointer()
    meta_tree = ck.metadata(path).item_metadata.tree
    restore_args = jtu.tree_map(
        lambda v: ocp.RestoreArgs(restore_type=np.ndarray)
        if hasattr(v, "shape") else ocp.RestoreArgs(), meta_tree)
    return ck.restore(path, restore_args=restore_args)


def _is_device_mismatch(err: Exception) -> bool:
    return "was not found in jax.local_devices" in str(err)


def restore_train_state(ckpt_dir: str, step: int | None = None,
                        target: dict | None = None) -> dict:
    """Restore a train-state checkpoint.

    Without ``target`` orbax returns plain nested dicts/lists — fine for
    reading params/batch_stats, but optimizer state loses its optax
    NamedTuple structure and ``tx.update`` would crash on it. Pass ``target``
    (a live state payload with the same shapes, e.g. a freshly initialized
    one) to restore each top-level entry with its original pytree structure;
    entries of ``target`` absent from the checkpoint (e.g. ``swa_params``
    when resuming --swa from a non-SWA run) are returned from ``target``
    unchanged, and checkpoint-only entries come back as plain trees.
    """
    import orbax.checkpoint as ocp
    # "DIR@N" selects epoch/step N inside the manager dir (the per-epoch
    # checkpoints train.py keeps) — used for AP-vs-epoch curves
    if step is None and "@" in os.path.basename(ckpt_dir):
        ckpt_dir, _, s = ckpt_dir.rpartition("@")
        step = int(s)
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
        if target is None:
            try:
                return mgr.restore(step)
            except ValueError as e:
                # saved on a different backend (e.g. TPU ckpt on a CPU box):
                # re-read every leaf as host numpy instead
                if not _is_device_mismatch(e):
                    raise
                return _restore_numpy(ckpt_dir, step)
        # learn the saved top-level key set from the (data-free) metadata;
        # a raw restore here would read the whole checkpoint a second time
        # and fails cross-backend
        ck = ocp.PyTreeCheckpointer()
        meta = ck.metadata(os.path.join(ckpt_dir, str(step), "default"))
        saved_keys = set(meta.item_metadata.tree.keys())
        template = {k: v for k, v in target.items() if k in saved_keys}
        restored = dict(mgr.restore(step, args=ocp.args.StandardRestore(template)))
        for k in target:
            if k not in saved_keys:
                restored[k] = target[k]
        return restored
