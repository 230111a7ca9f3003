"""Post-training int8 quantization of the IMHN for TPU serving.

A capability beyond the reference (which serves fp16 via apex AMP O1,
/root/reference/demo_image.py:300-304): TPU v5e executes s8 x s8 -> s32
matmuls/convolutions on the MXU at twice the bf16 rate, so a quantized
forward can roughly double net-only serving throughput where the model is
MXU-bound.

Recipe (standard PTQ, all offline):
  1. ``fold_conv_bn``: fold every ConvBlock's BatchNorm (fp32 running
     stats) into the conv kernel + a bias — inference-only, exact.
  2. ``calibrate``: run the folded fp model (``quant='calib'``) over a few
     batches; each ConvBlock sows the abs-max of its input into the
     ``quant_calib`` collection -> per-tensor activation scales.
  3. ``build_quantized``: symmetric int8 weights with PER-OUTPUT-CHANNEL
     scales (max-abs / 127), activations per-tensor (absmax / 127).
  4. The ``quant='int8'`` model (models/imhn.py ConvBlock) quantizes each
     conv input on the fly, convolves in int8 with int32 accumulation,
     and dequantizes + biases in fp32. Squeeze-excitation Dense layers
     (<0.1% of FLOPs) stay bf16.

Accuracy: the int8 forward is parity-bounded against the BN-folded fp
forward (tests/test_quantize.py, corr > 0.98 / max error < 15% of fp span,
same check under a mesh layout in __graft_entry__.dryrun_multichip), and
measured at the metric level in the round-5 battery (NOTES.md): synthetic
AP 0.6125 vs 0.6206 bf16 on the 240-scene multi-size set, **ΔAP = -0.0081**
on trained weights. Hardware FPS for the int8 arm is recorded alongside it.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from improved_body_parts_tpu.configs import ModelConfig
from improved_body_parts_tpu.models.imhn import create_model

_BN_EPS = 1e-5  # must match ConvBlock's BatchNorm epsilon


def _as_dict(tree) -> Dict[str, Any]:
    """Normalize FrozenDict / dict trees to plain nested dicts."""
    if hasattr(tree, "items"):
        return {k: _as_dict(v) if hasattr(v, "items") else v
                for k, v in tree.items()}
    return tree


def fold_conv_bn(params, batch_stats) -> Dict[str, Any]:
    """Fold BatchNorm into conv kernels: returns the inference-only
    ``quant='calib'`` param tree ({'conv': {'kernel', 'bias'}} per block,
    no 'bn'). Exact up to float rounding: conv(x)*g/sqrt(v+eps) absorbed
    into the kernel, shift into the bias."""
    params = _as_dict(params)
    stats = _as_dict(batch_stats)

    def fold(p, s):
        out = {}
        for k, v in p.items():
            if not isinstance(v, dict):
                out[k] = v
                continue
            if ("conv" in v and "bn" in v and isinstance(v["conv"], dict)
                    and "kernel" in v["conv"]):
                bn_p, bn_s = v["bn"], s[k]["bn"]
                f = (np.asarray(bn_p["scale"], np.float32)
                     / np.sqrt(np.asarray(bn_s["var"], np.float32) + _BN_EPS))
                kernel = np.asarray(v["conv"]["kernel"], np.float32) * f
                bias = (np.asarray(bn_p["bias"], np.float32)
                        - np.asarray(bn_s["mean"], np.float32) * f)
                out[k] = {"conv": {"kernel": jnp.asarray(kernel),
                                   "bias": jnp.asarray(bias)}}
            else:
                out[k] = fold(v, s.get(k, {}) if isinstance(s, dict) else {})
        return out

    return fold(params, stats)


def _merge_max(a, b):
    if a is None:
        return b
    return jax.tree_util.tree_map(lambda x, y: np.maximum(np.asarray(x),
                                                          np.asarray(y)), a, b)


def calibrate(cfg: ModelConfig, folded_params, batches: Iterable[np.ndarray],
              dtype: Any = jnp.bfloat16) -> Dict[str, Any]:
    """Run the folded fp model over calibration batches; returns the
    per-ConvBlock input abs-max tree ({... {'absmax': scalar}})."""
    model = create_model(cfg, dtype=dtype, quant="calib")

    @jax.jit
    def run(params, imgs):
        _, mut = model.apply({"params": params}, imgs, train=False,
                             mutable=["quant_calib"])
        return mut["quant_calib"]

    stats = None
    for imgs in batches:
        s = jax.device_get(run(folded_params, jnp.asarray(imgs)))
        stats = _merge_max(stats, _as_dict(s))
    if stats is None:
        raise ValueError("calibrate() needs at least one batch")
    return stats


def build_quantized(folded_params, calib_stats) -> Dict[str, Any]:
    """Symmetric int8 quantization of every folded conv (per-out-channel
    weight scales, per-tensor activation scale from calibration)."""
    folded_params = _as_dict(folded_params)

    def walk(p, s):
        out = {}
        for k, v in p.items():
            if not isinstance(v, dict):
                out[k] = v
                continue
            if ("conv" in v and isinstance(v["conv"], dict)
                    and "kernel" in v["conv"]
                    and np.ndim(v["conv"]["kernel"]) == 4):
                kernel = np.asarray(v["conv"]["kernel"], np.float32)
                bias = np.asarray(
                    v["conv"].get("bias", np.zeros(kernel.shape[-1])),
                    np.float32)
                absmax = float(np.asarray(s[k]["absmax"]))
                a_scale = np.float32(max(absmax / 127.0, 1e-8))
                w_scale = np.maximum(
                    np.max(np.abs(kernel), axis=(0, 1, 2)) / 127.0, 1e-12
                ).astype(np.float32)
                kq = np.clip(np.round(kernel / w_scale), -127,
                             127).astype(np.int8)
                out[k] = {"kernel_q": jnp.asarray(kq),
                          "bias": jnp.asarray(bias),
                          "w_scale": jnp.asarray(w_scale),
                          "a_scale": jnp.asarray(a_scale)}
            else:
                out[k] = walk(v, s.get(k, {}) if isinstance(s, dict) else {})
        return out

    return walk(folded_params, _as_dict(calib_stats))


def quantize_model(cfg: ModelConfig, variables,
                   calib_batches: Iterable[np.ndarray],
                   dtype: Any = jnp.bfloat16) -> Tuple[Any, Dict[str, Any]]:
    """One-call PTQ: (model, {'params','batch_stats'}) + calibration images
    -> (int8 model, variables) drop-in for ``infer.predict.Predictor``."""
    folded = fold_conv_bn(variables["params"], variables["batch_stats"])
    stats = calibrate(cfg, folded, calib_batches, dtype=dtype)
    qparams = build_quantized(folded, stats)
    qmodel = create_model(cfg, dtype=dtype, quant="int8")
    return qmodel, {"params": qparams}


# ---------------------------------------------------------------------------
# quantized serving checkpoints: the int8 export is ~4x smaller than the
# fp32 train state (129M params: ~516 MB -> ~130 MB) and loads without
# calibration data — the production cold-start artifact
# ---------------------------------------------------------------------------

def save_quantized(ckpt_dir: str, qvariables) -> None:
    """Persist an int8-quantized param tree (orbax, single step 0)."""
    from improved_body_parts_tpu.utils import checkpoint as ck
    ck.save_train_state(ckpt_dir, {"qparams": _as_dict(qvariables["params"])},
                        step=0, keep=1)


def load_quantized(cfg: ModelConfig, ckpt_dir: str,
                   dtype: Any = jnp.bfloat16) -> Tuple[Any, Dict[str, Any]]:
    """Load a ``save_quantized`` export -> (int8 model, variables)."""
    from improved_body_parts_tpu.utils import checkpoint as ck
    restored = ck.restore_train_state(ckpt_dir)
    qmodel = create_model(cfg, dtype=dtype, quant="int8")
    return qmodel, {"params": restored["qparams"]}


def is_quantized_checkpoint(path: str) -> bool:
    """True if ``path`` is an orbax dir written by ``save_quantized``."""
    import os
    if not os.path.isdir(path):
        return False
    try:
        import orbax.checkpoint as ocp
        path = os.path.abspath(path)
        with ocp.CheckpointManager(path) as mgr:
            step = mgr.latest_step()
        if step is None:
            return False
        ck_ = ocp.PyTreeCheckpointer()
        meta = ck_.metadata(os.path.join(path, str(step), "default"))
        return "qparams" in set(meta.item_metadata.tree.keys())
    except Exception:
        return False
