"""Profiling / tracing / FLOPs utilities.

The reference's observability is wall-clock deltas around
``torch.cuda.synchronize()`` (train_distributed.py:299), ``AverageMeter``
running averages (evaluate.py:286-302) and thop FLOPs counts in __main__
blocks (models/posenet.py:217). TPU-native equivalents:

  * ``trace(logdir)``: jax.profiler trace context (view in TensorBoard /
    xprof) — replaces nvprof-style tracing;
  * ``flops_of(fn, *args)``: compiler-reported FLOPs via
    ``jit(fn).lower(...).compile().cost_analysis()`` — replaces thop;
  * ``Timer``/``AverageMeter``: device-synchronized wall-clock meters.

NOTE (this environment): the axon-tunnel backend's ``block_until_ready`` is
a no-op, so ``Timer`` forces a tiny device->host fetch to synchronize.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


class AverageMeter:
    """Running average (reference evaluate.py:286-302)."""

    def __init__(self):
        self.val = self.sum = self.count = self.avg = 0.0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def sync(tree: Any) -> None:
    """Synchronize with device completion of ``tree``.

    block_until_ready is unreliable over tunneled backends, so fetch one
    scalar from the first array leaf instead."""
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype")]
    if leaves:
        np.asarray(jax.device_get(leaves[0].ravel()[:1]))


@contextlib.contextmanager
def timer(meter: Optional[AverageMeter] = None):
    """Wall-clock a block; caller is responsible for sync() inside."""
    t0 = time.perf_counter()
    holder = {}
    yield holder
    holder["elapsed"] = time.perf_counter() - t0
    if meter is not None:
        meter.update(holder["elapsed"])


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (open logdir with TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_of(fn: Callable, *args, **kwargs) -> Optional[float]:
    """Compiler-reported FLOPs for one invocation (thop replacement)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0] if analysis else None
    if not analysis:
        return None
    return float(analysis.get("flops", float("nan")))


def model_stats(model, variables, height: int = 512, width: int = 512,
                batch: int = 1) -> dict:
    """Params + FLOPs summary for a PoseNet (reference posenet.py:205-222)."""
    from improved_body_parts_tpu.models.imhn import param_count
    imgs = jnp.zeros((batch, height, width, 3), jnp.float32)
    flops = flops_of(
        lambda v, x: model.apply(v, x, train=False)[-1][0], variables, imgs)
    return dict(params=param_count(variables["params"]),
                flops=flops, input=(batch, height, width, 3))
