#!/usr/bin/env python
"""Network-only throughput benchmark (successor of the reference
test_inference_speed.py, which recorded 38.5 FPS for batch-4 512x512 on a
2080 Ti, test_inference_speed.py:117-120).

Measures the jitted IMHN forward (no flip TTA, no post-processing) with
inputs resident on device, reporting frames/s. Because the tunneled
backend's block_until_ready is a no-op, timing chains N dispatches and
synchronizes once via a scalar fetch.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from improved_body_parts_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--config", default="Canonical")
    ap.add_argument("--quantize", default="", choices=["", "int8"],
                    help="int8 PTQ forward (models/quantize.py)")
    ap.add_argument("--mfu", action="store_true",
                    help="also report compiler-counted FLOPs/frame and "
                         "model FLOPs utilization vs the v5e peak")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from improved_body_parts_tpu.configs import get_config
    from improved_body_parts_tpu.models.imhn import create_model, init_model
    from improved_body_parts_tpu.utils.profiling import sync

    config = get_config(args.config)
    model = create_model(config.model, dtype=jnp.bfloat16)
    params, bs = init_model(model, jax.random.PRNGKey(0),
                            args.image_size, args.image_size)
    variables = {"params": params, "batch_stats": bs}
    if args.quantize:
        from improved_body_parts_tpu.models import quantize as qz
        calib = [np.random.RandomState(1).rand(
            2, args.image_size, args.image_size, 3).astype(np.float32)]
        model, variables = qz.quantize_model(config.model, variables, calib,
                                             dtype=jnp.bfloat16)
        print("int8 PTQ applied")

    @jax.jit
    def fwd(variables, imgs):
        return model.apply(variables, imgs, train=False)[-1][0]

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(args.batch_size, args.image_size,
                                args.image_size, 3).astype(np.float32))
    out = fwd(variables, imgs)
    sync(out)  # compile + warm

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fwd(variables, imgs)
    sync(out)
    dt = time.perf_counter() - t0
    fps = args.batch_size * args.iters / dt
    print(f"network-only: {fps:.1f} FPS (batch {args.batch_size}, "
          f"{args.image_size}x{args.image_size}, {dt/args.iters*1e3:.1f} ms/step, "
          f"platform {jax.devices()[0].platform})")

    if args.mfu:
        from improved_body_parts_tpu.utils.profiling import flops_of
        flops = flops_of(fwd, variables, imgs)
        if flops:
            # v5e peaks: 197 TFLOP/s bf16, 394 TOP/s int8 (the int8 path
            # still runs its dequant/SE tail in bf16, so report vs both)
            eff = flops * args.iters / dt
            print(f"forward: {flops / args.batch_size / 1e9:.1f} GFLOP/frame, "
                  f"{eff / 1e12:.1f} TFLOP/s effective, "
                  f"MFU {eff / 197e12 * 100:.1f}% of bf16 peak"
                  + (f" / {eff / 394e12 * 100:.1f}% of int8 peak"
                     if args.quantize else ""))


if __name__ == "__main__":
    main()
