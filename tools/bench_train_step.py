#!/usr/bin/env python
"""Measure training step time vs the host->device feed strategy.

Times the REAL flagship train step (Canonical IMHN, bf16, remat) on
whatever backend is live (the one tunneled TPU chip, or the fake CPU mesh)
across a matrix of feed configurations:

  k=1 d=0   blocking assemble_global_batch in the step loop (round-2 path)
  k=1 d=2   double-buffered: batch N+1 device_puts while step N runs
            (reference analogue: non_blocking=True H2D overlap,
            /root/reference/train_distributed.py:256-258)
  k=4 d=2   4 optimizer steps per dispatch (train_lib.make_multi_train_step:
  k=8 d=2   lax.scan inside ONE XLA program) — divides the per-dispatch RPC
            overhead, the dominant cost over the axon tunnel (NOTES round-2)

Host batches are pre-generated and cycled so sample synthesis cost is
excluded; what's measured is dispatch + H2D + compute, synced at the end
via utils/profiling.sync (block_until_ready is a no-op over the tunnel).

CAVEAT (NOTES round-2): chained-dispatch microbenches OVERCOUNT throughput
on the tunnel (~10x seen) because dispatches pipeline while the host runs
ahead; treat these numbers as RELATIVE comparisons between feed
strategies. The honest absolute number is a real `train.py` epoch wall
time with the same flags (--steps-per-dispatch / --stage-depth).

Emits one JSON line per configuration.
"""

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from improved_body_parts_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=8, help="per-device")
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=16,
                    help="timed optimizer steps per configuration")
    ap.add_argument("--configs", default="1:0,1:2,4:2,8:2",
                    help="comma list of k:depth pairs")
    ap.add_argument("--compact", action="store_true",
                    help="compact GT feed: bf16 images + (joints, mask_all) "
                         "over the wire, gaussians rasterized in-graph "
                         "(data/heatmaps_device.py) — ~4x less payload; "
                         "k>1 configs are skipped (payload-bound regime)")
    ap.add_argument("--image-u8", action="store_true",
                    help="with --compact: ship images as uint8 (halves the "
                         "remaining payload; in-graph normalize)")
    ap.add_argument("--tiny-model", action="store_true")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the cpu backend (JAX_PLATFORMS is ignored "
                         "by the axon plugin; see NOTES)")
    args = ap.parse_args()

    import dataclasses

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from improved_body_parts_tpu.configs import ModelConfig, get_config
    from improved_body_parts_tpu import train_lib
    from improved_body_parts_tpu.data.synthetic import SyntheticDataset
    from improved_body_parts_tpu.models.imhn import create_model, init_model
    from improved_body_parts_tpu.parallel import mesh as mesh_lib
    from improved_body_parts_tpu.utils.profiling import sync

    config = get_config("Canonical")
    mesh = mesh_lib.make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    global_batch = args.batch_size * n_dev
    size = args.image_size
    print(f"devices={n_dev} per-device-batch={args.batch_size} "
          f"global={global_batch} size={size}", file=sys.stderr)

    mcfg = (ModelConfig(nstack=2, inp_dim=64, increase=32)
            if args.tiny_model else config.model)
    if not args.no_remat:
        mcfg = dataclasses.replace(mcfg, remat=True)
    model = create_model(mcfg, dtype=jnp.bfloat16)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), size, size)
    state0 = train_lib.create_train_state(params, batch_stats, config.train)
    # the step donates its state argument; keep a host copy so every
    # configuration starts from fresh (un-donated) device buffers
    host_state = jax.tree_util.tree_map(np.asarray, state0)

    # a small pool of REAL pre-built host batches, cycled (sample synthesis
    # excluded from the measurement; H2D + dispatch + compute included)
    ds = SyntheticDataset(config, length=64, image_size=size)
    pool = list(ds.batches(global_batch, 4, seed=0, compact=args.compact,
                           image_u8=args.image_u8))
    nbytes = sum(a.nbytes for a in jax.tree_util.tree_leaves(pool[0]))
    print(f"payload/step: {nbytes / 1e6:.1f} MB", file=sys.stderr)

    def cycled(n):
        return itertools.islice(itertools.cycle(pool), n)

    results = []
    for spec in args.configs.split(","):
        k, depth = (int(x) for x in spec.split(":"))
        if args.compact and k > 1:
            continue
        steps = (args.steps + k - 1) // k * k  # avoid short-tail recompiles
        make = (train_lib.make_multi_train_step if k > 1
                else train_lib.make_train_step)
        step_fn = make(model, config, use_focal=True, compact_gt=args.compact)
        state = jax.tree_util.tree_map(jnp.asarray, host_state)

        def run(n_steps, st):
            if k > 1:
                for n, chunk in mesh_lib.staged_chunks(
                        mesh, cycled(n_steps), k=k, depth=max(depth, 1)):
                    lrs = jnp.full((n,), 1e-4, jnp.float32)
                    st, metrics = step_fn(st, chunk[0], chunk[1], chunk[2], lrs)
            elif depth > 0:
                for batch in mesh_lib.staged_batches(mesh, cycled(n_steps),
                                                     depth=depth):
                    st, metrics = step_fn(st, batch[0], batch[1], batch[2],
                                          jnp.float32(1e-4))
            else:
                for host in cycled(n_steps):
                    batch = mesh_lib.assemble_global_batch(mesh, host)
                    st, metrics = step_fn(st, batch[0], batch[1], batch[2],
                                          jnp.float32(1e-4))
            sync(metrics)
            return st

        t0 = time.time()
        state = run(k, state)           # warmup: compile + first dispatch
        compile_s = time.time() - t0

        t0 = time.time()
        state = run(steps, state)
        wall = time.time() - t0

        rec = {"k": k, "depth": depth, "steps": steps,
               "wall_s": round(wall, 3),
               "s_per_step": round(wall / steps, 4),
               "samples_per_s": round(steps * global_batch / wall, 2),
               "compile_s": round(compile_s, 1)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    base = next((r for r in results if r["k"] == 1 and r["depth"] == 0),
                results[0])
    best = min(results, key=lambda r: r["s_per_step"])
    print(json.dumps({"summary": f"best k={best['k']} d={best['depth']}",
                      "speedup_vs_blocking":
                          round(base["s_per_step"] / best["s_per_step"], 2)}),
          flush=True)


if __name__ == "__main__":
    main()
