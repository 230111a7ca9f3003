"""Child process for the 2-process multihost test (tests/test_multihost.py).

Each process owns 4 fake CPU devices, joins a jax.distributed cluster,
loads ITS slice of the deterministic synthetic batches, assembles global
arrays and runs two SPMD train steps — the faithful simulation of the
reference's torch.distributed.launch workers (train_distributed.py:68-83)
on the TPU-native stack.

Usage: python tests/_multihost_child.py <coordinator> <world> <rank> <out>
"""

import json
import os
import sys

coordinator, world, rank, out_path = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()
os.environ.pop("JAX_PLATFORMS", None)

import time  # noqa: E402

import jax  # noqa: E402

t0 = time.time()


def trace(msg):
    print(f"[rank {rank} +{time.time() - t0:.1f}s] {msg}", flush=True)


jax.config.update("jax_platforms", "cpu")

# both ranks (and every rerun of this test) compile the SAME tiny programs;
# the persistent cache turns the 2-process-contended compiles on this 1-core
# box (~2 min each, cold) into sub-second reloads on every later run
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from improved_body_parts_tpu.utils.compile_cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()

jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=world, process_id=rank)
assert jax.process_count() == world
assert jax.device_count() == 4 * world, jax.devices()
trace("distributed initialized")

# jax.distributed installs a SIGTERM preemption handler that swallows the
# parent test's / `timeout`'s termination signal, leaving an immortal
# CPU-burning child on failure; restore the default so cleanup works
import signal  # noqa: E402

signal.signal(signal.SIGTERM, signal.SIG_DFL)

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from improved_body_parts_tpu import train_lib  # noqa: E402
from improved_body_parts_tpu.configs import (  # noqa: E402
    CanonicalConfig, ModelConfig, TrainConfig,
)
from improved_body_parts_tpu.data.synthetic import SyntheticDataset  # noqa: E402
from improved_body_parts_tpu.models.imhn import create_model, init_model  # noqa: E402
from improved_body_parts_tpu.parallel import mesh as mesh_lib  # noqa: E402

trace("imports done")

config = CanonicalConfig(width=64, height=64,
                         model=ModelConfig(nstack=1, inp_dim=16, increase=8),
                         train=dataclasses.replace(TrainConfig()))
model = create_model(config.model, dtype=jnp.float32)
params, batch_stats = init_model(model, jax.random.PRNGKey(0), 64, 64)
trace("model initialized")
state = train_lib.create_train_state(params, batch_stats, config.train)
mesh = mesh_lib.make_mesh()
step_fn = train_lib.make_train_step(model, config, donate=False)

ds = SyntheticDataset(config, length=64, image_size=64)
host_batches = list(ds.batches(8, 2, seed=0, rank=rank, world=world))
batches = []
for imgs, masks, heats in host_batches:
    assert imgs.shape[0] == 8 // world, imgs.shape  # noqa: S101
    batches.append(mesh_lib.assemble_global_batch(mesh, (imgs, masks, heats)))

# AOT-compile the step (rank-local work, no comm), THEN rendezvous at a
# coordination-service barrier before the first collective executes: the
# gloo context init inside step 1 has a hard 30 s KV-store timeout, and the
# persistent compile cache can make one rank reach it minutes before the
# other (contended 1-core compiles vs instant cache reloads)
compiled_step = step_fn.lower(state, batches[0][0], batches[0][1],
                              batches[0][2], jnp.float32(1e-2)).compile()
trace("step compiled")
from jax._src import distributed  # noqa: E402

distributed.global_state.client.wait_at_barrier(
    "ibp_step_ready", timeout_in_ms=900_000)
trace("barrier passed")

losses = []
for batch in batches:
    state, metrics = compiled_step(state, batch[0], batch[1], batch[2],
                                   jnp.float32(1e-2))
    losses.append(float(metrics["loss"]))
    trace(f"step done loss={losses[-1]}")

# host-side numpy (per-leaf jnp.sum would trigger one tiny XLA compile per
# leaf — ~30s on this box); params are replicated so device_get is local
param_sum = float(sum(np.abs(np.asarray(jax.device_get(x))).sum()
                      for x in jax.tree_util.tree_leaves(state.params)))
with open(out_path, "w") as f:
    json.dump({"rank": rank, "losses": losses, "param_sum": param_sum}, f)
print("child", rank, "ok", losses)
