"""Device-mesh utilities: the TPU-native replacement for the reference's
process-level distributed scaffolding.

The reference builds data parallelism out of NCCL process groups, apex DDP
with delayed all-reduce, SyncBN module conversion and hand-written metric
all-reduces (train_distributed.py:77-145, 442-452). On TPU none of that is
hand-written: we lay out a ``jax.sharding.Mesh`` over the chips, shard the
batch on the ``data`` axis (optionally the image height on a ``spatial``
axis for giant inputs — SURVEY.md §5), and jit the train step once — XLA
inserts the gradient all-reduce over ICI and computes BatchNorm statistics
over the *global* batch automatically (strictly stronger than SyncBN).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(n_devices: Optional[int] = None,
              spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a (data, spatial) mesh. spatial=1 gives pure data parallelism."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    assert n_devices % spatial == 0, (n_devices, spatial)
    grid = devices.reshape(n_devices // spatial, spatial)
    return Mesh(grid, axis_names=(DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, shard_spatial: bool = False) -> NamedSharding:
    """Batch pytree leaves: shard dim 0 on data (and optionally dim 1 on
    spatial). The un-spatial spec names ONLY dim 0 so rank-1 leaves (e.g.
    the resident feed's index vector) shard too."""
    spec = P(DATA_AXIS, SPATIAL_AXIS) if shard_spatial else P(DATA_AXIS)
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def chunked_batch_sharding(mesh: Mesh,
                           shard_spatial: bool = False) -> NamedSharding:
    """(K, B, H, W, C) stacked-chunk batch: the scan axis K is unsharded,
    B shards on data (and optionally H on spatial)."""
    spec = (P(None, DATA_AXIS, SPATIAL_AXIS) if shard_spatial
            else P(None, DATA_AXIS))
    return NamedSharding(mesh, spec)


def shard_batch(mesh: Mesh, batch, shard_spatial: bool = False):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    sh = batch_sharding(mesh, shard_spatial)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Multi-host (multi-process) setup — the SPMD replacement for the
    reference's ``torch.distributed.init_process_group('nccl', 'env://')``
    under torch.distributed.launch (train_distributed.py:77-83). After this,
    jax.devices() spans all hosts and the same jitted step runs globally."""
    kwargs = {}
    if coordinator_address:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def assemble_global_batch(mesh: Mesh, batch, shard_spatial: bool = False):
    """Build globally-sharded arrays from PROCESS-LOCAL batch slices.

    Each process passes only its own rows (its ``process_batch_slice`` of
    the global batch); ``jax.make_array_from_process_local_data`` stitches
    them into one global jax.Array per leaf — the TPU-native replacement
    for the reference's DistributedSampler + per-rank DataLoader
    (train_distributed.py:209-226). With a single process this reduces to
    ``shard_batch``.
    """
    sh = batch_sharding(mesh, shard_spatial)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)


def staged_batches(mesh: Mesh, batches, depth: int = 2,
                   shard_spatial: bool = False):
    """Overlap host->device staging with device compute: a worker thread
    runs ``assemble_global_batch`` (device_put) for batch N+1..N+depth
    while step N executes, instead of blocking the step loop on the
    transfer (the reference overlaps H2D with ``non_blocking=True`` copies,
    train_distributed.py:256-258). Yields globally-sharded batches in
    order; exceptions from the source iterator propagate to the consumer."""
    import queue
    import threading

    out: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    SENTINEL = object()

    def run():
        try:
            for host_batch in batches:
                out.put(assemble_global_batch(mesh, host_batch,
                                              shard_spatial))
        except BaseException as e:   # noqa: BLE001 - re-raised consumer-side
            out.put(e)
            return
        out.put(SENTINEL)

    threading.Thread(target=run, daemon=True).start()
    while True:
        item = out.get()
        if item is SENTINEL:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def assemble_chunk(mesh: Mesh, host_batches, shard_spatial: bool = False):
    """Stack K PROCESS-LOCAL host batches into one (K, B, ...) device chunk
    for the multi-step dispatch (train_lib.make_multi_train_step): the scan
    axis stays unsharded, the batch axis shards on data as usual."""
    sh = chunked_batch_sharding(mesh, shard_spatial)
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *host_batches)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, x), stacked)


def staged_chunks(mesh: Mesh, batches, k: int, depth: int = 2,
                  shard_spatial: bool = False):
    """``staged_batches`` for the multi-step dispatch: groups the host batch
    stream into chunks of ``k``, stages each chunk (stack + device_put) on a
    worker thread while the previous multi-step dispatch runs, and yields
    ``(n_steps, chunk)`` — a short final chunk keeps its true length so the
    epoch step count is exact."""
    import queue
    import threading

    out: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    SENTINEL = object()

    def run():
        try:
            group = []
            for host_batch in batches:
                group.append(host_batch)
                if len(group) == k:
                    out.put((k, assemble_chunk(mesh, group, shard_spatial)))
                    group = []
            if group:
                out.put((len(group),
                         assemble_chunk(mesh, group, shard_spatial)))
        except BaseException as e:  # noqa: BLE001 - re-raised consumer-side
            out.put(e)
            return
        out.put(SENTINEL)

    threading.Thread(target=run, daemon=True).start()
    while True:
        item = out.get()
        if item is SENTINEL:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def process_batch_slice(global_batch: int) -> slice:
    """This process's slice of a globally-indexed batch — replaces the
    reference's ``DistributedSampler`` (train_distributed.py:209-211): each
    host loads only its shard and jax assembles the global array."""
    n = jax.process_count()
    per = global_batch // n
    assert per * n == global_batch, (global_batch, n)
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
