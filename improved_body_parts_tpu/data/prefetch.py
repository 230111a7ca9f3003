"""Host-side batch prefetching: a thread pool generates (image, mask,
heatmaps) samples ahead of the device step.

The reference keeps the TPU fed with N DataLoader worker processes
(train_distributed.py:213-226, num_workers=2, ~40 samples/s/proc per
README.md:50); here a thread pool + bounded queue plays that role (the
heavy work — cv2 warps, numpy heatmaps — releases the GIL)."""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Tuple

import numpy as np


class PrefetchingLoader:
    """Wraps a dataset with __getitem__ -> (img, mask, heat) into a
    prefetched batch iterator with the same ``batches`` contract."""

    def __init__(self, dataset, num_workers: int = 4, queue_depth: int = 8):
        self.dataset = dataset
        self.num_workers = max(1, num_workers)
        self.queue_depth = queue_depth

    def __len__(self):
        return len(self.dataset)

    def batches(self, batch_size: int, steps: int,
                seed: int = 0) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        rng = np.random.RandomState(seed)
        idx_plan = [rng.randint(0, len(self.dataset), batch_size)
                    for _ in range(steps)]
        sample_q: "queue.Queue" = queue.Queue(self.queue_depth * batch_size)
        work_q: "queue.Queue" = queue.Queue()
        for step, idxs in enumerate(idx_plan):
            for slot, i in enumerate(idxs):
                work_q.put((step, slot, int(i)))

        stop = threading.Event()

        # per-work-item rng seeds so augmenting datasets (CocoH5Dataset)
        # draw FRESH augmentations every epoch, matching the synchronous
        # ``batches`` path; index-deterministic datasets ignore the rng
        seed_rng = np.random.RandomState(seed ^ 0x5F5E100)
        item_seeds = [int(seed_rng.randint(2 ** 31)) for _ in range(steps * batch_size)]

        def fetch(step, slot, i):
            s = item_seeds[step * batch_size + slot]
            try:
                return self.dataset.__getitem__(i, np.random.RandomState(s))
            except TypeError:  # dataset without an rng parameter
                return self.dataset[i]

        def worker():
            while not stop.is_set():
                try:
                    step, slot, i = work_q.get(timeout=0.2)
                except queue.Empty:
                    return
                try:
                    sample_q.put((step, slot, fetch(step, slot, i)))
                except Exception as e:  # surface dataset errors to consumer
                    sample_q.put((step, slot, e))

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        pending = {}
        try:
            for step in range(steps):
                got = 0
                buf = [None] * batch_size
                # drain previously received samples for this step
                ready = pending.pop(step, [])
                for slot, s in ready:
                    buf[slot] = s
                    got += 1
                while got < batch_size:
                    s_step, slot, s = sample_q.get()
                    if isinstance(s, Exception):
                        raise s
                    if s_step == step:
                        buf[slot] = s
                        got += 1
                    else:
                        pending.setdefault(s_step, []).append((slot, s))
                yield (np.stack([b[0] for b in buf]),
                       np.stack([b[1] for b in buf]),
                       np.stack([b[2] for b in buf]))
        finally:
            stop.set()
