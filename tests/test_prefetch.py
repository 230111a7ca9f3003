"""Prefetching loader: must yield exactly the synchronous batches' shapes
and deterministic index plan, across worker counts."""

import numpy as np

from improved_body_parts_tpu.data.prefetch import PrefetchingLoader


class _FakeDataset:
    def __len__(self):
        return 32

    def __getitem__(self, i):
        img = np.full((8, 8, 3), i, np.float32)
        mask = np.full((2, 2, 1), i, np.float32)
        heat = np.full((2, 2, 50), i, np.float32)
        return img, mask, heat


def _batch_ids(batches):
    return [tuple(int(b[0][k, 0, 0, 0]) for k in range(b[0].shape[0]))
            for b in batches]


def test_prefetch_matches_plan_and_is_deterministic():
    ds = _FakeDataset()
    sync_rng = np.random.RandomState(7)
    plan = [tuple(sync_rng.randint(0, 32, 4)) for _ in range(5)]

    for workers in (1, 4):
        loader = PrefetchingLoader(ds, num_workers=workers)
        got = _batch_ids(list(loader.batches(4, 5, seed=7)))
        assert got == plan, (workers, got, plan)


def test_prefetch_shapes():
    loader = PrefetchingLoader(_FakeDataset(), num_workers=2)
    batches = list(loader.batches(3, 2, seed=0))
    assert len(batches) == 2
    imgs, mask, heat = batches[0]
    assert imgs.shape == (3, 8, 8, 3)
    assert mask.shape == (3, 2, 2, 1)
    assert heat.shape == (3, 2, 2, 50)
