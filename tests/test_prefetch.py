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


def test_prefetch_rank_world_partitions_globally():
    """Per-rank prefetched batches concatenate to the world=1 batches —
    the DistributedSampler contract every dataset shares
    (train_distributed.py:209-211)."""
    ds = _FakeDataset()
    for workers in (1, 3):
        full = list(PrefetchingLoader(ds, num_workers=workers)
                    .batches(6, 3, seed=11))
        r0 = list(PrefetchingLoader(ds, num_workers=workers)
                  .batches(6, 3, seed=11, rank=0, world=3))
        r1 = list(PrefetchingLoader(ds, num_workers=workers)
                  .batches(6, 3, seed=11, rank=1, world=3))
        r2 = list(PrefetchingLoader(ds, num_workers=workers)
                  .batches(6, 3, seed=11, rank=2, world=3))
        for s in range(3):
            assert r0[s][0].shape[0] == 2
            np.testing.assert_array_equal(
                np.concatenate([r0[s][0], r1[s][0], r2[s][0]]), full[s][0])


class _RngDataset(_FakeDataset):
    """Augmenting dataset: the sample value depends on the per-item rng."""

    def __getitem__(self, i, rng=None):
        val = i if rng is None else i + rng.randint(1000) * 1000
        img = np.full((8, 8, 3), val, np.float32)
        return img, np.zeros((2, 2, 1), np.float32), np.zeros((2, 2, 50), np.float32)


def test_prefetch_rank_world_same_augmentations():
    """Per-item augmentation seeds are drawn from the GLOBAL plan, so a
    sample gets the same augmentation no matter which rank loads it."""
    ds = _RngDataset()
    full = list(PrefetchingLoader(ds, num_workers=2).batches(4, 2, seed=3))
    parts = [list(PrefetchingLoader(ds, num_workers=2)
                  .batches(4, 2, seed=3, rank=r, world=2)) for r in range(2)]
    for s in range(2):
        np.testing.assert_array_equal(
            np.concatenate([parts[0][s][0], parts[1][s][0]]), full[s][0])


def test_prefetch_shapes():
    loader = PrefetchingLoader(_FakeDataset(), num_workers=2)
    batches = list(loader.batches(3, 2, seed=0))
    assert len(batches) == 2
    imgs, mask, heat = batches[0]
    assert imgs.shape == (3, 8, 8, 3)
    assert mask.shape == (3, 2, 2, 1)
    assert heat.shape == (3, 2, 2, 50)
