"""Parity tests: the C++ grouping fast path must reproduce the numpy
implementation exactly — the reference validated its C++ pafprocess against
the Python twin the same way (README.md:27-38 pickle-diff changelog)."""

import numpy as np
import pytest

from improved_body_parts_tpu.configs import InferenceConfig, LIMBS_CONN, NUM_PARTS
from improved_body_parts_tpu.ops import group

group_cpp = pytest.importorskip("improved_body_parts_tpu.ops.group_cpp")

if not group_cpp.is_available():
    pytest.skip("C++ grouping lib unavailable (no compiler)", allow_module_level=True)


def random_scene(rng, n_types_with_conns=12, max_conns=5, P=16):
    """Random but structurally valid connection tables + candidates."""
    cands = np.zeros((NUM_PARTS * P, 4), np.float64)
    cands[:, 0] = rng.uniform(0, 400, len(cands))
    cands[:, 1] = rng.uniform(0, 300, len(cands))
    cands[:, 2] = rng.uniform(0.1, 1.0, len(cands))
    cands[:, 3] = np.arange(len(cands))
    connected = []
    for li, (fr, to) in enumerate(LIMBS_CONN):
        k = rng.randint(0, max_conns + 1) if li < n_types_with_conns else 0
        rows = np.zeros((k, 6), np.float64)
        if k:
            src = rng.choice(P, size=k, replace=False)
            dst = rng.choice(P, size=k, replace=False)
            rows[:, 0] = fr * P + src
            rows[:, 1] = to * P + dst
            rows[:, 2] = rng.uniform(0.0, 1.2, k)
            rows[:, 3] = src
            rows[:, 4] = dst
            rows[:, 5] = rng.uniform(5, 200, k)
        connected.append(rows)
    return connected, cands


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("remove_recon", [False, True])
def test_cpp_matches_numpy(seed, remove_recon):
    rng = np.random.RandomState(seed)
    connected, cands = random_scene(rng)
    cfg = InferenceConfig(remove_recon=remove_recon)

    t_np, _ = group.find_humans(connected, cands.copy(), cfg)
    t_cpp, _ = group_cpp.find_humans(connected, cands.copy(), cfg)

    assert t_np.shape == t_cpp.shape, (t_np.shape, t_cpp.shape)
    np.testing.assert_allclose(t_cpp, t_np, rtol=1e-12, atol=1e-12)


def test_cpp_empty_input():
    cfg = InferenceConfig()
    connected = [np.zeros((0, 6))] * len(LIMBS_CONN)
    cands = np.zeros((0, 4))
    table, _ = group_cpp.find_humans(connected, cands, cfg)
    assert table.shape == (0, NUM_PARTS + 2, 2)
