"""Pallas kernel parity: interpret-mode NMS must equal the XLA reference
implementation bit-for-bit on random and structured inputs."""

import jax.numpy as jnp
import numpy as np
import pytest

from improved_body_parts_tpu.ops.pallas_kernels import nms_pallas
from improved_body_parts_tpu.ops.peaks import heatmap_nms


@pytest.mark.parametrize("seed", range(3))
def test_nms_pallas_matches_xla_random(seed):
    rng = np.random.RandomState(seed)
    heat = rng.rand(6, 32, 32).astype(np.float32) * 0.5
    want = np.asarray(heatmap_nms(jnp.asarray(heat), 0.1))
    got = np.asarray(nms_pallas(jnp.asarray(heat), 0.1, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_nms_pallas_structured():
    heat = np.zeros((1, 16, 16), np.float32)
    heat[0, 4, 4] = 0.9
    heat[0, 4, 5] = 0.5    # suppressed neighbour
    heat[0, 0, 0] = 0.3    # border peak survives (reflect == -inf outside)
    heat[0, 10, 10] = 0.05  # below threshold
    got = np.asarray(nms_pallas(jnp.asarray(heat), 0.1, interpret=True))[0]
    assert got[4, 4] == pytest.approx(0.9)
    assert got[4, 5] == 0.0
    assert got[0, 0] == pytest.approx(0.3)
    assert got[10, 10] == 0.0


def test_nms_pallas_plateau_keeps_both():
    heat = np.zeros((1, 8, 8), np.float32)
    heat[0, 3, 3] = heat[0, 3, 4] = 0.7  # equal adjacent maxima
    got = np.asarray(nms_pallas(jnp.asarray(heat), 0.1, interpret=True))[0]
    want = np.asarray(heatmap_nms(jnp.asarray(heat), 0.1))[0]
    np.testing.assert_array_equal(got, want)
    assert got[3, 3] == pytest.approx(0.7) and got[3, 4] == pytest.approx(0.7)


@pytest.mark.parametrize("seed", range(3))
def test_fused_peaks_matches_unfused_find_peaks(seed):
    """The fused Pallas kernel path (NMS + top-k + patch extraction in one
    VMEM pass) must produce the SAME PeakTable as the XLA nms/top_k/gather
    path — coordinates, scores, validity, n_raw and slot order."""
    from improved_body_parts_tpu.ops.peaks import find_peaks
    rng = np.random.RandomState(seed)
    heat = (rng.rand(24, 20, 6).astype(np.float32) * 0.6)
    # sprinkle strong isolated peaks incl. at borders
    for (y, x, c) in [(0, 0, 0), (23, 19, 1), (5, 7, 2), (12, 3, 2),
                      (1, 18, 4)]:
        heat[y, x, c] = 0.9 + 0.01 * c
    a = find_peaks(jnp.asarray(heat), thre=0.1, max_peaks=8, stride=4,
                   fused=False)
    b = find_peaks(jnp.asarray(heat), thre=0.1, max_peaks=8, stride=4,
                   fused=True)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_array_equal(np.asarray(a.n_raw), np.asarray(b.n_raw))
    v = np.asarray(a.valid)
    np.testing.assert_array_equal(np.asarray(a.grid_yx)[v],
                                  np.asarray(b.grid_yx)[v])
    np.testing.assert_allclose(np.asarray(a.score)[v], np.asarray(b.score)[v],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.xy)[v], np.asarray(b.xy)[v],
                               rtol=1e-5, atol=1e-4)
