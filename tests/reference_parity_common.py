"""Shared deterministic generators used both by tests/make_reference_goldens.py
(running the ACTUAL reference code) and tests/test_reference_parity.py
(running our pipeline): synthetic scenes, canonical person signatures, and
the numpy-seeded reference-model weight recipe."""

import numpy as np

# the reference INI defaults (utils/config:1-40 via config_reader)
POSTPROC_TEST_CFG = dict(thre2=0.1, connect_ration=0.8, mid_num=20,
                         len_rate=16, connection_tole=0.7, remove_recon=0)

SCENE_H, SCENE_W = 32, 40
NUM_PARTS_ = 18
PAF_LAYERS_ = 30


def _blob_maps(rng, H, W, K, n_blobs):
    heat = np.zeros((H, W, K), np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    for k in range(K):
        for _ in range(n_blobs):
            cx, cy = rng.uniform(0, W - 1), rng.uniform(0, H - 1)
            s = rng.uniform(1.5, 3.5)
            a = rng.uniform(0.3, 1.0)
            heat[:, :, k] = np.maximum(
                heat[:, :, k],
                a * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)))
    return heat


def blob_scene(scene_idx: int):
    """Deterministic synthetic stride-map scene: random gaussian blobs as
    keypoint heatmaps + broad positive bands as limb maps. Exercises the
    whole peaks/connections/grouping chain including border peaks and
    saturated candidates. Returns (heat (H,W,18), paf (H,W,30), img_h)."""
    rng = np.random.RandomState(1000 + scene_idx)
    heat = _blob_maps(rng, SCENE_H, SCENE_W, NUM_PARTS_, rng.randint(1, 5))
    paf = _blob_maps(rng, SCENE_H, SCENE_W, PAF_LAYERS_, rng.randint(2, 6))
    return heat, paf, float(SCENE_H * 4)


def person_signatures(table, cands, nparts: int = 18):
    """Canonical, peak-id-free signature of a person table: per person the
    sorted (joint, x, y, connection_score) tuples plus (score_sum, count).
    Comparable across the reference's global peak ids and our (type, slot)
    ids."""
    sigs = []
    for p in np.asarray(table):
        joints = []
        for j in range(nparts):
            pid = int(p[j, 0])
            if pid >= 0:
                joints.append([j, round(float(cands[pid, 0]), 3),
                               round(float(cands[pid, 1]), 3),
                               round(float(p[j, 1]), 4)])
        sigs.append([joints, round(float(p[-2, 0]), 3), int(p[-1, 0])])
    sigs.sort(key=lambda s: (s[1], s[2], s[0]))
    return sigs


def seeded_state_dict_arrays(keys, shapes):
    """Deterministic weight arrays for a torch state_dict: RandomState(0)
    consumed over SORTED keys (num_batches_tracked int64 buffers skipped),
    BN running_var and 1-D '.weight' (BN scale) made positive. The golden
    generator writes these into the REAL reference PoseNet; the test feeds
    the same arrays through our converter — equality of the forwards proves
    the converter against the real module structure."""
    rng = np.random.RandomState(0)
    out = {}
    for k in keys:
        if k.endswith("num_batches_tracked"):
            continue
        arr = rng.randn(*shapes[k]).astype(np.float32) * 0.05
        if k.endswith("running_var"):
            arr = np.abs(arr) + 0.5
        if k.endswith(".weight") and len(shapes[k]) == 1:
            arr = np.abs(arr) + 0.5
        out[k] = arr
    return out
