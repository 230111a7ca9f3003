"""Post-processing parity tests: device peak finding / limb scoring / greedy
selection vs straightforward numpy oracles, and end-to-end grouping on a
synthetic two-person scene (the reference's pickle-diff methodology,
demo_image.py:64-76, recast as unit tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from improved_body_parts_tpu.configs import (
    HEAT_START, LIMBS_CONN, NUM_LAYERS, NUM_PARTS, PAF_LAYERS, InferenceConfig,
)
from improved_body_parts_tpu.ops import group
from improved_body_parts_tpu.ops.limbs import (
    bilinear_sample, connections_to_numpy, score_connections, select_connections,
)
from improved_body_parts_tpu.ops.peaks import PeakTable, find_peaks, heatmap_nms


# ---------------------------------------------------------------------------
# synthetic scene helpers
# ---------------------------------------------------------------------------

def gaussian_blob(shape, cx, cy, sigma=2.0):
    yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float32)
    return np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sigma ** 2))


def limb_band(shape, x1, y1, x2, y2, sigma=1.75):
    """Perpendicular-distance gaussian to the segment (stride-map coords)."""
    yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float32)
    dx, dy = x2 - x1, y2 - y1
    norm = np.sqrt(dx * dx + dy * dy) + 1e-6
    # distance to the infinite line
    dist = np.abs(dx * (y1 - yy) - (x1 - xx) * dy) / norm
    # restrict to the segment neighborhood
    t = ((xx - x1) * dx + (yy - y1) * dy) / (norm * norm)
    mask = (t > -0.2) & (t < 1.2)
    return np.exp(-dist ** 2 / (2 * sigma ** 2)) * mask


def make_two_person_scene(H=64, W=64, stride=4):
    """Two synthetic people, each with a subset of joints, on stride maps.

    Returns (paf (H,W,30), heat (H,W,20), gt: dict joint->list of (x,y) image coords).
    """
    heat = np.zeros((H, W, NUM_PARTS + 2), np.float32)
    paf = np.zeros((H, W, PAF_LAYERS), np.float32)
    # joints used: nose(0), neck(1), Rsho(2), Lsho(5), Rhip(8), Lhip(11)
    people = [
        {0: (20, 10), 1: (20, 16), 2: (14, 17), 5: (26, 17), 8: (16, 30), 11: (24, 30)},
        {0: (44, 12), 1: (44, 18), 2: (38, 19), 5: (50, 19), 8: (40, 32), 11: (48, 32)},
    ]
    for person in people:
        for j, (gx, gy) in person.items():
            heat[:, :, j] = np.maximum(heat[:, :, j], gaussian_blob((H, W), gx, gy))
    for li, (fr, to) in enumerate(LIMBS_CONN):
        for person in people:
            if int(fr) in person and int(to) in person:
                x1, y1 = person[int(fr)]
                x2, y2 = person[int(to)]
                paf[:, :, li] = np.maximum(paf[:, :, li],
                                           limb_band((H, W), x1, y1, x2, y2))
    # gt in image coords (stride-map cell -> image pixel via half-pixel)
    gt = [{j: ((x + 0.5) * stride - 0.5, (y + 0.5) * stride - 0.5)
           for j, (x, y) in p.items()} for p in people]
    return paf, heat, gt


# ---------------------------------------------------------------------------
# peaks
# ---------------------------------------------------------------------------

def test_heatmap_nms_keeps_only_local_maxima():
    m = np.zeros((16, 16), np.float32)
    m[4, 4] = 0.9
    m[4, 5] = 0.5   # neighbour of a higher peak -> suppressed
    m[10, 12] = 0.3
    m[0, 0] = 0.05  # below threshold
    out = np.asarray(heatmap_nms(jnp.asarray(m), 0.1))
    assert out[4, 4] == pytest.approx(0.9)
    assert out[4, 5] == 0.0
    assert out[10, 12] == pytest.approx(0.3)
    assert out[0, 0] == 0.0


@pytest.mark.parametrize("refine", ["bicubic", "centroid", "none"])
def test_find_peaks_locates_gaussians(refine):
    H = W = 32
    heat = np.zeros((H, W, NUM_PARTS), np.float32)
    truth = {0: (10.3, 12.7), 5: (20.6, 8.2)}
    for j, (gx, gy) in truth.items():
        heat[:, :, j] = gaussian_blob((H, W), gx, gy, sigma=1.5)
    peaks = find_peaks(jnp.asarray(heat), thre=0.1, max_peaks=8, stride=4,
                       refine=refine)
    valid = np.asarray(peaks.valid)
    xy = np.asarray(peaks.xy)
    for j, (gx, gy) in truth.items():
        assert valid[j].sum() == 1
        x, y = xy[j, 0]
        # expected image coords of the sub-pixel gaussian center
        ex, ey = (gx + 0.5) * 4 - 0.5, (gy + 0.5) * 4 - 0.5
        assert abs(x - ex) < 4.0 and abs(y - ey) < 4.0, (j, (x, y), (ex, ey))
    # channels without blobs have no valid peaks
    assert valid[1].sum() == 0


def test_find_peaks_rejects_unknown_refine():
    heat = jnp.zeros((8, 8, NUM_PARTS), jnp.float32)
    with pytest.raises(ValueError, match="unknown refine"):
        find_peaks(heat, thre=0.1, max_peaks=4, stride=4, refine="cubic")


def test_find_peaks_none_returns_cell_coords():
    """refine='none' must be the RAW NMS cell (top-left pixel) with the raw
    cell score — previously any non-bicubic scheme silently fell through to
    centroid, making --refine none an alias of --refine centroid."""
    H = W = 32
    heat = np.zeros((H, W, NUM_PARTS), np.float32)
    heat[:, :, 2] = gaussian_blob((H, W), 10.3, 12.7, sigma=1.5)
    pk = find_peaks(jnp.asarray(heat), thre=0.1, max_peaks=8, stride=4,
                    refine="none")
    xy = np.asarray(pk.xy)[2, 0]
    cy, cx = np.asarray(pk.grid_yx)[2, 0]
    assert xy[0] == cx * 4 and xy[1] == cy * 4
    assert np.asarray(pk.score)[2, 0] == pytest.approx(heat[cy, cx, 2])


def test_find_peaks_reports_topk_saturation():
    """When a channel has more NMS peaks than table slots, the extras are
    dropped by top-k; n_raw records the pre-cut count so callers can detect
    saturation (the reference's pafprocess caps silently, pafprocess.h:6-17)."""
    H = W = 32
    heat = np.zeros((H, W, NUM_PARTS), np.float32)
    # 25 isolated peaks on a grid in channel 3, 2 in channel 7
    cells = [(y, x) for y in range(2, 32, 6) for x in range(2, 32, 6)][:25]
    for i, (py, px) in enumerate(cells):
        heat[py, px, 3] = 0.5 + 0.01 * i
    heat[5, 5, 7] = 0.9
    heat[20, 20, 7] = 0.8
    peaks = find_peaks(jnp.asarray(heat), thre=0.1, max_peaks=8, stride=4)
    n_raw = np.asarray(peaks.n_raw)
    assert n_raw[3] == 25
    assert n_raw[7] == 2
    assert np.asarray(peaks.valid)[3].sum() == 8      # table saturated
    dropped = np.maximum(n_raw - 8, 0)
    assert dropped[3] == 17 and dropped[7] == 0
    # the 8 kept table slots hold the 8 strongest planted cells
    kept = {tuple(c) for c in np.asarray(peaks.grid_yx)[3]}
    assert kept == set(cells[-8:])


def test_find_peaks_suppresses_pad_region():
    """Peaks in the bucket/letterbox pad band must be invalidated when the
    content extent is passed, matching the reference original path's
    unpad-before-peaks semantics (parse_skeletons.py:272-281); without it
    they survive (the refactor path, evaluate.py:74-80)."""
    H = W = 32                              # stride map of a 128x128 canvas
    heat = np.zeros((H, W, NUM_PARTS), np.float32)
    heat[:, :, 0] = gaussian_blob((H, W), 10.0, 10.0, sigma=1.5)   # content
    heat[:, :, 0] = np.maximum(
        heat[:, :, 0], gaussian_blob((H, W), 28.0, 5.0, sigma=1.5))  # pad x
    heat[:, :, 3] = gaussian_blob((H, W), 5.0, 29.0, sigma=1.5)      # pad y
    content = jnp.asarray([100.0, 100.0])   # content 100x100, pad band beyond
    got = find_peaks(jnp.asarray(heat), thre=0.1, max_peaks=8, stride=4,
                     content_hw=content)
    valid, xy = np.asarray(got.valid), np.asarray(got.xy)
    assert valid[0].sum() == 1              # only the content peak survives
    assert xy[0, 0, 0] < 100.0 and xy[0, 0, 1] < 100.0
    assert valid[3].sum() == 0              # fully-padded channel emptied
    assert np.asarray(got.n_raw)[0] == 1    # pre-top-k count is post-mask
    # without the extent both pad peaks are reported (refactor semantics)
    ref = find_peaks(jnp.asarray(heat), thre=0.1, max_peaks=8, stride=4)
    assert np.asarray(ref.valid)[0].sum() == 2
    assert np.asarray(ref.valid)[3].sum() == 1


def test_find_peaks_pad_suppression_protects_topk_budget():
    """Pad responses must be masked BEFORE the top-k cut so they cannot
    crowd real content peaks out of a saturated table."""
    H = W = 32
    heat = np.zeros((H, W, NUM_PARTS), np.float32)
    # 8 strong pad peaks + 3 weaker content peaks, table of 8
    for i, x in enumerate(range(26, 32)):
        for y in (3, 14):
            heat[y, x, 0] = 0.9
    for i, (x, y) in enumerate([(3, 3), (10, 10), (17, 17)]):
        heat[y, x, 0] = 0.3 + 0.01 * i
    got = find_peaks(jnp.asarray(heat), thre=0.1, max_peaks=8, stride=4,
                     content_hw=jnp.asarray([100.0, 100.0]))
    valid = np.asarray(got.valid)
    assert valid[0].sum() == 3
    assert np.all(np.asarray(got.xy)[0][valid[0]] < 100.0)


def test_refine_upsample_matches_cv2_and_is_subpixel():
    """refine_upsample=8 must equal the argmax of the cv2-INTER_CUBIC x8
    patch upsample (scaled into image coords) and beat the reference x4
    grid's localization of a sub-pixel gaussian."""
    import cv2
    H = W = 32
    truth = {0: (10.3, 12.7), 5: (20.55, 8.2)}
    heat = np.zeros((H, W, NUM_PARTS), np.float32)
    for j, (gx, gy) in truth.items():
        heat[:, :, j] = gaussian_blob((H, W), gx, gy, sigma=1.5)
    p4 = find_peaks(jnp.asarray(heat), thre=0.1, max_peaks=4, stride=4)
    p8 = find_peaks(jnp.asarray(heat), thre=0.1, max_peaks=4, stride=4,
                    refine_upsample=8)
    for j, (gx, gy) in truth.items():
        # cv2 mirror: crop the 5x5 patch, x8 cubic upsample, argmax
        cyx = np.asarray(p8.grid_yx)[j, 0]
        cy, cx = int(cyx[0]), int(cyx[1])
        y0, y1 = max(cy - 2, 0), min(cy + 2, H - 1)
        x0, x1 = max(cx - 2, 0), min(cx + 2, W - 1)
        patch = heat[y0:y1 + 1, x0:x1 + 1, j]
        up = cv2.resize(patch, None, fx=8, fy=8,
                        interpolation=cv2.INTER_CUBIC)
        uy, ux = np.unravel_index(up.argmax(), up.shape)
        center = ((np.array([cy - y0, cx - x0]) + 0.5) * 8 - 0.5)
        want = ((np.array([cy, cx]) + 0.5) * 4 - 0.5) + \
            (np.array([uy, ux]) - center) * 4 / 8
        got = np.asarray(p8.xy)[j, 0][::-1]          # (x, y) -> (y, x)
        np.testing.assert_allclose(got, want, atol=1e-4)
        assert np.asarray(p8.score)[j, 0] == pytest.approx(float(up.max()),
                                                           abs=1e-5)
        # and the finer grid localizes the sub-pixel center at least as well
        ex, ey = (gx + 0.5) * 4 - 0.5, (gy + 0.5) * 4 - 0.5
        err4 = np.hypot(*(np.asarray(p4.xy)[j, 0] - [ex, ey]))
        err8 = np.hypot(*(np.asarray(p8.xy)[j, 0] - [ex, ey]))
        assert err8 <= err4 + 1e-6, (j, err4, err8)


def test_bilinear_sample_matches_numpy():
    rng = np.random.RandomState(0)
    m = rng.rand(8, 10).astype(np.float32)
    xs = rng.uniform(0, 9, 50).astype(np.float32)
    ys = rng.uniform(0, 7, 50).astype(np.float32)
    got = np.asarray(bilinear_sample(jnp.asarray(m), jnp.asarray(xs), jnp.asarray(ys)))
    x0, y0 = np.floor(xs).astype(int), np.floor(ys).astype(int)
    x1, y1 = np.minimum(x0 + 1, 9), np.minimum(y0 + 1, 7)
    fx, fy = xs - x0, ys - y0
    want = (m[y0, x0] * (1 - fx) * (1 - fy) + m[y0, x1] * fx * (1 - fy)
            + m[y1, x0] * (1 - fx) * fy + m[y1, x1] * fx * fy)
    np.testing.assert_allclose(got, want, rtol=1e-5)


# ---------------------------------------------------------------------------
# limb scoring oracle
# ---------------------------------------------------------------------------

def _oracle_connections(paf, peaks_xy, peaks_score, peaks_valid, img_h, icfg,
                        stride=4):
    """Direct numpy transcription of the reference find_connections
    (parse_skeletons.py:324-410) using the same stride-map bilinear sampling."""
    P = peaks_score.shape[1]
    out = []
    for li, (fr, to) in enumerate(LIMBS_CONN):
        cands = []
        for i in range(P):
            if not peaks_valid[fr, i]:
                continue
            for j in range(P):
                if not peaks_valid[to, j]:
                    continue
                src = peaks_xy[fr, i]
                dst = peaks_xy[to, j]
                d = dst - src
                ll = float(np.hypot(d[0], d[1]))
                if ll == 0.0:
                    continue
                n = int(min(round(ll) + 1, icfg.mid_num))
                n = max(n, 2)
                ts = np.linspace(0, 1, n)
                px = src[0] + ts * d[0]
                py = src[1] + ts * d[1]
                fx = (px + 0.5) / stride - 0.5
                fy = (py + 0.5) / stride - 0.5
                vals = np.asarray(bilinear_sample(
                    jnp.asarray(paf[:, :, li]), jnp.asarray(fx.astype(np.float32)),
                    jnp.asarray(fy.astype(np.float32))))
                score = vals.mean() + min(0.5 * img_h / ll - 1, 0)
                c1 = np.count_nonzero(vals > icfg.thre2) > n * icfg.connect_ration
                c2 = score > 0
                if c1 and c2:
                    overall = 0.5 * score + 0.25 * peaks_score[fr, i] + 0.25 * peaks_score[to, j]
                    cands.append([i, j, score, ll, overall])
        cands.sort(key=lambda r: r[4], reverse=True)
        n_max = min(int(peaks_valid[fr].sum()), int(peaks_valid[to].sum()))
        used_i, used_j, rows = set(), set(), []
        for i, j, s, ll, _ in cands:
            if i not in used_i and j not in used_j:
                rows.append([fr * P + i, to * P + j, s, i, j, ll])
                used_i.add(i)
                used_j.add(j)
                if len(rows) >= n_max:
                    break
        out.append(np.array(rows, np.float64).reshape(-1, 6))
    return out


def _device_peaks_from(heat, icfg):
    return find_peaks(jnp.asarray(heat[:, :, :NUM_PARTS]), thre=icfg.thre1,
                      max_peaks=icfg.max_peaks, stride=4, refine="bicubic")


def test_connection_scoring_matches_oracle():
    icfg = InferenceConfig(max_peaks=8)
    paf, heat, _ = make_two_person_scene()
    peaks = _device_peaks_from(heat, icfg)
    img_h = 256.0

    # the numpy oracle here transcribes the FAST (bilinear) sampling mode;
    # the reference-exact default mode is oracle-tested against the actual
    # reference code in tests/test_reference_parity.py
    cand = score_connections(jnp.asarray(paf), peaks.xy, peaks.score,
                             peaks.valid, jnp.float32(img_h),
                             mid_num=icfg.mid_num, stride=4,
                             thre2=icfg.thre2, connect_ration=icfg.connect_ration,
                             sampling="bilinear")
    conns = select_connections(cand, peaks.valid)
    got = connections_to_numpy(conns, peaks)

    want = _oracle_connections(np.asarray(paf), np.asarray(peaks.xy),
                               np.asarray(peaks.score), np.asarray(peaks.valid),
                               img_h, icfg)
    for li in range(len(LIMBS_CONN)):
        g, w = got[li], want[li]
        assert len(g) == len(w), (li, g, w)
        if len(g) == 0:
            continue
        # same set of endpoint pairs (order may differ on score ties)
        g_pairs = sorted(map(tuple, g[:, :2].astype(int)))
        w_pairs = sorted(map(tuple, w[:, :2].astype(int)))
        assert g_pairs == w_pairs, li
        gs = g[np.lexsort(g[:, :2].T)]
        ws = w[np.lexsort(w[:, :2].T)]
        np.testing.assert_allclose(gs[:, 2], ws[:, 2], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(gs[:, 5], ws[:, 5], rtol=1e-4)


# ---------------------------------------------------------------------------
# grouping end-to-end on the synthetic scene
# ---------------------------------------------------------------------------

def test_grouping_reconstructs_two_people():
    icfg = InferenceConfig(max_peaks=8)
    paf, heat, gt = make_two_person_scene()
    peaks = _device_peaks_from(heat, icfg)
    cand = score_connections(jnp.asarray(paf), peaks.xy, peaks.score,
                             peaks.valid, jnp.float32(256.0),
                             mid_num=icfg.mid_num, stride=4,
                             thre2=icfg.thre2, connect_ration=icfg.connect_ration)
    conns = select_connections(cand, peaks.valid)
    connected = connections_to_numpy(conns, peaks)
    cands = group.build_joint_candidates(np.asarray(peaks.xy),
                                         np.asarray(peaks.score),
                                         np.asarray(peaks.valid))
    table, cands = group.find_humans(connected, cands, icfg)
    kps, scores = group.humans_to_keypoints(table, cands)

    assert len(kps) == 2, f"expected 2 people, got {len(kps)}"
    assert np.all(scores > 0.45)
    # match reconstructed people to ground truth by nose x-coordinate
    order = np.argsort(kps[:, 0, 0])
    for pi, person_gt in zip(order, gt):
        for j, (ex, ey) in person_gt.items():
            x, y, v = kps[pi, j]
            assert v == 1.0, (pi, j)
            assert abs(x - ex) < 6 and abs(y - ey) < 6, (pi, j, (x, y), (ex, ey))
