"""On-device limb scoring: line-integral over the limb heatmaps + greedy
one-to-one candidate selection, as dense fixed-shape tensor ops.

TPU-native replacement for the reference ``find_connections``
(utils/parse_skeletons.py:324-410) and the candidate-scoring half of the C++
``pafprocess`` extension (utils/pafprocess/pafprocess.cpp:52-130):

  * all 30 limb types x P src-peaks x P dst-peaks are scored at once as a
    (30, P, P) tensor — the reference's triple Python loop becomes one
    batched bilinear-gather over the stride-4 limb heatmaps;
  * the reference samples ``n = min(round(len)+1, 20)`` points on the
    upsampled (x4 cubic) heatmap; we sample the stride-4 map bilinearly at
    the same ``n`` linspace positions (slot-masked to a fixed 20) — exact
    sample-count parity without materialising the upsampled map;
  * greedy per-type selection ("accept best-scored pair whose endpoints are
    free", parse_skeletons.py:390-408) is a vmapped ``lax.scan`` over the
    score-sorted candidate list with used-endpoint bitmasks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from improved_body_parts_tpu.configs import LIMBS_CONN


class ConnectionCandidates(NamedTuple):
    """Dense candidate scores for every (limb_type, src_slot, dst_slot)."""
    conn_score: jnp.ndarray  # (L, P, P) mean paf sample + length penalty
    overall: jnp.ndarray     # (L, P, P) 0.5*conn + 0.25*src + 0.25*dst
    limb_len: jnp.ndarray    # (L, P, P)
    valid: jnp.ndarray       # (L, P, P) bool — passed criterion1 & criterion2


class Connections(NamedTuple):
    """Greedy-selected connections per limb type (fixed P slots each)."""
    src_slot: jnp.ndarray    # (L, P) int32 — peak slot index of src joint
    dst_slot: jnp.ndarray    # (L, P) int32
    score: jnp.ndarray       # (L, P) float32 conn_score
    limb_len: jnp.ndarray    # (L, P) float32
    valid: jnp.ndarray       # (L, P) bool


def bilinear_sample(map2d: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of a (H, W) map at float coords, clamped at borders.

    Gather-based formulation — numerically the ground truth for tests and
    fine on CPU, but slow on TPU (random HBM gathers); the hot path below
    uses ``bilinear_sample_matmul`` instead."""
    h, w = map2d.shape
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = x - x0
    fy = y - y0
    v00 = map2d[y0, x0]
    v01 = map2d[y0, x1]
    v10 = map2d[y1, x0]
    v11 = map2d[y1, x1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


def _interp_weights(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """(N,) float coords -> (N, size) dense bilinear weight rows (two
    non-zeros per row). Clamps at the borders like bilinear_sample."""
    c = jnp.clip(coord, 0.0, size - 1.0)
    c0 = jnp.floor(c)
    f = (c - c0)[:, None]
    idx = jax.lax.broadcasted_iota(jnp.float32, (1, size), 1)
    lo = (idx == c0[:, None]).astype(jnp.float32)
    hi = (idx == jnp.minimum(c0 + 1, size - 1)[:, None]).astype(jnp.float32)
    # when c0 == size-1 both one-hots coincide; (1-f) + f keeps weight 1
    return lo * (1.0 - f) + hi * f


def _cubic_weights_rows(coord: jnp.ndarray, size: int, a: float) -> jnp.ndarray:
    """(N,) float coords -> (N, size) dense Keys-cubic weight rows (four
    non-zeros per row, taps clamped to the border so colliding taps sum —
    exactly cv2's replicate border)."""
    c0 = jnp.floor(coord)
    f = (coord - c0)[:, None]
    # Keys kernel weights for taps at offsets -1, 0, 1, 2 from c0
    t = jnp.concatenate([1.0 + f, f, 1.0 - f, 2.0 - f], axis=1)  # (N, 4)
    at = jnp.abs(t)
    near = (a + 2) * at ** 3 - (a + 3) * at ** 2 + 1
    far = a * (at ** 3 - 5 * at ** 2 + 8 * at - 4)
    w = jnp.where(at <= 1.0, near, far)                          # (N, 4)
    idx = jax.lax.broadcasted_iota(jnp.float32, (1, size), 1)
    rows = jnp.zeros((coord.shape[0], size), jnp.float32)
    for k in range(4):
        tap = jnp.clip(c0 + (k - 1), 0, size - 1)[:, None]
        rows = rows + (idx == tap).astype(jnp.float32) * w[:, k:k + 1]
    return rows


def cubic_sample_matmul(map2d: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                        a: float) -> jnp.ndarray:
    """Separable Keys-cubic sampling as two dense contractions on the MXU
    (same trick as ``bilinear_sample_matmul``, 4 taps per axis). With
    a=-0.75 and coords mapped by the half-pixel convention this equals
    reading the cv2.resize(INTER_CUBIC)-upsampled map — without ever
    materialising it."""
    h, w = map2d.shape
    shape = x.shape
    ex = _cubic_weights_rows(x.reshape(-1), w, a)     # (N, W)
    ey = _cubic_weights_rows(y.reshape(-1), h, a)     # (N, H)
    rows = jax.lax.dot_general(ey, map2d.astype(jnp.float32),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (N, W)
    samples = jnp.sum(rows * ex, axis=-1)
    return samples.reshape(shape)


def bilinear_sample_matmul(map2d: jnp.ndarray, x: jnp.ndarray,
                           y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling as two dense contractions on the MXU.

    TPU trick: random gathers are scalar-unit work, but the same
    interpolation is samples = einsum(Ey[n,h], map[h,w], Ex[n,w]) with
    two-nonzero one-hot weight rows — a (N,H)x(H,W) matmul plus a masked
    row-sum, which the MXU eats. ~100x faster than the gather lowering for
    the 614k samples/image of the limb scorer. Exactly equal to
    ``bilinear_sample`` up to float addition order."""
    h, w = map2d.shape
    shape = x.shape
    ex = _interp_weights(x.reshape(-1), w)            # (N, W)
    ey = _interp_weights(y.reshape(-1), h)            # (N, H)
    rows = jax.lax.dot_general(ey, map2d.astype(jnp.float32),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (N, W)
    samples = jnp.sum(rows * ex, axis=-1)
    return samples.reshape(shape)


@functools.partial(jax.jit, static_argnames=("mid_num", "stride", "sampling"))
def score_connections(paf: jnp.ndarray,
                      peaks_xy: jnp.ndarray,
                      peaks_score: jnp.ndarray,
                      peaks_valid: jnp.ndarray,
                      img_h: jnp.ndarray,
                      *,
                      mid_num: int = 20,
                      stride: int = 4,
                      thre2: float = 0.1,
                      connect_ration: float = 0.8,
                      sampling: str = "reference") -> ConnectionCandidates:
    """Score all candidate limbs.

    paf:         (h, w, L) stride-resolution limb heatmaps (L=30).
    peaks_xy:    (K, P, 2) peak coords in padded-image pixels.
    peaks_score: (K, P); peaks_valid: (K, P) bool.
    img_h:       scalar — ORIGINAL image height (length-penalty prior,
                 parse_skeletons.py:367).
    sampling:    "reference" (default) reproduces the reference exactly:
                 n = min(round(len + 1), mid_num) points, coordinates
                 ROUNDED to integer pixels of the x4 cv2-INTER_CUBIC
                 upsampled paf map (parse_skeletons.py:353-363), read by
                 an equivalent on-the-fly cubic sampler — the upsampled
                 map is never materialised. "bilinear" is the fast
                 approximation: n = min(round(len) + 1, mid_num) (>= 2)
                 exact sub-pixel positions, bilinear reads of the stride
                 map.
    """
    limbs = jnp.asarray(LIMBS_CONN)                     # (L, 2)
    src_xy = peaks_xy[limbs[:, 0]]                      # (L, P, 2)
    dst_xy = peaks_xy[limbs[:, 1]]
    src_score = peaks_score[limbs[:, 0]]                # (L, P)
    dst_score = peaks_score[limbs[:, 1]]
    src_valid = peaks_valid[limbs[:, 0]]
    dst_valid = peaks_valid[limbs[:, 1]]

    diff = dst_xy[:, None, :, :] - src_xy[:, :, None, :]     # (L, P, P, 2)
    limb_len = jnp.sqrt(jnp.sum(jnp.square(diff), axis=-1))  # (L, P, P)

    if sampling == "reference":
        # n = min(round(len + 1), mid_num), as low as 1 (linspace(num=1)
        # degenerates to the src point) — parse_skeletons.py:353
        n_samples = jnp.minimum(jnp.round(limb_len + 1), mid_num).astype(jnp.int32)
        n_samples = jnp.maximum(n_samples, 1)
    else:
        n_samples = jnp.minimum(jnp.round(limb_len) + 1, mid_num).astype(jnp.int32)
        n_samples = jnp.maximum(n_samples, 2)
    slot = jnp.arange(mid_num, dtype=jnp.float32)            # (S,)
    t = slot / jnp.maximum(n_samples[..., None] - 1, 1).astype(jnp.float32)
    sample_mask = slot < n_samples[..., None]                # (L, P, P, S)
    t = jnp.minimum(t, 1.0)

    pts = src_xy[:, :, None, None, :] + t[..., None] * diff[:, :, :, None, :]
    if sampling == "reference":
        # integer pixels of the virtual x4-upsampled map ...
        pts = jnp.round(pts)
    # ... mapped to stride-map coords (half-pixel convention, the inverse
    # of the reference's x4 cubic upsample, parse_skeletons.py:122-123)
    fx = (pts[..., 0] + 0.5) / stride - 0.5
    fy = (pts[..., 1] + 0.5) / stride - 0.5

    paf_cl = jnp.moveaxis(paf, -1, 0)                        # (L, h, w)
    # per limb type: MXU-matmul sampling of its stride map (sequential over
    # the 30 types to bound the one-hot scratch memory)
    if sampling == "reference":
        sample_fn = functools.partial(cubic_sample_matmul,
                                      a=-0.75)  # cv2 INTER_CUBIC kernel
    else:
        sample_fn = bilinear_sample_matmul
    samples = jax.lax.map(
        lambda args: sample_fn(args[0], args[1], args[2]),
        (paf_cl, fx.reshape(fx.shape[0], -1), fy.reshape(fy.shape[0], -1)))
    samples = samples.reshape(fx.shape)                      # (L, P, P, S)

    n_f = n_samples.astype(jnp.float32)
    mean_paf = jnp.sum(jnp.where(sample_mask, samples, 0.0), axis=-1) / n_f
    conn_score = mean_paf + jnp.minimum(0.5 * img_h / jnp.maximum(limb_len, 1e-6) - 1.0, 0.0)

    passing = jnp.sum((samples > thre2) & sample_mask, axis=-1)
    criterion1 = passing > n_f * connect_ration              # parse_skeletons.py:373-374
    criterion2 = conn_score > 0.0
    valid = (criterion1 & criterion2 & (limb_len > 0.0)
             & src_valid[:, :, None] & dst_valid[:, None, :])

    overall = 0.5 * conn_score + 0.25 * src_score[:, :, None] + 0.25 * dst_score[:, None, :]
    return ConnectionCandidates(conn_score=conn_score, overall=overall,
                                limb_len=limb_len, valid=valid)


@functools.partial(jax.jit, static_argnames=())
def select_connections(cand: ConnectionCandidates,
                       peaks_valid: jnp.ndarray) -> Connections:
    """Greedy one-to-one selection per limb type, by descending overall score.

    Accept a candidate iff neither its src slot nor dst slot is already used;
    stop after min(#src, #dst) acceptances (parse_skeletons.py:390-408).

    Formulated as at most P masked-argmax rounds (repeatedly take the global
    best among non-conflicting candidates — provably identical to walking
    the full sorted list) instead of a P*P-step scan: 32 sequential steps of
    vectorized work beat 1024 scalar scan steps ~10x on TPU. Ties resolve
    to the lowest flat index, matching a stable descending sort.
    """
    L, P, _ = cand.overall.shape
    limbs = jnp.asarray(LIMBS_CONN)
    n_src = jnp.sum(peaks_valid[limbs[:, 0]], axis=1)        # (L,)
    n_dst = jnp.sum(peaks_valid[limbs[:, 1]], axis=1)
    max_conn = jnp.minimum(n_src, n_dst)                     # (L,)

    neg_inf = jnp.float32(-jnp.inf)
    overall = jnp.where(cand.valid, cand.overall, neg_inf)   # (L, P, P)
    score = cand.conn_score
    length = cand.limb_len

    def per_type(overall_t, score_t, len_t, cap):
        def body(k, state):
            used_src, used_dst, out_src, out_dst, out_score, out_len, out_valid = state
            masked = jnp.where(used_src[:, None] | used_dst[None, :],
                               neg_inf, overall_t)
            flat = masked.reshape(-1)
            idx = jnp.argmax(flat)
            i = idx // P
            j = idx % P
            ok = (flat[idx] > neg_inf) & (k < cap)
            out_src = out_src.at[k].set(jnp.where(ok, i, 0))
            out_dst = out_dst.at[k].set(jnp.where(ok, j, 0))
            out_score = out_score.at[k].set(jnp.where(ok, score_t[i, j], 0.0))
            out_len = out_len.at[k].set(jnp.where(ok, len_t[i, j], 0.0))
            out_valid = out_valid.at[k].set(ok)
            used_src = used_src.at[i].set(used_src[i] | ok)
            used_dst = used_dst.at[j].set(used_dst[j] | ok)
            return (used_src, used_dst, out_src, out_dst,
                    out_score, out_len, out_valid)

        init = (jnp.zeros(P, bool), jnp.zeros(P, bool),
                jnp.zeros(P, jnp.int32), jnp.zeros(P, jnp.int32),
                jnp.zeros(P, jnp.float32), jnp.zeros(P, jnp.float32),
                jnp.zeros(P, bool))
        _, _, osrc, odst, oscore, olen, ovalid = lax.fori_loop(
            0, P, body, init)
        return osrc, odst, oscore, olen, ovalid

    osrc, odst, oscore, olen, ovalid = jax.vmap(per_type)(
        overall, score, length, max_conn)
    return Connections(src_slot=osrc, dst_slot=odst, score=oscore,
                       limb_len=olen, valid=ovalid)


def connections_to_numpy(conns: Connections, peaks, limbs_conn=LIMBS_CONN):
    """Convert device connection tables to the reference list-of-arrays format
    [(k,6): src_peak_id, dst_peak_id, score, src_idx, dst_idx, limb_len] with
    global peak id = joint_type * P + slot, for the host grouping stage."""
    host = Connections(*(np.asarray(a) for a in conns))
    return connections_to_list(host, peaks.score.shape[1], limbs_conn)


def connections_to_list(conns: Connections, P: int, limbs_conn=LIMBS_CONN):
    """Same as connections_to_numpy but for already-host-numpy tables
    (the unpacked single-fetch path in infer/predict.py)."""
    out = []
    for l, (fr, to) in enumerate(np.asarray(limbs_conn)):
        m = np.asarray(conns.valid[l])
        k = int(m.sum())
        rows = np.zeros((k, 6), np.float64)
        ss = np.asarray(conns.src_slot[l])[m]
        ds = np.asarray(conns.dst_slot[l])[m]
        rows[:, 0] = fr * P + ss
        rows[:, 1] = to * P + ds
        rows[:, 2] = np.asarray(conns.score[l])[m]
        rows[:, 3] = ss
        rows[:, 4] = ds
        rows[:, 5] = np.asarray(conns.limb_len[l])[m]
        out.append(rows)
    return out
