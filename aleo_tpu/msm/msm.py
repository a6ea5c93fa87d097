"""Pippenger multi-scalar multiplication on TPU (fused Pallas group law).

TPU-native replacement for snarkVM's MSM (`snarkvm-algorithms`, SURVEY.md
§2.8 item 3) — the single hottest kernel of the prover (every KZG commitment
is one MSM over the SRS). GPU Pippenger relies on scatter/atomics for bucket
accumulation; that shape does not map onto XLA, so this implementation makes
*buckets* the vector lanes and streams points into them:

  1. signed-digit window decomposition (digits in [-2^(c-1), 2^(c-1)];
     negation of a point is free, halving the bucket count),
  2. ONE global sort of all (window, |digit|) keys across every window
     (W*N keys — a single XLA sort, measured ~50 us at 1.3M on v5e),
  3. bucket start/count recovery via searchsorted over the sorted keys,
  4. round-robin accumulation: round j gathers the j-th point of every
     (window, bucket) segment and performs one fused Pallas
     add-negate-select over all W*2^(c-1) bucket lanes
     (`curves.g1_fused.add_sel_lf` — whole RCB16 add in VMEM).
     Rounds ~= max bucket occupancy (~lambda + tail), so total group-add
     work is linear in W*N instead of the N*log N of a scan formulation.
  5. log-depth weighted bucket reduction (suffix scan + tree sum, both as
     identity-padded full-width fused adds),
  6. window combine: Horner either on device (lax.scan of c doublings per
     window — jittable) or on host (python bigints — faster wall-clock,
     used by the prover whose transcript lives on host anyway).

All shapes are static; the only data-dependent control flow is the round
count, a `lax.while_loop` bounded by the max bucket occupancy.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .. import params
from ..curves import g1, g1_affine as ga, g1_fused as gf
from ..curves.g1 import G1Points
from ..curves.g1_affine import G1AF
from ..curves.g1_fused import G1LF
from ..fields.modring import FR_RING, ints_to_limbs

NBITS = params.R.bit_length()  # 253


def auto_c(n: int) -> int:
    """Pippenger window size for an n-point MSM.

    ~log2(n) - 2 balances bucket-lane count (W * 2^(c-1)) against round
    count (max bucket occupancy ~ n / 2^(c-1) + tail); the v5e sweep
    (tools: sweep over c in 12..14 at 2^13..2^16) puts the ceiling at 12 —
    beyond it the Poisson occupancy tail wastes most lanes in late rounds
    (2^16: c=12 161k pts/s vs c=13 102k).
    """
    return max(3, min(12, n.bit_length() - 2))


def _nwin(c: int) -> int:
    # +1 bit of headroom so the signed-digit carry out of the top window
    # is always absorbed (relevant when c divides NBITS).
    return math.ceil((NBITS + 1) / c)


def signed_digits(scalars_raw: jnp.ndarray, c: int):
    """(N, FR_LIMBS) raw 16-bit limbs -> (W, N) int32 signed window digits.

    Digits lie in [-(2^(c-1)-1), 2^(c-1)] and satisfy
    sum_w d_w 2^(cw) == scalar. Requires c <= 16.
    """
    assert 2 <= c <= 16
    n = scalars_raw.shape[0]
    w_total = _nwin(c)
    half = 1 << (c - 1)
    padded = jnp.concatenate(
        [scalars_raw, jnp.zeros((n, 2), dtype=jnp.uint32)], axis=-1
    )
    carry = jnp.zeros((n,), dtype=jnp.int32)
    out = []
    for w in range(w_total):
        bit0 = w * c
        j0, sh = bit0 // 16, bit0 % 16
        v = padded[:, j0] | (padded[:, j0 + 1] << 16)
        d = ((v >> sh) & ((1 << c) - 1)).astype(jnp.int32) + carry
        big = d > half
        out.append(jnp.where(big, d - (1 << c), d))
        carry = big.astype(jnp.int32)
    return jnp.stack(out, axis=0)


def make_table(points: G1Points) -> jnp.ndarray:
    """(N,)-batched points -> (N, 2L) uint32 gather table [x|y] rows.

    AFFINE rows: the bucket stream uses the complete MIXED addition,
    saving a mul and a third of the per-round gather traffic. Identity
    points are stored as the off-curve sentinel (0, 0) (y^2 = x^3 + 1 has
    no point with y = 0), which the fused kernel masks like an invalid
    lane. Row-contiguous so per-round point gathers read 192-byte rows
    instead of strided column gathers.
    """
    ident = jnp.all(points.z == 0, axis=-1, keepdims=True)
    xy = jnp.concatenate([points.x, points.y], axis=-1)
    return jnp.where(ident, jnp.uint32(0), xy)


def _identity_lf(m: int) -> G1LF:
    return gf.identity_lf(m)


def _scan_add_buckets(p: G1LF, w: int, b: int) -> G1LF:
    """Hillis-Steele suffix scan along the bucket axis, one add instance.

    out[b'] = sum_{k >= b'} p[k] within each window. Shift amounts are
    traced (1 << d under fori_loop) so the compiled graph holds exactly one
    group-add regardless of log2(b) step count — critical for XLA compile
    time on both backends.
    """
    L = p.x.shape[0]
    iota = jnp.arange(b, dtype=jnp.int32)
    ident = _identity_lf(1)

    def body(d, coords):
        x, y, z = coords
        s = jnp.int32(1) << d
        keep = (iota + s < b)[None, None, :]

        def sh(a, fill):
            r = jnp.roll(a.reshape(L, w, b), -s, axis=2)
            return jnp.where(keep, r, fill).reshape(L, -1)

        q = G1LF(sh(x, 0), sh(y, ident.y.reshape(L, 1, 1)), sh(z, 0))
        r = gf.add_lf(G1LF(x, y, z), q)
        return (r.x, r.y, r.z)

    x, y, z = jax.lax.fori_loop(
        0, b.bit_length() - 1, body, (p.x, p.y, p.z)
    )
    return G1LF(x, y, z)


def _tree_sum_axis(p: G1LF, L: int, pre: int, b: int, post: int) -> G1LF:
    """Halving tree reduction over the middle axis of a (L, pre, b, post)
    lane view. Work ~2x one full-width add (vs log2(b)x for a scan)."""
    x, y, z = p.x, p.y, p.z
    while b > 1:
        half = b // 2

        def split(a):
            a4 = a.reshape(L, pre, b, post)
            return (
                a4[:, :, :half].reshape(L, -1),
                a4[:, :, half:].reshape(L, -1),
            )

        (xl, xh), (yl, yh), (zl, zh) = split(x), split(y), split(z)
        s = gf.add_lf(G1LF(xl, yl, zl), G1LF(xh, yh, zh))
        x, y, z, b = s.x, s.y, s.z, half
    return G1LF(x, y, z)


def _weighted_bucket_sum(p: G1LF, w: int, b: int) -> G1LF:
    """sum_{i} (i+1) * S_i per window -> (L, w) window totals.

    Chunked formulation: with i = hi*G + lo,
      sum (i+1) S_i = G * sum_hi hi*A_hi + sum_lo (lo+1)*B_lo,
    where A_hi/B_lo are tree sums over the other sub-axis. The big-width
    work is two tree reductions (~2x a full-width add each) instead of the
    2*log2(b) full-width adds of the double-suffix-scan formulation —
    measured 45% of the whole 2^16 MSM.
    """
    L = p.x.shape[0]
    if b <= 64:
        q = _scan_add_buckets(p, w, b)
        q = _scan_add_buckets(q, w, b)
        return _first_bucket(q, w, b)
    g = (b.bit_length() - 1) // 2
    G = 1 << g
    H = b // G
    # A_hi = sum_lo S[hi, lo]  (reduce the trailing G axis)
    A = _tree_sum_axis(p, L, w * H, G, 1)               # (L, w*H)
    # B_lo = sum_hi S[hi, lo]  (reduce the middle H axis)
    B = _tree_sum_axis(p, L, w, H, G)                   # (L, w*G)
    # X = sum_hi hi * A_hi  == sum_k (k+1) * A[k+1]  (shift A left by one)
    ident = _identity_lf(1)

    def shift_left(a, fill):
        a3 = a.reshape(L, w, H)
        tail = jnp.broadcast_to(fill.reshape(L, 1, 1), (L, w, 1))
        return jnp.concatenate([a3[:, :, 1:], tail], axis=2).reshape(L, -1)

    A1 = G1LF(
        shift_left(A.x, ident.x), shift_left(A.y, ident.y),
        shift_left(A.z, ident.z),
    )
    X = _scan_add_buckets(A1, w, H)
    X = _scan_add_buckets(X, w, H)
    X = _first_bucket(X, w, H)                          # (L, w)
    Y = _scan_add_buckets(B, w, G)
    Y = _scan_add_buckets(Y, w, G)
    Y = _first_bucket(Y, w, G)                          # (L, w)
    for _ in range(g):                                  # G * X
        X = gf.double_lf(X)
    return gf.add_lf(X, Y)


def _first_bucket(p: G1LF, w: int, b: int) -> G1LF:
    L = p.x.shape[0]

    def f(a):
        return a.reshape(L, w, b)[:, :, 0]

    return G1LF(f(p.x), f(p.y), f(p.z))


def _top_window_split(c: int, w_total: int) -> tuple:
    """(effective top-window bucket count, sub-split factor).

    The top window covers only `NBITS+1 - c*(W-1)` bits, so its digit range
    (and occupied bucket count) is far below 2^(c-1); without correction its
    buckets hold ~n/2^(top_bits) entries and the round-robin trip count is
    dominated by that skew (measured 8.3 s vs 0.3 s of useful adds at c=13,
    2^16). Splitting each top bucket across the window's unused lanes
    restores uniform occupancy; the sub-accumulators are merged afterwards
    by log2(s) masked adds.
    """
    half = 1 << (c - 1)
    top_bits = (NBITS + 1) - c * (w_total - 1)
    mag_top = min(1 << top_bits, half)
    return mag_top, half // mag_top


@functools.lru_cache(maxsize=None)
def _lane_layout_np(c: int, w_total: int, k: int = 1):
    """Static per-lane layout (numpy): sub offsets, strides, merge masks,
    and the post-merge reshuffle for k batched proofs.

    Lane grid: k * W * half lanes, proof-major then window-major. Normal
    windows: one lane per bucket (stride 1). Top window of each proof:
    bucket b's segment is interleaved across s lanes (stride s); merge mask
    d selects lanes with sub % 2^(d+1) == 0 and sub + 2^d < s.
    """
    import numpy as np

    half = 1 << (c - 1)
    mag_top, s = _top_window_split(c, w_total)
    lanes = k * w_total * half
    iota = np.arange(lanes)
    win = (iota // half) % w_total
    lane_in_win = iota % half
    is_top = win == (w_total - 1)
    sub = np.where(is_top, lane_in_win % s, 0)
    bucket = np.where(is_top, lane_in_win // s, lane_in_win)
    stride = np.where(is_top, s, 1).astype(np.int32)
    merge_masks = []
    d = 1
    while d < s:
        merge_masks.append(
            (is_top & (sub % (2 * d) == 0) & (sub + d < s)).astype(np.uint32)
        )
        d *= 2
    # reshuffle: weighted-scan wants bucket b's total at lane index b within
    # its window; merged totals sit at sub-lane 0 (lane b*s).
    src = np.where(
        is_top & (lane_in_win < mag_top),
        iota - lane_in_win + lane_in_win * s,
        iota,
    ).astype(np.int32)
    keep = (~is_top | (lane_in_win < mag_top)).astype(np.uint32)
    return (
        sub.astype(np.int32), bucket.astype(np.int32), stride,
        merge_masks, src, keep, s,
    )


def _bucket_grid(sorted_keys, c: int, w_total: int, k: int, m_exp: int):
    """(lane_start, lane_stride, lane_count) int32 arrays over the lane grid,
    with top-window sub-splitting applied."""
    half = 1 << (c - 1)
    sub_np, bucket_np, stride_np, merge_masks, src_np, keep_np, s = (
        _lane_layout_np(c, w_total, k)
    )
    qproof = jnp.repeat(jnp.arange(k, dtype=jnp.uint32), w_total * half)
    qwin = jnp.tile(jnp.repeat(jnp.arange(w_total, dtype=jnp.uint32), half), (k,))
    qmag = jnp.asarray(bucket_np).astype(jnp.uint32) + 1
    if k == 1:
        qkeys = (qwin << c) | qmag
    else:
        qkeys = (qproof << (c + 8)) | (qwin << c) | qmag
    starts = jnp.searchsorted(sorted_keys, qkeys, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_keys, qkeys, side="right").astype(jnp.int32)
    counts = ends - starts
    sub = jnp.asarray(sub_np)
    stride = jnp.asarray(stride_np)
    lane_start = starts + sub
    lane_count = jnp.maximum(0, (counts - sub + stride - 1) // stride)
    return lane_start, stride, lane_count, merge_masks, src_np, keep_np, s


def _accumulate_buckets(
    sorted_entries, table, lane_start, lane_stride, lane_count,
    merge_masks, src_np, keep_np, m_exp: int,
):
    """Round-robin fused-add accumulation + top-window sub merge/reshuffle."""
    L = table.shape[1] // 2
    lanes = lane_start.shape[0]
    max_count = jnp.max(lane_count)
    acc0 = _identity_lf(lanes)

    def cond(state):
        return state[0] < max_count

    def body(state):
        j, ax, ay, az = state
        pos = jnp.minimum(lane_start + j * lane_stride, m_exp - 1)
        valid = j < lane_count
        entry = sorted_entries[pos]
        rows = table[entry & jnp.uint32(0x7FFFFFFF)]
        coords = rows.T
        acc = gf.add_sel_lf(
            G1LF(ax, ay, az), coords[:L], coords[L:], entry >> 31, valid
        )
        return j + 1, acc.x, acc.y, acc.z

    _, ax, ay, az = jax.lax.while_loop(
        cond, body, (jnp.int32(0), acc0.x, acc0.y, acc0.z)
    )
    acc = G1LF(ax, ay, az)

    # merge top-window sub-accumulators (log2(s) masked full-grid adds)
    shift = 1
    for mask_np in merge_masks:
        idx = jnp.minimum(jnp.arange(lanes) + shift, lanes - 1)
        partner = G1LF(acc.x[:, idx], acc.y[:, idx], acc.z[:, idx])
        acc = gf.add_sel_proj_lf(
            acc, partner, jnp.zeros((lanes,), jnp.uint32), jnp.asarray(mask_np)
        )
        shift *= 2
    if len(merge_masks):
        ident = _identity_lf(lanes)
        src = jnp.asarray(src_np)
        keep = jnp.asarray(keep_np)[None, :] != 0
        acc = G1LF(
            jnp.where(keep, acc.x[:, src], ident.x),
            jnp.where(keep, acc.y[:, src], ident.y),
            jnp.where(keep, acc.z[:, src], ident.z),
        )
    return acc


# ---------------------------------------------------------------------------
# batch-affine pipeline (default): affine accumulators + shared batch
# inversion — ~7 Montgomery muls per bucket add vs 11 projective
# (curves/g1_affine.py; BASELINE.md round-5 lever #1)
# ---------------------------------------------------------------------------


def _use_affine() -> bool:
    from .. import config

    mode = config.MSM_AFFINE_MODE
    if mode == "auto":
        return jax.default_backend() == "tpu"
    return mode not in ("0", "false")


# Overflow balancing: fraction of extra "spare" lanes that adopt the second
# half of the heaviest buckets' segments. The round-robin trip count is the
# MAX segment length (Poisson tail ~2x the mean at 2^16/c=12 — measured 64
# rounds vs mean 32), so splitting just the heavy tail cuts rounds ~40% for
# ~12% more lanes.
OVERFLOW_FRAC = 8  # spares = lanes // OVERFLOW_FRAC


def run_rounds_af(sorted_entries, table, lane_start, lane_stride,
                  lane_count, m_exp: int, balance: bool = True) -> G1AF:
    """Round-robin batch-affine accumulation over a (start, stride, count)
    lane grid, with tail balancing: the lanes//OVERFLOW_FRAC heaviest
    segments are split in half, the second halves ride spare lanes, and the
    spares merge back with one masked add. Shared by the variable-base
    (msm_windows*) and fixed-base (fixed_base._fixed_windows) pipelines."""
    L = table.shape[1] // 2
    lanes = lane_start.shape[0]
    n_spare = lanes // OVERFLOW_FRAC if balance else 0
    if n_spare:
        order = jnp.argsort(-lane_count)
        tgt = order[:n_spare]                          # heaviest mains
        is_split = jnp.zeros((lanes,), bool).at[tgt].set(True)
        h = jnp.where(is_split, (lane_count + 1) // 2, lane_count)
        all_start = jnp.concatenate(
            [lane_start, lane_start[tgt] + h[tgt] * lane_stride[tgt]]
        )
        all_stride = jnp.concatenate([lane_stride, lane_stride[tgt]])
        all_count = jnp.concatenate([h, lane_count[tgt] - h[tgt]])
    else:
        all_start, all_stride, all_count = lane_start, lane_stride, lane_count
    total = lanes + n_spare
    max_count = jnp.max(all_count)
    acc0 = ga.identity_af(total)

    def cond(state):
        return state[0] < max_count

    def body(state):
        j, ax, ay, ainf = state
        pos = jnp.minimum(all_start + j * all_stride, m_exp - 1)
        valid = (j < all_count).astype(jnp.uint32)
        entry = sorted_entries[pos]
        rows = table[entry & jnp.uint32(0x7FFFFFFF)]
        coords = rows.T
        px, py = coords[:L], coords[L:]
        # identity sentinel (0, 0): y == 0 never occurs in the subgroup
        pinf = (
            jnp.max(py.astype(jnp.int32), axis=0, keepdims=True) == 0
        ).astype(jnp.uint32)
        acc = ga.madd(
            G1AF(ax, ay, ainf), px, py, pinf,
            (entry >> 31).astype(jnp.uint32), valid,
        )
        return j + 1, acc.x, acc.y, acc.inf

    _, ax, ay, ainf = jax.lax.while_loop(
        cond, body, (jnp.int32(0), acc0.x, acc0.y, acc0.inf)
    )
    acc = G1AF(ax[:, :lanes], ay[:, :lanes], ainf[:, :lanes])
    if n_spare:
        # merge spares back into their buckets: one masked add with a
        # runtime partner gather (pidx[i] = spare index serving main i)
        pidx = jnp.zeros((lanes,), jnp.int32).at[tgt].set(
            jnp.arange(n_spare, dtype=jnp.int32)
        )
        sx, sy, sinf = ax[:, lanes:], ay[:, lanes:], ainf[:, lanes:]
        partner = G1AF(sx[:, pidx], sy[:, pidx], sinf[:, pidx])
        acc = ga.add_pairs(acc, partner, valid=is_split.astype(jnp.uint32))
    return acc


def _accumulate_buckets_af(
    sorted_entries, table, lane_start, lane_stride, lane_count,
    merge_masks, src_np, keep_np, m_exp: int,
) -> G1AF:
    """Round-robin batch-affine accumulation + top-window merge/reshuffle."""
    lanes = lane_start.shape[0]
    acc = run_rounds_af(
        sorted_entries, table, lane_start, lane_stride, lane_count, m_exp
    )

    # merge top-window sub-accumulators (log2(s) masked full-grid adds)
    shift = 1
    for mask_np in merge_masks:
        idx = jnp.minimum(jnp.arange(lanes) + shift, lanes - 1)
        partner = G1AF(acc.x[:, idx], acc.y[:, idx], acc.inf[:, idx])
        acc = ga.add_pairs(acc, partner, valid=jnp.asarray(mask_np))
        shift *= 2
    if len(merge_masks):
        src = jnp.asarray(src_np)
        keep = jnp.asarray(keep_np)[None, :] != 0
        zero = jnp.zeros_like(acc.x)
        acc = G1AF(
            jnp.where(keep, acc.x[:, src], zero),
            jnp.where(keep, acc.y[:, src], zero),
            jnp.where(keep, acc.inf[:, src], jnp.uint32(1)),
        )
    return acc


def _scan_add_buckets_af(p: G1AF, w: int, b: int) -> G1AF:
    """Hillis-Steele suffix scan along the bucket axis (affine twin)."""
    L = p.x.shape[0]
    iota = jnp.arange(b, dtype=jnp.int32)

    def body(d, state):
        x, y, inf = state
        s = jnp.int32(1) << d
        keep = (iota + s < b)[None, None, :]

        def shc(a):
            r = jnp.roll(a.reshape(L, w, b), -s, axis=2)
            return jnp.where(keep, r, 0).reshape(L, -1)

        qinf = jnp.where(
            keep, jnp.roll(inf.reshape(1, w, b), -s, axis=2), jnp.uint32(1)
        ).reshape(1, -1)
        r = ga.add_pairs(G1AF(x, y, inf), G1AF(shc(x), shc(y), qinf))
        return (r.x, r.y, r.inf)

    x, y, inf = jax.lax.fori_loop(
        0, b.bit_length() - 1, body, (p.x, p.y, p.inf)
    )
    return G1AF(x, y, inf)


def _tree_sum_axis_af(p: G1AF, L: int, pre: int, b: int, post: int) -> G1AF:
    """Halving tree reduction over the middle axis, affine twin."""
    x, y, inf = p.x, p.y, p.inf
    while b > 1:
        half = b // 2

        def split(a, rows):
            a4 = a.reshape(rows, pre, b, post)
            return (
                a4[:, :, :half].reshape(rows, -1),
                a4[:, :, half:].reshape(rows, -1),
            )

        (xl, xh) = split(x, L)
        (yl, yh) = split(y, L)
        (il, ih) = split(inf, 1)
        s = ga.add_pairs(G1AF(xl, yl, il), G1AF(xh, yh, ih))
        x, y, inf, b = s.x, s.y, s.inf, half
    return G1AF(x, y, inf)


def _first_bucket_af(p: G1AF, w: int, b: int) -> G1AF:
    L = p.x.shape[0]
    return G1AF(
        p.x.reshape(L, w, b)[:, :, 0],
        p.y.reshape(L, w, b)[:, :, 0],
        p.inf.reshape(1, w, b)[:, :, 0],
    )


def _weighted_bucket_sum_af(p: G1AF, w: int, b: int) -> G1AF:
    """sum_i (i+1) * S_i per window (chunked formulation, affine twin)."""
    L = p.x.shape[0]
    if b <= 64:
        q = _scan_add_buckets_af(p, w, b)
        q = _scan_add_buckets_af(q, w, b)
        return _first_bucket_af(q, w, b)
    g = (b.bit_length() - 1) // 2
    G = 1 << g
    H = b // G
    A = _tree_sum_axis_af(p, L, w * H, G, 1)            # (L, w*H)
    B = _tree_sum_axis_af(p, L, w, H, G)                # (L, w*G)

    def shift_left(a, rows, fill):
        a3 = a.reshape(rows, w, H)
        tail = jnp.full((rows, w, 1), fill, a.dtype)
        return jnp.concatenate([a3[:, :, 1:], tail], axis=2).reshape(rows, -1)

    A1 = G1AF(
        shift_left(A.x, L, 0), shift_left(A.y, L, 0),
        shift_left(A.inf, 1, 1),
    )
    X = _scan_add_buckets_af(A1, w, H)
    X = _scan_add_buckets_af(X, w, H)
    X = _first_bucket_af(X, w, H)                       # (L, w)
    Y = _scan_add_buckets_af(B, w, G)
    Y = _scan_add_buckets_af(Y, w, G)
    Y = _first_bucket_af(Y, w, G)                       # (L, w)
    for _ in range(g):                                  # G * X
        X = ga.double_af(X)
    return ga.add_pairs(X, Y)


@functools.partial(jax.jit, static_argnames=("c",))
def msm_windows(scalars_raw: jnp.ndarray, table: jnp.ndarray, c: int) -> G1LF:
    """Per-window MSM totals: G1LF with batch axis = window index (W lanes).

    scalars_raw: (N, FR_LIMBS) uint32 standard-form 16-bit limbs.
    table: (N, 3L) gather table from `make_table`.
    """
    n = table.shape[0]
    w_total = _nwin(c)
    half = 1 << (c - 1)
    m_exp = w_total * n  # expanded (window, point) pairs

    digits = signed_digits(scalars_raw, c)  # (W, N) int32
    mag = jnp.abs(digits).astype(jnp.uint32)
    sign = (digits < 0).astype(jnp.uint32)

    win_ids = jnp.repeat(jnp.arange(w_total, dtype=jnp.uint32), n)
    keys = (win_ids << c) | mag.reshape(-1)
    pt_ids = jnp.tile(jnp.arange(n, dtype=jnp.uint32), (w_total,))
    entries = (sign.reshape(-1) << 31) | pt_ids
    sorted_keys, sorted_entries = jax.lax.sort_key_val(keys, entries)

    lane_start, lane_stride, lane_count, merge_masks, src_np, keep_np, _s = (
        _bucket_grid(sorted_keys, c, w_total, 1, m_exp)
    )
    if _use_affine():
        buckets = _accumulate_buckets_af(
            sorted_entries, table, lane_start, lane_stride, lane_count,
            merge_masks, src_np, keep_np, m_exp,
        )
        return ga.to_lf(_weighted_bucket_sum_af(buckets, w_total, half))
    buckets = _accumulate_buckets(
        sorted_entries, table, lane_start, lane_stride, lane_count,
        merge_masks, src_np, keep_np, m_exp,
    )

    # weighted reduction: sum_b b*S_b via the chunked tree formulation
    return _weighted_bucket_sum(buckets, w_total, half)  # (L, W)


@functools.partial(jax.jit, static_argnames=("c",))
def msm_windows_batch(scalars_raw: jnp.ndarray, table: jnp.ndarray, c: int) -> G1LF:
    """Multi-MSM over a SHARED point table: k MSMs in one bucket pipeline.

    scalars_raw: (k, N, FR_LIMBS) uint32 standard-form limbs; table: (N, 3L).
    Returns G1LF with batch axis k*W (proof-major): lane p*W + w holds proof
    p's window-w total.

    The batch dimension rides the same one-global-sort formulation as
    `msm_windows` — the proof index joins the sort key above (window, |digit|)
    — so the k MSMs share every round's fused Pallas add across k*W*2^(c-1)
    lanes. Bucket-occupancy tails amortize across the batch: the round count
    is max occupancy over ALL proofs (≈ the single-proof count), while lane
    utilization grows k-fold — the dp-batched commitment path of
    `snark/batch.py` (BASELINE config 5).
    """
    k, n = scalars_raw.shape[0], scalars_raw.shape[1]
    w_total = _nwin(c)
    half = 1 << (c - 1)
    m_exp = k * w_total * n

    digits = jax.vmap(lambda s: signed_digits(s, c))(scalars_raw)  # (k, W, N)
    mag = jnp.abs(digits).astype(jnp.uint32)
    sign = (digits < 0).astype(jnp.uint32)

    proof_ids = jnp.repeat(jnp.arange(k, dtype=jnp.uint32), w_total * n)
    win_ids = jnp.tile(
        jnp.repeat(jnp.arange(w_total, dtype=jnp.uint32), n), (k,)
    )
    keys = (proof_ids << (c + 8)) | (win_ids << c) | mag.reshape(-1)
    pt_ids = jnp.tile(jnp.arange(n, dtype=jnp.uint32), (k * w_total,))
    entries = (sign.reshape(-1) << 31) | pt_ids
    sorted_keys, sorted_entries = jax.lax.sort_key_val(keys, entries)

    lane_start, lane_stride, lane_count, merge_masks, src_np, keep_np, _s = (
        _bucket_grid(sorted_keys, c, w_total, k, m_exp)
    )
    if _use_affine():
        buckets = _accumulate_buckets_af(
            sorted_entries, table, lane_start, lane_stride, lane_count,
            merge_masks, src_np, keep_np, m_exp,
        )
        return ga.to_lf(_weighted_bucket_sum_af(buckets, k * w_total, half))
    buckets = _accumulate_buckets(
        sorted_entries, table, lane_start, lane_stride, lane_count,
        merge_masks, src_np, keep_np, m_exp,
    )
    return _weighted_bucket_sum(buckets, k * w_total, half)  # (L, k*W)


def msm_batch_host(scalars_raw: jnp.ndarray, table: jnp.ndarray, c: int | None = None):
    """k MSMs over one table -> k host affine points (device buckets +
    per-proof host window combine)."""
    k = scalars_raw.shape[0]
    if c is None:
        c = auto_c(scalars_raw.shape[1])
    assert c + 8 + k.bit_length() <= 32, "sort key packing overflow"
    windows = msm_windows_batch(scalars_raw, table, c=c)
    w_total = _nwin(c)
    out = []
    for p in range(k):
        wp = G1LF(
            windows.x[:, p * w_total : (p + 1) * w_total],
            windows.y[:, p * w_total : (p + 1) * w_total],
            windows.z[:, p * w_total : (p + 1) * w_total],
        )
        out.append(combine_windows_host(wp, c))
    return out


def _combine_device(windows: G1LF, c: int) -> G1Points:
    """Horner window combine under jit (c doublings + 1 add per window)."""
    wp = gf.to_points(windows)  # (W, L) limbs-last
    w_total = wp.x.shape[0]

    def step(acc, tw):
        acc = jax.lax.fori_loop(0, c, lambda _, a: g1.double(a), acc)
        acc = g1.add(acc, G1Points(*tw))
        return acc, None

    rev = (wp.x[::-1], wp.y[::-1], wp.z[::-1])
    acc, _ = jax.lax.scan(step, g1.identity(()), rev)
    return acc


@functools.partial(jax.jit, static_argnames=("c",))
def msm(scalars_raw: jnp.ndarray, points: G1Points, c: int | None = None) -> G1Points:
    """MSM sum_i scalars[i] * points[i], fully on device (jittable).

    scalars_raw: (N, FR_LIMBS) uint32, standard (non-Montgomery) form.
    points: affine-encoded batch (z == 1, or z == 0 for identity fillers).
    Returns a single projective point (batch shape ()).
    """
    if c is None:
        c = auto_c(scalars_raw.shape[0])
    windows = msm_windows(scalars_raw, make_table(points), c=c)
    return _combine_device(windows, c)


def combine_windows_host(windows: G1LF, c: int):
    """Decode per-window totals and Horner-combine with host bigints."""
    from ..reference.curve import G1

    pts = gf.decode_lf(windows)  # [(x, y) | None] length W
    acc = None
    for p in reversed(pts):
        for _ in range(c):
            acc = G1.double(acc)
        acc = G1.add(acc, p)
    return acc


def msm_fast_host(scalars_raw: jnp.ndarray, table: jnp.ndarray, c: int | None = None):
    """Device bucket pipeline + host window combine -> host affine point.

    The throughput path used by the prover: the ~250-doubling window-combine
    chain costs more as sequential device dispatches than as host bigint
    math, and commitments are decoded for the Fiat-Shamir transcript anyway.
    """
    if c is None:
        c = auto_c(scalars_raw.shape[0])
    return combine_windows_host(msm_windows(scalars_raw, table, c=c), c)


def msm_host(scalars, points_affine, c: int | None = None):
    """Convenience host wrapper: python ints / host points -> host point."""
    sc = jnp.asarray(ints_to_limbs([s % params.R for s in scalars], FR_RING.L))
    pts = g1.encode_points(points_affine)
    return msm_fast_host(sc, make_table(pts), c=c)
