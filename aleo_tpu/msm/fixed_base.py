"""Fixed-base MSM with precomputed per-window shifted base tables.

Every KZG commitment in the prover is an MSM against FIXED bases — SRS
powers [tau^i]G shared across all ~19 commits of every proof (BASELINE.json
config 2 "fixed-base"; the reference's committer key inside snarkVM's
`CircuitProvingKey`, surfaced at
/root/reference/wasm/src/programs/proving_key.rs:34-42). That permits the
classic fixed-base Pippenger transformation: precompute

    Q[w, i] = 2^(c*w) * P_i          (w = 0..W-1, the window shifts)

once per SRS slice, after which an N-point MSM becomes a SINGLE-WINDOW
bucket problem over the W*N precomputed points with signed digits d[w, i]:

  * no Horner window combine (the result IS the weighted bucket sum),
  * the bucket space is 2^(c-1) buckets sub-split across `s` lanes
    (the generalization of msm.py's top-window splitting to every bucket),
    so the round count is ~E / (2^(c-1) * s) + tail for E = W*N digit
    entries — small-commit MSMs no longer sit on the occupancy-tail floor
    that made 8k-point commits run at 40-80k pts/s (BASELINE.md r4 stage
    profile),
  * zero scalars contribute zero digits, which sort into the unqueried
    mag-0 region: padding a polynomial up to the table's size class is
    nearly free (sort width only), killing the r4 pad-tail problem
    (VERDICT r4 ask #2) without a host-side tail MSM.

Round adds ride the batch-affine pipeline (curves/g1_affine.py) on the wide
lane grid; the narrow post-merge weighted reduction rides the projective
fused adds (no per-add inversion floor at small widths).

Tables build on device (c doublings per window + one batched affine
normalization via the same batch inversion) and are cached per
(SRS seed, shift, size class).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import params
from ..curves import g1, g1_affine as ga, g1_fused as gf
from ..curves.g1 import G1Points
from ..curves.g1_affine import G1AF
from ..curves.g1_fused import G1LF
from . import msm as msm_mod

NBITS = params.R.bit_length()  # 253

DEFAULT_C = 13                  # W = 20 windows, 4096 buckets
TARGET_LANES = 1 << 15          # lane-grid width the v5e add kernel saturates


def _nwin(c: int) -> int:
    return math.ceil((NBITS + 1) / c)


def _sub_split(c: int, n: int, k: int = 1) -> int:
    """Sub-lanes per bucket: fill the lane grid up to TARGET_LANES, but
    never far past the digit-entry count (lanes beyond ~2E idle every
    round)."""
    half = 1 << (c - 1)
    entries = _nwin(c) * n
    s = max(1, min(TARGET_LANES, 2 * entries) // (half * k))
    return 1 << (s.bit_length() - 1)


class FixedTable:
    """Precomputed (W*N, 2L) affine gather rows for one base slice."""

    def __init__(self, rows: jnp.ndarray, n: int, c: int):
        self.rows = rows
        self.n = n
        self.c = c
        self.w = _nwin(c)


@functools.partial(jax.jit, static_argnames=("c",))
def _dbl_chain(x, y, z, c: int):
    """2^c * P for a whole batch: c fused doublings under one jit."""
    def body(i, st):
        p = gf.double_lf(gf.G1LF(*st))
        return (p.x, p.y, p.z)

    return jax.lax.fori_loop(0, c, body, (x, y, z))


def build_table(points: G1Points, c: int = DEFAULT_C) -> FixedTable:
    """Device build: W-1 chains of c doublings + one batched to-affine.

    points: (N,) affine-encoded batch (z == 1, or z == 0 identity).
    """
    n = points.x.shape[0]
    w_total = _nwin(c)
    cur = gf.from_points(points)                     # (L, N) projective
    snaps = [cur]
    for _ in range(w_total - 1):
        cur = gf.G1LF(*_dbl_chain(cur.x, cur.y, cur.z, c))
        snaps.append(cur)
    allp = G1LF(
        jnp.concatenate([s.x for s in snaps], axis=1),
        jnp.concatenate([s.y for s in snaps], axis=1),
        jnp.concatenate([s.z for s in snaps], axis=1),
    )
    rows = _to_affine_rows(allp)
    return FixedTable(rows, n, c)


@jax.jit
def _to_affine_rows(p: G1LF) -> jnp.ndarray:
    """Projective (L, M) batch -> (M, 2L) affine gather rows with the
    (0, 0) identity sentinel (msm.make_table's row format)."""
    L, m = p.x.shape
    inf = jnp.max(p.z.astype(jnp.int32), axis=0, keepdims=True) == 0
    one = jnp.broadcast_to(jnp.asarray(ga._one_mont_np()), (L, m))
    zsafe = jnp.where(inf, one, p.z)
    if jax.default_backend() == "tpu":
        zinv = ga.batch_inv_lf(zsafe, pow2=True)
    else:
        from ..fields.modring import FQ_RING

        c = ga._consts_cpu()
        from ..fields import limb_kernels as lk

        zinv = FQ_RING.batch_inv(lk.normalize(c, zsafe).T).T
    # normalize x/z, y/z through one more fused mul each
    if jax.default_backend() == "tpu":
        ax = ga._mul_lf(p.x, zinv)
        ay = ga._mul_lf(p.y, zinv)
    else:
        from ..fields.modring import FQ_RING

        ax = FQ_RING.mul(p.x.T, zinv.T).T
        ay = FQ_RING.mul(p.y.T, zinv.T).T
    ax = jnp.where(inf, jnp.uint32(0), ax)
    ay = jnp.where(inf, jnp.uint32(0), ay)
    return jnp.concatenate([ax, ay], axis=0).T       # (M, 2L)


# -- per-SRS table cache ------------------------------------------------------

_CACHE: dict = {}


def srs_table(srs, n_pad: int, shift: int = 0, c: int = DEFAULT_C) -> FixedTable:
    """Cached fixed-base table over srs.powers[shift : shift + n_pad]."""
    key = (srs.seed, srs.max_degree, shift, n_pad, c)
    if key not in _CACHE:
        pts = G1Points(
            srs.powers.x[shift : shift + n_pad],
            srs.powers.y[shift : shift + n_pad],
            srs.powers.z[shift : shift + n_pad],
        )
        _CACHE[key] = build_table(pts, c)
    return _CACHE[key]


# -- the single-window bucket pipeline ---------------------------------------


# The pipeline is split into two jit programs on purpose: the bucket-round
# program is shaped per (size class, k) while the weighted reduction only
# depends on (k, 2^(c-1)) — so all size classes SHARE the handful of
# compiled reduction programs, and each program carries few Mosaic kernel
# shapes (cold-start compile count, VERDICT r4 weak #8). The reduction runs
# the projective fused adds: at k*half lanes the affine path's inversion
# trees would add ~20 kernel shapes per program for a marginal win.


@functools.partial(jax.jit, static_argnames=("c", "n", "k"))
def _fixed_rounds(scalars_raw: jnp.ndarray, rows: jnp.ndarray, c: int,
                  n: int, k: int) -> G1AF:
    """k MSMs over one fixed-base table -> bucket accumulators on the
    (k * 2^(c-1)) grid (sub-lanes merged).

    scalars_raw: (k, N, FR_LIMBS) uint32 standard-form limbs (N == table.n).
    """
    w_total = _nwin(c)
    half = 1 << (c - 1)
    s = _sub_split(c, n, k)
    m_exp = k * w_total * n

    digits = jax.vmap(lambda sc: msm_mod.signed_digits(sc, c))(scalars_raw)
    mag = jnp.abs(digits).astype(jnp.uint32)          # (k, W, N)
    sign = (digits < 0).astype(jnp.uint32)

    # entries index the (W*N)-row table: id = w*N + i
    proof_ids = jnp.repeat(jnp.arange(k, dtype=jnp.uint32), w_total * n)
    keys = (proof_ids << c) | mag.reshape(-1)
    tbl_ids = jnp.tile(jnp.arange(w_total * n, dtype=jnp.uint32), (k,))
    entries = (sign.reshape(-1) << 31) | tbl_ids
    sorted_keys, sorted_entries = jax.lax.sort_key_val(keys, entries)

    # lane grid: k * half * s, proof-major, bucket-major, sub-minor
    lanes = k * half * s
    iota = np.arange(lanes)
    qproof = jnp.asarray((iota // (half * s)).astype(np.uint32))
    bucket = jnp.asarray(((iota // s) % half).astype(np.uint32))
    sub = jnp.asarray((iota % s).astype(np.int32))
    qkeys = (qproof << c) | (bucket + 1)
    starts = jnp.searchsorted(sorted_keys, qkeys, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_keys, qkeys, side="right").astype(jnp.int32)
    counts = ends - starts
    lane_start = starts + sub
    lane_count = jnp.maximum(0, (counts - sub + s - 1) // s)

    # round-robin batch-affine accumulation with tail balancing
    stride = jnp.full((lanes,), s, jnp.int32)
    acc = msm_mod.run_rounds_af(
        sorted_entries, rows, lane_start, stride, lane_count, m_exp
    )

    # merge sub-lanes: log2(s) masked adds (partner = lane + d)
    d = 1
    while d < s:
        mask = ((np.arange(lanes) % (2 * d) == 0)
                & (np.arange(lanes) % s + d < s)).astype(np.uint32)
        idx = jnp.minimum(jnp.arange(lanes) + d, lanes - 1)
        partner = G1AF(acc.x[:, idx], acc.y[:, idx], acc.inf[:, idx])
        acc = ga.add_pairs(acc, partner, valid=jnp.asarray(mask))
        d *= 2
    if s > 1:
        acc = G1AF(acc.x[:, ::s], acc.y[:, ::s], acc.inf[:, ::s])
    return acc


@functools.partial(jax.jit, static_argnames=("k", "half"))
def _fixed_weighted(ax, ay, ainf, k: int, half: int) -> G1LF:
    """Weighted bucket reduction over the (k, half) grid -> G1LF batch k.

    Shared across every size class committing with the same (k, c)."""
    return msm_mod._weighted_bucket_sum(
        ga.to_lf(G1AF(ax, ay, ainf)), k, half
    )


def _fixed_windows(scalars_raw: jnp.ndarray, rows: jnp.ndarray, c: int,
                   n: int, k: int) -> G1LF:
    acc = _fixed_rounds(scalars_raw, rows, c, n, k)
    return _fixed_weighted(acc.x, acc.y, acc.inf, k, 1 << (c - 1))


def msm_fixed_host(scalars_raw: jnp.ndarray, table: FixedTable):
    """One MSM -> host affine point (device pipeline + host decode)."""
    out = _fixed_windows(scalars_raw[None], table.rows, table.c, table.n, 1)
    return gf.decode_lf(out)[0]


def msm_fixed_batch_host(scalars_raw: jnp.ndarray, table: FixedTable) -> list:
    """(k, N, L) scalars -> k host affine points, one device pipeline."""
    k = scalars_raw.shape[0]
    out = _fixed_windows(scalars_raw, table.rows, table.c, table.n, k)
    return gf.decode_lf(out)
