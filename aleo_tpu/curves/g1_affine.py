"""Batch-affine G1 accumulation: inversion-amortized affine adds on TPU.

The round-5 MSM lever (BASELINE.md lever #1; VERDICT r4 ask #1). The
projective mixed add of `g1_fused` costs 11 Montgomery muls per bucket add;
the affine chord law

    lam = (y2 - y1) / (x2 - x1)
    x3  = lam^2 - x1 - x2
    y3  = lam * (x1 - x3) - y1

costs 3 muls once the denominator inverse is known, and the inverses of a
whole lane grid are amortized with Montgomery's batch-inversion trick:
a pairwise product tree down to 256 lanes (1 mul/lane), ONE fused Fermat
ladder kernel at the root width (~0.9 mul/lane amortized at 81920 lanes),
and a pushdown (2 muls/lane) — ~7 muls per add total, all squarings and
tree levels included, vs 11 for the projective mixed add.

The affine law is incomplete; completeness is restored with selects inside
the same fused kernels (no data-dependent control flow):

  * acc identity            -> result = +-P      (case TAKE)
  * P identity/invalid lane -> result = acc      (case KEEP)
  * x1 == x2, y1 == y2      -> tangent law: lam = 3 x1^2 / (2 y1)
                               (same x3/y3 formulas; case FORMULA)
  * x1 == x2, y1 == -y2     -> result = identity (case IDENT)

Degenerate lanes feed the batch inversion a 1 so one lane's zero can never
poison the shared product tree. Equality checks are done on lazy-domain
(< 2p) differences by testing against both representatives {0, p}.

Accumulators are `G1AF(x, y, inf)`: (L, M) uint32 16-bit Montgomery limb
coordinates (lazy < 2p) plus a (1, M) identity-flag row — one coordinate
less HBM traffic per round than the projective accumulator.

Backends: on TPU the prepare/apply/tree-mul/Fermat steps are Pallas kernels
over `fields.limb_kernels` bodies; off-TPU the same algorithm runs through
the einsum ring of `fields.modring` (XLA:CPU compiles the limb bodies far
too slowly), so the CPU test suite exercises the identical case analysis.

Reference behavior: snarkvm-algorithms MSM bucket accumulation
(/root/reference/Cargo.lock:2200-2229); the batch-affine trick itself is
the standard Pippenger optimization the reference gets from arkworks'
`batch_addition`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import limb_kernels as lk

DEFAULT_TILE = 512
_MIN_PAD = 5120
FERMAT_W = 128      # product-tree root width (one fused Fermat ladder kernel)

# case codes (uint32 rows)
CASE_KEEP = 0       # result = acc (invalid lane / P identity / both identity)
CASE_FORMULA = 1    # result = chord/tangent formula
CASE_IDENT = 2      # result = identity (P == -acc)
CASE_TAKE = 3       # result = +-P (acc was identity)


class G1AF(NamedTuple):
    """Affine G1 batch, limbs-first: coords (L, M) uint32 lazy < 2p,
    inf (1, M) uint32 in {0, 1}."""

    x: jnp.ndarray
    y: jnp.ndarray
    inf: jnp.ndarray

    @property
    def n(self):
        return self.x.shape[1]


def _use_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _fq():
    return lk.get_fq()


def identity_af(m: int) -> G1AF:
    L = _fq().L
    return G1AF(
        jnp.zeros((L, m), jnp.uint32),
        jnp.zeros((L, m), jnp.uint32),
        jnp.ones((1, m), jnp.uint32),
    )


@functools.lru_cache(maxsize=None)
def _one_mont_np():
    # host-int derivation (R mod p as 16-bit limbs): importing modring here
    # could run its module-level jnp ops inside an active trace
    ring = _fq()
    return np.ascontiguousarray(
        lk._int_to_limbs_np(ring.R % ring.p, ring.L)[:, None]
    )


@functools.lru_cache(maxsize=None)
def _q_hex_digits() -> tuple:
    """Base-16 digits of Q-2, MSB first (the Fermat inversion exponent)."""
    from .. import params

    e = params.Q - 2
    digits = []
    while e:
        digits.append(e & 0xF)
        e >>= 4
    return tuple(reversed(digits))


# ---------------------------------------------------------------------------
# kernel bodies (pure jnp; `c` = unpacked consts dict)
# ---------------------------------------------------------------------------


def _iszero_mod_p(c, v):
    """(L, T) lazy < 2p value -> (1, T) bool: v == 0 (mod p).

    v < 2p has representatives {0, p} for zero; test both limb patterns.
    int32 casts: Mosaic has no unsigned reductions.
    """
    p_row = c["p"]
    eq0 = jnp.max(v.astype(jnp.int32), axis=0, keepdims=True) == 0
    eqp = jnp.max((v ^ p_row).astype(jnp.int32), axis=0, keepdims=True) == 0
    return eq0 | eqp


def _prepare_body(c, one, x1, y1, inf1, x2, y2, inf2, sign, valid):
    """Denominator/numerator/case for one batched affine add.

    Returns (d, num, case): d is 1 on every non-FORMULA lane so the shared
    batch-inversion tree never sees a zero.
    """
    y2n = jnp.where(sign != 0, lk.neg(c, y2), y2)
    dx = lk.sub(c, x2, x1)
    dy = lk.sub(c, y2n, y1)
    xeq = _iszero_mod_p(c, dx)
    yeq = _iszero_mod_p(c, dy)
    active = (valid != 0) & (inf1 == 0) & (inf2 == 0)
    is_dbl = xeq & yeq & active
    is_cancel = xeq & (~yeq) & active
    use = active & (~is_cancel)
    # tangent-law operands (computed on every lane; selected where needed)
    num_dbl = lk.mul3(c, lk.mont_sq(c, x1))        # 3 x1^2
    den_dbl = lk.add(c, y1, y1)                    # 2 y1
    d = jnp.where(is_dbl, den_dbl, dx)
    num = jnp.where(is_dbl, num_dbl, dy)
    d = jnp.where(use, d, one)
    case = jnp.where(use, jnp.uint32(CASE_FORMULA), jnp.uint32(CASE_KEEP))
    case = jnp.where(is_cancel, jnp.uint32(CASE_IDENT), case)
    take = (inf1 != 0) & (valid != 0) & (inf2 == 0)
    case = jnp.where(take, jnp.uint32(CASE_TAKE), case)
    return d, num, case


def _apply_body(c, x1, y1, inf1, x2, y2, sign, case, num, inv):
    """Finish the add with the batch-inverted denominators."""
    lam = lk.mont_mul(c, num, inv)
    x3 = lk.sub(c, lk.sub(c, lk.mont_sq(c, lam), x1), x2)
    y3 = lk.sub(c, lk.mont_mul(c, lam, lk.sub(c, x1, x3)), y1)
    y2n = jnp.where(sign != 0, lk.neg(c, y2), y2)
    is_f = case == CASE_FORMULA
    is_t = case == CASE_TAKE
    ox = jnp.where(is_f, x3, jnp.where(is_t, x2, x1))
    oy = jnp.where(is_f, y3, jnp.where(is_t, y2n, y1))
    oinf = jnp.where(
        is_f | is_t, jnp.uint32(0),
        jnp.where(case == CASE_IDENT, jnp.uint32(1), inf1),
    )
    return ox, oy, oinf


def _fermat_body(c, x):
    """x^(Q-2) by a 4-bit-window ladder (~475 fused Montgomery muls).

    Montgomery in/out: mont(aR)^(Q-2)-chains yield a^(Q-2) R — the
    Montgomery form of the inverse directly.
    """
    t = [None] * 16
    t[1] = x
    for i in range(2, 16):
        t[i] = lk.mont_mul(c, t[i - 1], x)
    digits = _q_hex_digits()
    acc = t[digits[0]]
    for dgt in digits[1:]:
        for _ in range(4):
            acc = lk.mont_sq(c, acc)
        if dgt:
            acc = lk.mont_mul(c, acc, t[dgt])
    return acc


# ---------------------------------------------------------------------------
# pallas_call builders
# ---------------------------------------------------------------------------


def _coord_spec(tile):
    return pl.BlockSpec((_fq().L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)


def _flag_spec(tile):
    return pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)


def _const_spec(tile):
    ring = _fq()
    return pl.BlockSpec(
        (ring.n_const_rows, tile), lambda i: (0, 0), memory_space=pltpu.VMEM
    )


@functools.lru_cache(maxsize=None)
def _build_prepare(m_padded: int, tile: int):
    ring = _fq()
    L = ring.L

    def kernel(c_ref, one_ref, x1, y1, if1, x2, y2, if2, sg, vd, od, onum, ocase):
        c = ring.unpack_consts(c_ref[:])
        d, num, case = _prepare_body(
            c, one_ref[:], x1[:], y1[:], if1[:], x2[:], y2[:], if2[:],
            sg[:], vd[:],
        )
        od[:] = d
        onum[:] = num
        ocase[:] = case

    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((L, m_padded), jnp.uint32),
            jax.ShapeDtypeStruct((L, m_padded), jnp.uint32),
            jax.ShapeDtypeStruct((1, m_padded), jnp.uint32),
        ),
        grid=(m_padded // tile,),
        in_specs=[_const_spec(tile), _coord_spec(tile)]
        + [_coord_spec(tile), _coord_spec(tile), _flag_spec(tile)] * 2
        + [_flag_spec(tile)] * 2,
        out_specs=(_coord_spec(tile), _coord_spec(tile), _flag_spec(tile)),
    )
    consts = ring.const_block(tile)
    one = np.broadcast_to(_one_mont_np(), (L, tile)).copy()
    return call, consts, one


@functools.lru_cache(maxsize=None)
def _build_apply(m_padded: int, tile: int):
    ring = _fq()
    L = ring.L

    def kernel(c_ref, x1, y1, if1, x2, y2, sg, case, num, inv, ox, oy, oinf):
        c = ring.unpack_consts(c_ref[:])
        rx, ry, rinf = _apply_body(
            c, x1[:], y1[:], if1[:], x2[:], y2[:], sg[:], case[:],
            num[:], inv[:],
        )
        ox[:] = rx
        oy[:] = ry
        oinf[:] = rinf

    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((L, m_padded), jnp.uint32),
            jax.ShapeDtypeStruct((L, m_padded), jnp.uint32),
            jax.ShapeDtypeStruct((1, m_padded), jnp.uint32),
        ),
        grid=(m_padded // tile,),
        in_specs=[_const_spec(tile)]
        + [_coord_spec(tile), _coord_spec(tile), _flag_spec(tile)]
        + [_coord_spec(tile), _coord_spec(tile), _flag_spec(tile), _flag_spec(tile)]
        + [_coord_spec(tile), _coord_spec(tile)],
        out_specs=(_coord_spec(tile), _coord_spec(tile), _flag_spec(tile)),
    )
    return call, ring.const_block(tile)


@functools.lru_cache(maxsize=None)
def _build_mul(m_padded: int, tile: int):
    """Generic full-width fused Montgomery mul (the inversion-tree workhorse)."""
    ring = _fq()
    L = ring.L

    def kernel(c_ref, a, b, o):
        c = ring.unpack_consts(c_ref[:])
        o[:] = lk.mont_mul(c, a[:], b[:])

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, m_padded), jnp.uint32),
        grid=(m_padded // tile,),
        in_specs=[_const_spec(tile), _coord_spec(tile), _coord_spec(tile)],
        out_specs=_coord_spec(tile),
    )
    return call, ring.const_block(tile)


@functools.lru_cache(maxsize=None)
def _build_fermat(width: int):
    ring = _fq()
    L = ring.L

    def kernel(c_ref, x, o):
        c = ring.unpack_consts(c_ref[:])
        o[:] = _fermat_body(c, x[:])

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, width), jnp.uint32),
        grid=(1,),
        in_specs=[_const_spec(width), _coord_spec(width)],
        out_specs=_coord_spec(width),
    )
    return call, ring.const_block(width)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_size(m: int, tile: int) -> int:
    if m <= _MIN_PAD:
        return min(_MIN_PAD, _round_up(m, tile))
    return _round_up(m, tile)


def _pad_coord(a, m_padded, fill: int = 0):
    m = a.shape[1]
    if m == m_padded:
        return a
    pad = jnp.full((a.shape[0], m_padded - m), jnp.uint32(fill))
    return jnp.concatenate([a, pad], axis=1)


def _pad_one(a, m_padded):
    """Pad a coordinate array with Montgomery 1 columns (inversion-safe)."""
    m = a.shape[1]
    if m == m_padded:
        return a
    one = jnp.broadcast_to(
        jnp.asarray(_one_mont_np()), (a.shape[0], m_padded - m)
    )
    return jnp.concatenate([a, one], axis=1)


# ---------------------------------------------------------------------------
# batch inversion
# ---------------------------------------------------------------------------


def _mul_lf(a, b):
    """Elementwise Montgomery product via the fused kernel (tree levels)."""
    m = a.shape[1]
    tile = min(DEFAULT_TILE, _round_up(m, 128))
    mp = _round_up(m, tile)
    call, consts = _build_mul(mp, tile)
    out = call(consts, _pad_one(a, mp), _pad_one(b, mp))
    return out[:, :m]


def batch_inv_lf(d: jnp.ndarray, pow2: bool = False) -> jnp.ndarray:
    """Elementwise modular inverse of (L, M) lazy Montgomery values.

    Pairwise product tree to <= FERMAT_W lanes, one fused Fermat-ladder
    kernel at the root, pushdown. All lanes MUST be nonzero mod p (the
    prepare kernel guarantees this with its CASE analysis). ~3 muls/lane
    plus the amortized root ladder.

    pow2=True pads the width to a power of two first so the halving tree
    only touches power-of-two widths — callers with many one-off widths
    (the fixed-base table builds) use it to bound the Mosaic kernel-shape
    count; the hot MSM round path keeps exact widths (zero padded work,
    few shapes).

    Half-split pairing (parent[i] = lo[i] * hi[i] with lo/hi the two
    contiguous halves): every slice and the pushdown concatenate are
    contiguous on the lane axis — strided even/odd pairing costs a
    cross-lane shuffle per level on TPU.
    """
    L, m = d.shape
    if not _use_tpu():
        return _batch_inv_cpu(d)
    levels = []
    cur = d
    if pow2:
        m2 = 1 << max(FERMAT_W.bit_length() - 1, (m - 1).bit_length())
        cur = _pad_one(cur, m2)
    while cur.shape[1] > FERMAT_W:
        w = cur.shape[1]
        if w % 2:
            cur = _pad_one(cur, w + 1)
        half = cur.shape[1] // 2
        a, b = cur[:, :half], cur[:, half:]
        levels.append((a, b))
        cur = _mul_lf(a, b)
    rw = cur.shape[1]
    call, consts = _build_fermat(FERMAT_W)
    inv = call(consts, _pad_one(cur, FERMAT_W))[:, :rw]
    for a, b in reversed(levels):
        # child inverses [lo_inv | hi_inv] = [parent_inv*b | parent_inv*a]
        # in ONE fused mul at the children's width
        inv = _mul_lf(
            jnp.concatenate([inv, inv], axis=1),
            jnp.concatenate([b, a], axis=1),
        )
    return inv[:, :m]


def _batch_inv_cpu(d: jnp.ndarray) -> jnp.ndarray:
    """CPU backend: einsum-ring batch inversion (modring.batch_inv) on the
    transposed layout. Canonicalizes lazy inputs first."""
    from ..fields.modring import FQ_RING

    c = _consts_cpu()
    dn = lk.normalize(c, d)
    return FQ_RING.batch_inv(dn.T).T


@functools.lru_cache(maxsize=None)
def _consts_cpu():
    ring = _fq()
    return {k: np.ascontiguousarray(v[:, None]) for k, v in ring.rows.items()}


# ---------------------------------------------------------------------------
# public add
# ---------------------------------------------------------------------------


def madd(acc: G1AF, px, py, pinf, sign, valid, tile: int = DEFAULT_TILE) -> G1AF:
    """acc (+)= (sign ? -P : P) where valid, complete affine law.

    px/py: (L, M) addend coords (canonical or lazy Montgomery); pinf,
    sign, valid: (1, M) or (M,) uint32 rows.
    """
    m = acc.x.shape[1]
    pinf = pinf.reshape(1, -1).astype(jnp.uint32)
    sign = sign.reshape(1, -1).astype(jnp.uint32)
    valid = valid.reshape(1, -1).astype(jnp.uint32)
    if not _use_tpu():
        return _madd_cpu(acc, px, py, pinf, sign, valid)
    mp = _pad_size(m, tile)
    pcall, pconsts, pone = _build_prepare(mp, tile)
    x1, y1 = _pad_coord(acc.x, mp), _pad_coord(acc.y, mp)
    if1 = _pad_coord(acc.inf, mp, fill=1)
    x2, y2 = _pad_coord(px, mp), _pad_coord(py, mp)
    if2 = _pad_coord(pinf, mp, fill=1)
    sg = _pad_coord(sign, mp)
    vd = _pad_coord(valid, mp)
    d, num, case = pcall(pconsts, pone, x1, y1, if1, x2, y2, if2, sg, vd)
    # padded lanes carry d = 1 (valid = 0 -> CASE_KEEP), so the inversion
    # tree runs straight on the padded width
    inv = batch_inv_lf(d)
    acall, aconsts = _build_apply(mp, tile)
    ox, oy, oinf = acall(aconsts, x1, y1, if1, x2, y2, sg, case, num, inv)
    return G1AF(ox[:, :m], oy[:, :m], oinf[:, :m])


def _madd_cpu(acc: G1AF, px, py, pinf, sign, valid) -> G1AF:
    """Same case analysis through the einsum ring (limbs-last internally)."""
    from ..fields.modring import FQ_RING as F

    c = _consts_cpu()
    x1 = lk.normalize(c, acc.x).T
    y1 = lk.normalize(c, acc.y).T
    x2 = lk.normalize(c, px).T
    y2 = lk.normalize(c, py).T
    sg = sign.reshape(-1).astype(bool)
    y2 = F.select(sg, F.neg(y2), y2)
    inf1 = acc.inf.reshape(-1).astype(bool)
    inf2 = pinf.reshape(-1).astype(bool)
    vd = valid.reshape(-1).astype(bool)
    dx = F.sub(x2, x1)
    dy = F.sub(y2, y1)
    xeq = F.is_zero(dx)
    yeq = F.is_zero(dy)
    active = vd & ~inf1 & ~inf2
    is_dbl = xeq & yeq & active
    is_cancel = xeq & ~yeq & active
    use = active & ~is_cancel
    d = F.select(is_dbl, F.double(y1), dx)
    num = F.select(is_dbl, F.mul_small(F.sq(x1), 3), dy)
    one = jnp.broadcast_to(F.one_mont, d.shape)
    d = F.select(use, d, one)
    inv = F.batch_inv(d)
    lam = F.mul(num, inv)
    x3 = F.sub(F.sub(F.sq(lam), x1), x2)
    y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)
    take = inf1 & vd & ~inf2
    ox = F.select(use, x3, F.select(take, x2, x1))
    oy = F.select(use, y3, F.select(take, y2, y1))
    oinf = jnp.where(
        use | take, jnp.uint32(0),
        jnp.where(is_cancel, jnp.uint32(1), inf1.astype(jnp.uint32)),
    )
    return G1AF(ox.T, oy.T, oinf[None, :])


def add_pairs(a: G1AF, b: G1AF, valid=None) -> G1AF:
    """a (+)= b for two affine accumulator batches (masked when valid given).

    a + a lanes resolve to the tangent law automatically (dx == 0, dy == 0)
    — doubling chains reuse this entry point.
    """
    m = a.x.shape[1]
    if valid is None:
        valid = jnp.ones((1, m), jnp.uint32)
    sign = jnp.zeros((1, m), jnp.uint32)
    return madd(a, b.x, b.y, b.inf, sign, valid)


def double_af(a: G1AF) -> G1AF:
    return add_pairs(a, a)


# ---------------------------------------------------------------------------
# layout converters
# ---------------------------------------------------------------------------


def to_lf(p: G1AF):
    """Affine batch -> projective G1LF (z = 0 on identity lanes, 1 else)."""
    from . import g1_fused as gf

    L, m = p.x.shape
    inf = p.inf.reshape(1, -1) != 0
    one = jnp.broadcast_to(jnp.asarray(_one_mont_np()), (L, m))
    z = jnp.where(inf, jnp.uint32(0), one)
    zero = jnp.zeros((L, m), jnp.uint32)
    return gf.G1LF(
        jnp.where(inf, zero, p.x), jnp.where(inf, one, p.y), z
    )


def decode_af(p: G1AF):
    """Device batch -> host affine [(x, y) | None]."""
    from .. import params
    from ..fields.modring import FQ_RING, limbs_to_ints

    rinv = pow(FQ_RING.R_mod, -1, params.Q)
    L = p.x.shape[0]
    # one device->host transfer for both coordinate planes + flags
    stacked = np.asarray(jnp.concatenate(
        [p.x, p.y, jnp.broadcast_to(p.inf, (1, p.x.shape[1]))], axis=0
    ))
    xs = limbs_to_ints(stacked[:L].T)
    ys = limbs_to_ints(stacked[L : 2 * L].T)
    infs = stacked[2 * L]
    out = []
    for x, y, i in zip(xs, ys, infs):
        if i:
            out.append(None)
        else:
            out.append(
                ((int(x) * rinv) % params.Q, (int(y) * rinv) % params.Q)
            )
    return out
