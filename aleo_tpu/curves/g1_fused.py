"""Fused G1 (BLS12-377) group-law Pallas kernels, limbs-first layout.

TPU-native replacement for snarkvm-curves' G1 ops (SURVEY.md §2.8 item 2)
on the MSM/commitment hot path. One kernel invocation performs a complete
Renes-Costello-Batina 2016 projective addition (Algorithm 7, a=0, b3=3) or
doubling (Algorithm 9) for a whole batch tile: all 12 (resp. 8) Montgomery
multiplications and the carry chains stay in VMEM, where the XLA elementwise
path of `curves/g1.py` would round-trip HBM ~40x per point-add.

Point batches are `G1LF(x, y, z)` with each coordinate a (24, M) uint32
array of 16-bit Montgomery limbs (batch on the TPU lane axis). Values are
kept in the lazy < 2p domain of `fields.limb_kernels`; `normalize_lf`
produces canonical limbs at batch boundaries.

Falls back to `interpret=True` off-TPU so the same code path is exercised
by the CPU-mesh test suite.
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


class G1LF(NamedTuple):
    """Projective G1 batch, limbs-first: each coord (24, M) uint32."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    @property
    def n(self):
        return self.x.shape[1]


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fq():
    return lk.get_fq()


@functools.lru_cache(maxsize=None)
def _consts_direct():
    """Constants as (L, 1) rows for the non-Pallas (plain XLA) path.

    Off-TPU the kernel bodies run directly as jnp over the full arrays —
    Mosaic's interpreter is far too slow to build for the CPU test mesh,
    and the bodies are pure jnp anyway.
    """
    ring = _fq()
    # numpy (not jnp) so the cached rows never capture a trace context;
    # they enter each traced graph as fresh constants.
    return {k: np.ascontiguousarray(v[:, None]) for k, v in ring.rows.items()}


# ---------------------------------------------------------------------------
# kernel bodies (traced with values; `c` = unpacked consts dict)
# ---------------------------------------------------------------------------


def _add_body(c, x1, y1, z1, x2, y2, z2):
    """RCB16 Algorithm 7 (a=0, b3=3). Mirrors curves/g1.py:add."""
    mul = functools.partial(lk.mont_mul, c)
    add = functools.partial(lk.add, c)
    sub = functools.partial(lk.sub, c)
    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t2 = mul(z1, z2)
    m3 = mul(add(x1, y1), add(x2, y2))
    m4 = mul(add(y1, z1), add(y2, z2))
    m5 = mul(add(x1, z1), add(x2, z2))
    t3 = sub(m3, add(t0, t1))
    t4 = sub(m4, add(t1, t2))
    y3 = sub(m5, add(t0, t2))
    t0 = lk.mul3(c, t0)
    t2 = lk.mul3(c, t2)  # b3 * t2
    z3 = add(t1, t2)
    t1 = sub(t1, t2)
    y3 = lk.mul3(c, y3)  # b3 * y3
    a = mul(t4, y3)
    b = mul(t3, t1)
    cc = mul(y3, t0)
    d = mul(t1, z3)
    e = mul(t0, t3)
    f = mul(z3, t4)
    return sub(b, a), add(d, cc), add(f, e)


def _double_body(c, x, y, z):
    """RCB16 Algorithm 9 (a=0, b3=3). Mirrors curves/g1.py:double."""
    mul = functools.partial(lk.mont_mul, c)
    add = functools.partial(lk.add, c)
    sub = functools.partial(lk.sub, c)
    t0 = mul(y, y)
    t1 = mul(y, z)
    t2 = mul(z, z)
    txy = mul(x, y)
    z3 = add(t0, t0)
    z3 = add(z3, z3)
    z3 = add(z3, z3)
    t2 = lk.mul3(c, t2)  # b3 z^2
    y3 = add(t0, t2)
    t2three = lk.mul3(c, t2)
    t0 = sub(t0, t2three)
    x3m = mul(t2, z3)
    z3m = mul(t1, z3)
    y3m = mul(t0, y3)
    xt = mul(t0, txy)
    y3 = add(x3m, y3m)
    x3 = add(xt, xt)
    return x3, y3, z3m


def _madd_body(c, x1, y1, z1, x2, y2):
    """RCB16 Algorithm 8 (complete mixed addition, a=0, b3=3, Z2=1).

    One fewer Montgomery mul than the full addition and no Z2 operand —
    the Pippenger bucket stream always adds affine table points.
    """
    mul = functools.partial(lk.mont_mul, c)
    add = functools.partial(lk.add, c)
    sub = functools.partial(lk.sub, c)
    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t3 = mul(add(x2, y2), add(x1, y1))
    t3 = sub(t3, add(t0, t1))
    t4 = add(mul(y2, z1), y1)
    y3 = add(mul(x2, z1), x1)
    x3 = add(t0, t0)
    t0 = add(x3, t0)
    t2 = lk.mul3(c, z1)            # b3 * Z1
    z3 = add(t1, t2)
    t1 = sub(t1, t2)
    y3 = lk.mul3(c, y3)            # b3 * Y3
    x3 = mul(t4, y3)
    t2 = mul(t3, t1)
    x3 = sub(t2, x3)
    y3 = mul(y3, t0)
    t1m = mul(t1, z3)
    y3 = add(t1m, y3)
    t0 = mul(t0, t3)
    z3 = mul(z3, t4)
    z3 = add(z3, t0)
    return x3, y3, z3


def _add_sel_body(c, x1, y1, z1, x2, y2, sign, valid):
    """acc (+)= (sign ? -P : P) where valid, else acc unchanged; P affine.

    sign/valid are (1, T) uint32 rows broadcast over limbs; the negate and
    the final select fuse into the same VMEM-resident kernel as the add.
    P == (0, 0) is the identity sentinel (msm.make_table) and is masked
    like an invalid lane (checked BEFORE the negate: neg(0) = 2p != 0).
    """
    # int32 cast: Mosaic has no unsigned reductions (limbs are 16-bit)
    p_ident = jnp.max(y2.astype(jnp.int32), axis=0, keepdims=True) == 0
    y2n = jnp.where(sign != 0, lk.neg(c, y2), y2)
    rx, ry, rz = _madd_body(c, x1, y1, z1, x2, y2n)
    keep = (valid != 0) & ~p_ident
    return (
        jnp.where(keep, rx, x1),
        jnp.where(keep, ry, y1),
        jnp.where(keep, rz, z1),
    )


# ---------------------------------------------------------------------------
# pallas_call builders (cached per padded size)
# ---------------------------------------------------------------------------


def _coord_spec(tile):
    return pl.BlockSpec((_fq().L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)


def _const_spec(tile):
    ring = _fq()
    return pl.BlockSpec(
        (ring.n_const_rows, tile), lambda i: (0, 0), memory_space=pltpu.VMEM
    )


@functools.lru_cache(maxsize=None)
def _build_add(m_padded: int, tile: int, interpret: bool):
    ring = _fq()
    L = ring.L

    def kernel(c_ref, x1, y1, z1, x2, y2, z2, ox, oy, oz):
        c = ring.unpack_consts(c_ref[:])
        rx, ry, rz = _add_body(
            c, x1[:], y1[:], z1[:], x2[:], y2[:], z2[:]
        )
        ox[:] = rx
        oy[:] = ry
        oz[:] = rz

    call = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, m_padded), jnp.uint32) for _ in range(3)
        ),
        grid=(m_padded // tile,),
        in_specs=[_const_spec(tile)] + [_coord_spec(tile)] * 6,
        out_specs=(_coord_spec(tile),) * 3,
        interpret=interpret,
    )
    # numpy, not jnp: this cache must never capture a trace context
    consts = ring.const_block(tile)
    return call, consts


def _flag_spec(tile):
    return pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _build_add_sel(m_padded: int, tile: int, interpret: bool):
    ring = _fq()
    L = ring.L

    def kernel(c_ref, x1, y1, z1, x2, y2, sg, vd, ox, oy, oz):
        c = ring.unpack_consts(c_ref[:])
        rx, ry, rz = _add_sel_body(
            c, x1[:], y1[:], z1[:], x2[:], y2[:], sg[:], vd[:]
        )
        ox[:] = rx
        oy[:] = ry
        oz[:] = rz

    call = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, m_padded), jnp.uint32) for _ in range(3)
        ),
        grid=(m_padded // tile,),
        in_specs=[_const_spec(tile)] + [_coord_spec(tile)] * 5 + [_flag_spec(tile)] * 2,
        out_specs=(_coord_spec(tile),) * 3,
        interpret=interpret,
    )
    # numpy, not jnp: this cache must never capture a trace context
    consts = ring.const_block(tile)
    return call, consts


def add_sel_lf(
    acc: G1LF, px, py, sign: jnp.ndarray, valid: jnp.ndarray, tile: int = DEFAULT_TILE
) -> G1LF:
    """Masked accumulate: acc + (sign ? -p : p) where valid else acc.

    p = (px, py) AFFINE limbs-first (L, M) — the table points of the
    Pippenger bucket stream are affine, so the round primitive is the
    mixed complete addition (one fewer mul, one fewer coordinate gather).
    sign, valid: (M,) uint32/bool.
    """
    m = acc.x.shape[1]
    if _use_interpret():
        g1 = _g1_xla()
        a = to_points(acc)
        one = identity_lf(m).y
        ident = jnp.all(py == 0, axis=0)           # (0,0) identity sentinel
        qz = jnp.where(ident[:, None], jnp.uint32(0), one.T)
        q = _g1_xla().G1Points(px.T, py.T, qz)
        qn = g1.select(sign.astype(bool), g1.neg(q), q)
        keep = valid.astype(bool) & ~ident
        return from_points(g1.select(keep, g1.add(a, qn), a))
    mp = _pad_size(m, tile)
    call, consts = _build_add_sel(mp, tile, False)
    sg = _pad_coord(sign.astype(jnp.uint32)[None, :], mp)
    vd = _pad_coord(valid.astype(jnp.uint32)[None, :], mp)
    args = [_pad_coord(a, mp) for a in (acc.x, acc.y, acc.z, px, py)]
    rx, ry, rz = call(consts, *args, sg, vd)
    return G1LF(rx[:, :m], ry[:, :m], rz[:, :m])


@functools.lru_cache(maxsize=None)
def _build_add_sel_proj(m_padded: int, tile: int, interpret: bool):
    ring = _fq()
    L = ring.L

    def kernel(c_ref, x1, y1, z1, x2, y2, z2, sg, vd, ox, oy, oz):
        c = ring.unpack_consts(c_ref[:])
        y2n = jnp.where(sg[:] != 0, lk.neg(c, y2[:]), y2[:])
        rx, ry, rz = _add_body(c, x1[:], y1[:], z1[:], x2[:], y2n, z2[:])
        keep = vd[:] != 0
        ox[:] = jnp.where(keep, rx, x1[:])
        oy[:] = jnp.where(keep, ry, y1[:])
        oz[:] = jnp.where(keep, rz, z1[:])

    call = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, m_padded), jnp.uint32) for _ in range(3)
        ),
        grid=(m_padded // tile,),
        in_specs=[_const_spec(tile)] + [_coord_spec(tile)] * 6 + [_flag_spec(tile)] * 2,
        out_specs=(_coord_spec(tile),) * 3,
        interpret=interpret,
    )
    consts = ring.const_block(tile)
    return call, consts


def add_sel_proj_lf(
    acc: G1LF, p: G1LF, sign: jnp.ndarray, valid: jnp.ndarray,
    tile: int = DEFAULT_TILE,
) -> G1LF:
    """Masked accumulate with a PROJECTIVE addend (full complete add) —
    the top-window sub-accumulator merge, where both sides are bucket
    accumulators."""
    m = acc.x.shape[1]
    if _use_interpret():
        g1 = _g1_xla()
        a, q = to_points(acc), to_points(p)
        qn = g1.select(sign.astype(bool), g1.neg(q), q)
        return from_points(g1.select(valid.astype(bool), g1.add(a, qn), a))
    mp = _pad_size(m, tile)
    call, consts = _build_add_sel_proj(mp, tile, False)
    sg = _pad_coord(sign.astype(jnp.uint32)[None, :], mp)
    vd = _pad_coord(valid.astype(jnp.uint32)[None, :], mp)
    args = [_pad_coord(a, mp) for a in (acc.x, acc.y, acc.z, p.x, p.y, p.z)]
    rx, ry, rz = call(consts, *args, sg, vd)
    return G1LF(rx[:, :m], ry[:, :m], rz[:, :m])


@functools.lru_cache(maxsize=None)
def _build_double(m_padded: int, tile: int, interpret: bool):
    ring = _fq()
    L = ring.L

    def kernel(c_ref, x, y, z, ox, oy, oz):
        c = ring.unpack_consts(c_ref[:])
        rx, ry, rz = _double_body(c, x[:], y[:], z[:])
        ox[:] = rx
        oy[:] = ry
        oz[:] = rz

    call = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, m_padded), jnp.uint32) for _ in range(3)
        ),
        grid=(m_padded // tile,),
        in_specs=[_const_spec(tile)] + [_coord_spec(tile)] * 3,
        out_specs=(_coord_spec(tile),) * 3,
        interpret=interpret,
    )
    # numpy, not jnp: this cache must never capture a trace context
    consts = ring.const_block(tile)
    return call, consts


@functools.lru_cache(maxsize=None)
def _build_normalize(m_padded: int, tile: int, interpret: bool):
    ring = _fq()
    L = ring.L

    def kernel(c_ref, x, y, z, ox, oy, oz):
        c = ring.unpack_consts(c_ref[:])
        ox[:] = lk.normalize(c, x[:])
        oy[:] = lk.normalize(c, y[:])
        oz[:] = lk.normalize(c, z[:])

    call = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, m_padded), jnp.uint32) for _ in range(3)
        ),
        grid=(m_padded // tile,),
        in_specs=[_const_spec(tile)] + [_coord_spec(tile)] * 3,
        out_specs=(_coord_spec(tile),) * 3,
        interpret=interpret,
    )
    # numpy, not jnp: this cache must never capture a trace context
    consts = ring.const_block(tile)
    return call, consts


# size bucketing: few distinct kernel shapes => few Mosaic compiles
_MIN_PAD = 5120


def _pad_size(m: int, tile: int) -> int:
    if m <= _MIN_PAD:
        return min(_MIN_PAD, _round_up(m, tile))
    return _round_up(m, tile)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_coord(a, m_padded):
    m = a.shape[1]
    if m == m_padded:
        return a
    return jnp.concatenate(
        [a, jnp.zeros((a.shape[0], m_padded - m), a.dtype)], axis=1
    )


def _g1_xla():
    from . import g1

    return g1


def add_lf(p: G1LF, q: G1LF, tile: int = DEFAULT_TILE) -> G1LF:
    """Complete projective addition, batched. Inputs/outputs < 2p.

    Off-TPU this routes through the einsum-based `curves.g1` ops (compact
    XLA graphs, < p canonical — a subset of the < 2p lazy domain), because
    both Mosaic-interpret and the inlined limb-convolution bodies are far
    too slow for XLA CPU to compile at test sizes.
    """
    m = p.x.shape[1]
    if _use_interpret():
        g1 = _g1_xla()
        return from_points(g1.add(to_points(p), to_points(q)))
    mp = _pad_size(m, tile)
    call, consts = _build_add(mp, tile, False)
    args = [
        _pad_coord(a, mp) for a in (p.x, p.y, p.z, q.x, q.y, q.z)
    ]
    rx, ry, rz = call(consts, *args)
    return G1LF(rx[:, :m], ry[:, :m], rz[:, :m])


def double_lf(p: G1LF, tile: int = DEFAULT_TILE) -> G1LF:
    m = p.x.shape[1]
    if _use_interpret():
        g1 = _g1_xla()
        return from_points(g1.double(to_points(p)))
    mp = _pad_size(m, tile)
    call, consts = _build_double(mp, tile, False)
    args = [_pad_coord(a, mp) for a in (p.x, p.y, p.z)]
    rx, ry, rz = call(consts, *args)
    return G1LF(rx[:, :m], ry[:, :m], rz[:, :m])


def normalize_lf(p: G1LF, tile: int = DEFAULT_TILE) -> G1LF:
    """Reduce all coordinates to canonical (< p) form."""
    m = p.x.shape[1]
    if _use_interpret():
        c = _consts_direct()
        return G1LF(
            lk.normalize(c, p.x), lk.normalize(c, p.y), lk.normalize(c, p.z)
        )
    mp = _pad_size(m, tile)
    call, consts = _build_normalize(mp, tile, False)
    args = [_pad_coord(a, mp) for a in (p.x, p.y, p.z)]
    rx, ry, rz = call(consts, *args)
    return G1LF(rx[:, :m], ry[:, :m], rz[:, :m])


# ---------------------------------------------------------------------------
# layout converters / host IO
# ---------------------------------------------------------------------------


def select_lf(cond, p: G1LF, q: G1LF) -> G1LF:
    """cond: (M,) bool -> per-lane select (XLA glue, not a kernel)."""
    c = cond[None, :]
    return G1LF(
        jnp.where(c, p.x, q.x), jnp.where(c, p.y, q.y), jnp.where(c, p.z, q.z)
    )


def identity_lf(m: int) -> G1LF:
    from ..fields.modring import FQ_RING

    L = _fq().L
    zero = jnp.zeros((L, m), jnp.uint32)
    one = jnp.broadcast_to(np.asarray(FQ_RING.one_mont)[:, None], (L, m))
    return G1LF(zero, jnp.asarray(one), zero)


def from_points(p) -> G1LF:
    """curves.g1.G1Points (N, 24) limbs-last -> G1LF (24, N)."""
    return G1LF(p.x.T, p.y.T, p.z.T)


def to_points(p: G1LF):
    from .g1 import G1Points

    return G1Points(p.x.T, p.y.T, p.z.T)


def decode_lf(p: G1LF):
    """Device batch (possibly lazy) -> host affine [(x, y) | None].

    The three coordinate planes come back in ONE device->host transfer —
    each np.asarray costs a full tunnel round trip (~20 ms on the axon
    link), which dominated small readbacks."""
    from .. import params
    from ..fields.modring import FQ_RING, limbs_to_ints

    rinv = pow(FQ_RING.R_mod, -1, params.Q)
    L = p.x.shape[0]
    all3 = np.asarray(jnp.concatenate([p.x, p.y, p.z], axis=0))
    xs = limbs_to_ints(all3[:L].T)
    ys = limbs_to_ints(all3[L : 2 * L].T)
    zs = limbs_to_ints(all3[2 * L :].T)
    out = []
    for x, y, z in zip(xs, ys, zs):
        x, y, z = (int(x) * rinv) % params.Q, (int(y) * rinv) % params.Q, (
            int(z) * rinv
        ) % params.Q
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, -1, params.Q)
            out.append((x * zi % params.Q, y * zi % params.Q))
    return out


def encode_lf(pts) -> G1LF:
    """Host affine [(x, y) | None] -> G1LF (canonical Montgomery)."""
    from .g1 import encode_points

    return from_points(encode_points(pts))
