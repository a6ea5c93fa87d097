"""Batched G1 (BLS12-377) group arithmetic on TPU.

TPU-native replacement for `snarkvm-curves`' G1 ops (SURVEY.md §2.8 item 2).
Uses the complete projective addition formulas of Renes-Costello-Batina 2016
(Algorithm 7, a = 0, b3 = 3b = 3): branchless and valid for *all* inputs —
identity, doubling, inverses — which is exactly what vectorized/masked TPU
code needs (no data-dependent control flow, cf. the XLA semantics notes in
the build brief). Cost: 12 Fq muls + cheap small-constant muls per addition.

Points are (X, Y, Z) projective with coordinates as Montgomery limb arrays of
shape (..., 24). Identity is (0, 1, 0) (in Montgomery form).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from .. import params
from ..fields.modring import FQ_RING as F


class G1Points(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    @property
    def batch_shape(self):
        return self.x.shape[:-1]


def identity(shape=()) -> G1Points:
    L = F.L
    zero = jnp.zeros(shape + (L,), dtype=jnp.uint32)
    one = jnp.broadcast_to(F.one_mont, shape + (L,))
    return G1Points(zero, one, zero)


def _mul6(lhs, rhs):
    """Six independent Fq muls as one stacked call: 1/6 the HLO count and
    dispatch overhead of six separate calls (matters inside scan bodies)."""
    a = jnp.stack(lhs, axis=0)
    b = jnp.stack(rhs, axis=0)
    out = F.mul(a, b)
    return tuple(out[i] for i in range(len(lhs)))


def add(p: G1Points, q: G1Points) -> G1Points:
    """Complete projective addition (RCB16 Algorithm 7, a=0, b3=3).

    The 12 field muls are grouped into two stacked batches of 6 along the
    dependency frontier.
    """
    add_, sub = F.add, F.sub
    x1, y1, z1 = p
    x2, y2, z2 = q
    t0, t1, t2, m3, m4, m5 = _mul6(
        [x1, y1, z1, add_(x1, y1), add_(y1, z1), add_(x1, z1)],
        [x2, y2, z2, add_(x2, y2), add_(y2, z2), add_(x2, z2)],
    )
    t3 = sub(m3, add_(t0, t1))
    t4 = sub(m4, add_(t1, t2))
    y3 = sub(m5, add_(t0, t2))
    t0 = F.mul_small(t0, 3)
    t2 = F.mul_small(t2, 3)      # b3 * t2
    z3 = add_(t1, t2)
    t1 = sub(t1, t2)
    y3 = F.mul_small(y3, 3)      # b3 * y3
    a, b, c, d, e, f = _mul6(
        [t4, t3, y3, t1, t0, z3],
        [y3, t1, t0, z3, t3, t4],
    )
    return G1Points(sub(b, a), add_(d, c), add_(f, e))


def double(p: G1Points) -> G1Points:
    """Complete doubling (RCB16 Algorithm 9, a=0, b3=3): two stacked batches
    of 4 muls."""
    add_, sub = F.add, F.sub
    x, y, z = p
    stacked = F.mul(jnp.stack([y, y, z, x]), jnp.stack([y, z, z, y]))
    t0, t1, t2, txy = stacked[0], stacked[1], stacked[2], stacked[3]
    z3 = add_(t0, t0)
    z3 = add_(z3, z3)
    z3 = add_(z3, z3)            # 8 y^4 ... (8 t0)
    t2 = F.mul_small(t2, 3)      # b3 z^2
    y3 = add_(t0, t2)
    t2three = F.mul_small(t2, 3)
    t0 = sub(t0, t2three)
    stacked2 = F.mul(
        jnp.stack([t2, t1, t0, t0]), jnp.stack([z3, z3, y3, txy])
    )
    x3m, z3m, y3m, xt = stacked2[0], stacked2[1], stacked2[2], stacked2[3]
    y3 = add_(x3m, y3m)
    x3 = add_(xt, xt)
    return G1Points(x3, y3, z3m)


def neg(p: G1Points) -> G1Points:
    return G1Points(p.x, F.neg(p.y), p.z)


def select(cond, p: G1Points, q: G1Points) -> G1Points:
    """Elementwise select: cond ? p : q, cond shape = batch shape."""
    return G1Points(F.select(cond, p.x, q.x), F.select(cond, p.y, q.y), F.select(cond, p.z, q.z))


def is_identity(p: G1Points):
    return F.is_zero(p.z)


def scale(k_bits: jnp.ndarray, p: G1Points) -> G1Points:
    """Scalar multiplication by double-and-add; k_bits: (nbits,) MSB-first
    bits (single scalar applied to a batch of points). lax.scan keeps the
    compiled graph one round deep."""
    import jax

    def step(acc, bit):
        acc = double(acc)
        acc = select(bit == 1, add(acc, p), acc)
        return acc, None

    acc0 = identity(p.batch_shape)
    acc, _ = jax.lax.scan(step, acc0, k_bits)
    return acc


def scalar_bits(k: int, nbits: int | None = None) -> jnp.ndarray:
    """Host scalar -> MSB-first bit array for scale()."""
    nbits = nbits or params.R.bit_length()
    return jnp.asarray([(k >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.uint32)


# -- host <-> device ---------------------------------------------------------


def encode_points(pts: Sequence, assume_affine=True) -> G1Points:
    """Host affine points [(x, y) | None] -> device projective batch."""
    xs, ys, zs = [], [], []
    for p in pts:
        if p is None:
            xs.append(0)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(p[0])
            ys.append(p[1])
            zs.append(1)
    return G1Points(F.encode(xs), F.encode(ys), F.encode(zs))


def decode_points(p: G1Points):
    """Device batch -> host affine [(x, y) | None]."""
    xs = F.decode(p.x).reshape(-1)
    ys = F.decode(p.y).reshape(-1)
    zs = F.decode(p.z).reshape(-1)
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
        else:
            zinv = pow(int(z), -1, params.Q)
            out.append((int(x) * zinv % params.Q, int(y) * zinv % params.Q))
    return out


def to_affine(p: G1Points) -> G1Points:
    """Normalize Z to 1 on device (identity maps to (0, 1, 0))."""
    ident = is_identity(p)
    safe_z = F.select(ident, jnp.broadcast_to(F.one_mont, p.z.shape), p.z)
    flat = safe_z.reshape(-1, F.L)
    zinv = F.batch_inv(flat).reshape(safe_z.shape)
    x = F.mul(p.x, zinv)
    y = F.mul(p.y, zinv)
    one = jnp.broadcast_to(F.one_mont, p.z.shape)
    zero = jnp.zeros_like(p.z)
    return G1Points(
        F.select(ident, zero, x),
        F.select(ident, one, y),
        F.select(ident, zero, one),
    )
