"""Limbs-first Fr field ops — the portable device API for the prover pipeline.

Layout: a field-element batch is (L, N) uint32 — 16-bit limbs little-endian
on the sublane axis, batch on the 128-wide lane axis. All polynomial/NTT/
prover device code uses this API; internals dispatch per backend:

  * TPU: limb-convolution Montgomery (fields/limb_kernels.py). Measured on
    v5e (tools/microbench_fr_mul.py): ~20x faster than the einsum path AND
    ~30x faster to XLA-compile (the einsum path costs >100 s of compile per
    shape on TPU — unusable for a prover that touches dozens of shapes).
  * CPU: the einsum Montgomery path of modring.py via transposes. XLA:CPU
    lowers the one-hot contraction to an Eigen GEMM that beats the unfused
    limb-op stream ~10x there (and the transposes are layout no-ops for the
    CPU backend).

Both backends produce canonical Montgomery limbs from canonical inputs
(TPU internals run lazily < 2p between `normalize` points; the dispatch
wrappers keep the visible contract canonical-in/canonical-out only at
`normalize`/`decode` boundaries — intermediate values may be < 2p, which
every op here accepts).

Replaces the reference's snarkvm-fields Fr arithmetic (SURVEY.md §2.8-1) on
the prover hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import params
from . import limb_kernels as lk
from .modring import FR_RING

R = params.R
L = params.FR_LIMBS

_IS_TPU = None


def _is_tpu() -> bool:
    global _IS_TPU
    if _IS_TPU is None:
        _IS_TPU = jax.default_backend() == "tpu"
    return _IS_TPU


@functools.lru_cache(maxsize=None)
def _consts():
    """Constant rows as numpy (L, 1) so cached values never capture traces."""
    ring = lk.get_fr()
    return {k: np.ascontiguousarray(v[:, None]) for k, v in ring.rows.items()}


# -- core ring ops (backend-dispatched) -------------------------------------


def mul(a, b):
    a, b = jnp.broadcast_arrays(a, b)
    if _is_tpu():
        return lk.mont_mul(_consts(), a, b)
    return FR_RING.mul(a.T, b.T).T


def sq(a):
    return mul(a, a)


def add(a, b):
    a, b = jnp.broadcast_arrays(a, b)
    if _is_tpu():
        return lk.add(_consts(), a, b)
    return FR_RING.add(a.T, b.T).T


def sub(a, b):
    a, b = jnp.broadcast_arrays(a, b)
    if _is_tpu():
        return lk.sub(_consts(), a, b)
    return FR_RING.sub(a.T, b.T).T


def neg(a):
    if _is_tpu():
        return lk.neg(_consts(), a)
    return FR_RING.neg(a.T).T


def normalize(a):
    """Reduce lazy (< 2p) values to canonical (< p). Identity on CPU, where
    the einsum internals are always canonical."""
    if _is_tpu():
        return lk.normalize(_consts(), a)
    return a


def select(cond, a, b):
    """cond: (N,) bool -> per-lane select."""
    return jnp.where(cond[None, :], a, b)


def from_mont(a):
    """Montgomery -> standard-form limbs (for MSM scalar digits).

    May return lazy (< 2r) values on TPU; safe for MSM scalars because the
    G1 group order is r (k + r acts as k) and the digit decomposition covers
    254 bits.
    """
    one_raw = np.zeros((L, 1), dtype=np.uint32)
    one_raw[0, 0] = 1
    if _is_tpu():
        return lk.mont_mul(_consts(), a, jnp.asarray(one_raw))
    return FR_RING.from_mont(a.T).T


# -- composites (generic over the dispatched core) ---------------------------


def scan_mul(a, reverse: bool = False):
    """Inclusive prefix product along the lane axis (Hillis-Steele)."""
    n = a.shape[1]
    if n == 1:
        return a
    logn = max(1, (n - 1).bit_length())
    iota = jnp.arange(n, dtype=jnp.int32)
    if reverse:
        iota = iota[::-1]

    def body(d, v):
        o = jnp.int32(1) << d
        vs = jnp.roll(v, -o if reverse else o, axis=1)
        prod = mul(v, vs)
        valid = iota >= o
        return select(valid, prod, v)

    return jax.lax.fori_loop(0, logn, body, a)


def inv(a):
    """Fermat inversion a^(r-2), MSB-first square-and-multiply scan."""
    bits = jnp.asarray([int(b) for b in bin(R - 2)[2:]], dtype=jnp.uint32)

    def step(acc, bit):
        acc = sq(acc)
        with_mul = mul(acc, a)
        return jnp.where(bit == 1, with_mul, acc), None

    acc0 = one(a.shape[1])
    out, _ = jax.lax.scan(step, acc0, bits)
    return out


def batch_inv(a):
    """Batched inversion along lanes (prefix/suffix + one Fermat inversion).
    No zero entries (zeros produce garbage, as in the reference)."""
    n = a.shape[1]
    if n == 1:
        return inv(a)
    pre = scan_mul(a)
    suf = scan_mul(a, reverse=True)
    total_inv = inv(pre[:, -1:])
    o = one(1)
    pre_shift = jnp.concatenate([o, pre[:, :-1]], axis=1)
    suf_shift = jnp.concatenate([suf[:, 1:], o], axis=1)
    return mul(mul(pre_shift, suf_shift), jnp.broadcast_to(total_inv, a.shape))


def tree_sum(x):
    """Field-add reduction along lanes -> (L, 1)."""
    n = x.shape[1]
    if n == 1:
        return x
    logn = max(1, (n - 1).bit_length())
    iota = jnp.arange(n, dtype=jnp.int32)

    def body(d, v):
        o = jnp.int32(1) << d
        vs = jnp.roll(v, o, axis=1)
        s = add(v, vs)
        return select(iota >= o, s, v)

    out = jax.lax.fori_loop(0, logn, body, x)
    return out[:, -1:]


def powers(z, n: int):
    """[z^0 .. z^(n-1)] as (L, n); z: (L, 1)."""
    if n == 1:
        return one(1)
    logn = max(1, (n - 1).bit_length())
    iota = jnp.arange(n, dtype=jnp.uint32)

    def body(k, carry):
        out, zp = carry
        bit = (iota >> k) & 1
        out = select(bit == 1, mul(out, jnp.broadcast_to(zp, out.shape)), out)
        return (out, sq(zp))

    out0 = one(n)
    out, _ = jax.lax.fori_loop(0, logn, body, (out0, z))
    return out


# -- host <-> device ---------------------------------------------------------


def const(x: int, n: int = 1):
    """Host int -> (L, n) Montgomery limbs (broadcast-ready)."""
    row = FR_RING.to_mont_host([x % R])[0]
    return jnp.broadcast_to(jnp.asarray(row)[:, None], (L, n))


def encode(xs) -> jnp.ndarray:
    """Host ints -> (L, N) Montgomery limbs."""
    return jnp.asarray(FR_RING.to_mont_host(list(xs)).T.copy())


def decode(a) -> np.ndarray:
    """(L, N) device limbs (lazy ok) -> host ints."""
    arr = np.asarray(jax.jit(normalize)(a)).T
    return FR_RING.from_mont_host(arr)


def one(n: int) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.asarray(np.asarray(FR_RING.one_mont))[:, None], (L, n))


def zero(n: int) -> jnp.ndarray:
    return jnp.zeros((L, n), jnp.uint32)


# Layout converters at module boundaries.


def from_ll(a: jnp.ndarray) -> jnp.ndarray:
    """(N, L) limbs-last -> (L, N) limbs-first."""
    return a.T


def to_ll(a: jnp.ndarray) -> jnp.ndarray:
    return a.T
