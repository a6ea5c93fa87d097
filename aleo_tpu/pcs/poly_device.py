"""Device polynomial algebra over Fr (coefficient vectors as (n, L) limbs).

Shared by the KZG opener and the Marlin-family prover. All operations are
O(n log n)-work, log-depth, static-shape jnp — no sequential coefficient
recurrences (synthetic division is reformulated through evaluation domains,
vanishing-division through chunked suffix sums).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields.modring import FR_RING as F
from ..ntt import ntt as dntt

# Jitted elementwise wrappers for host-orchestrated compositions (the NTT
# wrappers resolve domain tables host-side, so multi-step polynomial ops are
# sequenced in Python with each step compiled).
mul_j = jax.jit(F.mul)
add_j = jax.jit(F.add)
sub_j = jax.jit(F.sub)
batch_inv_j = jax.jit(F.batch_inv)


@functools.partial(jax.jit, static_argnames=("axis",))
def tree_sum(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Log-depth field-add reduction along `axis` (x: (..., L) limbs).

    Hillis-Steele under fori_loop (one add instance in the graph); returns
    the total (the last lane of the inclusive prefix sum).
    """
    x = jnp.moveaxis(x, axis, 0)
    n = x.shape[0]
    if n == 1:
        return x[0]
    logn = max(1, (n - 1).bit_length())
    iota = jnp.arange(n, dtype=jnp.int32)

    def body(d, v):
        o = jnp.int32(1) << d
        vs = jnp.roll(v, o, axis=0)
        s = F.add(v, vs)
        mask = (iota >= o).reshape((n,) + (1,) * (v.ndim - 1))
        return jnp.where(mask, s, v)

    out = jax.lax.fori_loop(0, logn, body, x)
    return out[-1]


@functools.partial(jax.jit, static_argnames=("n",))
def powers(z: jnp.ndarray, n: int) -> jnp.ndarray:
    """[z^0, ..., z^(n-1)] as (n, L) Montgomery limbs; z: (L,).

    fori_loop over bit positions: one mul + one square instance total.
    """
    if n == 1:
        return jnp.broadcast_to(F.one_mont, (1, F.L))
    logn = max(1, (n - 1).bit_length())
    iota = jnp.arange(n, dtype=jnp.uint32)

    def body(k, carry):
        out, zp = carry
        bit = (iota >> k) & 1
        out = F.select(bit == 1, F.mul(out, zp), out)
        return (out, F.sq(zp))

    out0 = jnp.broadcast_to(F.one_mont, (n, F.L))
    out, _ = jax.lax.fori_loop(0, logn, body, (out0, z))
    return out


@jax.jit
def eval_coeffs(coeffs: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """p(z) for coeffs (n, L), z (L,): inner product with powers of z."""
    pw = powers(z, coeffs.shape[0])
    return tree_sum(F.mul(coeffs, pw))


def pad_to(coeffs: jnp.ndarray, n: int) -> jnp.ndarray:
    k = coeffs.shape[0]
    assert k <= n
    if k == n:
        return coeffs
    return jnp.concatenate(
        [coeffs, jnp.zeros((n - k, coeffs.shape[1]), coeffs.dtype)], axis=0
    )


def poly_mul(a: jnp.ndarray, b: jnp.ndarray, out_len: int | None = None) -> jnp.ndarray:
    """Product of two coefficient vectors via NTT on a 2x domain."""
    la, lb = a.shape[0], b.shape[0]
    need = la + lb - 1
    n = 1 << max(1, (need - 1).bit_length())
    fa = dntt.ntt(pad_to(a, n))
    fb = dntt.ntt(pad_to(b, n))
    prod = dntt.intt(F.mul(fa, fb))
    return prod[: out_len or need]


@functools.partial(jax.jit, static_argnames=("n",))
def divide_by_vanishing(a: jnp.ndarray, n: int):
    """Divide by v_H(X) = X^n - 1 using X^{jn} = 1 (mod v_H):
    remainder = sum of the n-chunks; quotient chunk i = sum of chunks > i.
    Returns (quotient (len-n, L) or (0, L), remainder (n, L))."""
    m = a.shape[0]
    if m <= n:
        return jnp.zeros((0, F.L), a.dtype), pad_to(a, n)
    k = -(-m // n)  # number of chunks
    a_pad = pad_to(a, k * n)
    chunks = a_pad.reshape(k, n, F.L)
    # suffix sums over chunk axis (k is small: log-tree not needed)
    rem = chunks[0]
    for j in range(1, k):
        rem = F.add(rem, chunks[j])
    suffix = [None] * k
    acc = chunks[k - 1]
    suffix[k - 1] = acc
    for j in range(k - 2, 0, -1):
        acc = F.add(acc, chunks[j])
        suffix[j] = acc
    quo = jnp.concatenate(suffix[1:], axis=0)[: m - n]
    return quo, rem


def divide_by_linear_via_domain(coeffs: jnp.ndarray, z: jnp.ndarray):
    """(q, y) with p(X) - y = q(X)(X - z), y = p(z).

    Computed on an evaluation domain: q(x_i) = (p(x_i) - y) / (x_i - z) for
    x_i in a size-n subgroup H (exact since q has degree < n). Requires z
    outside H — true with overwhelming probability for random z.
    """
    n = coeffs.shape[0]
    npow2 = 1 << max(1, (n - 1).bit_length())
    c = pad_to(coeffs, npow2)
    y = eval_coeffs(coeffs, z)
    evals = dntt.ntt(c)
    d = dntt.domain(npow2)
    xs = d.wpow  # domain points in Montgomery form (device array)
    denom = sub_j(xs, jnp.broadcast_to(z, xs.shape))
    dinv = batch_inv_j(denom)
    q_evals = mul_j(sub_j(evals, jnp.broadcast_to(y, evals.shape)), dinv)
    q = dntt.intt(q_evals)
    return q[: max(1, n - 1)], y
