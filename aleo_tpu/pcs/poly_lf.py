"""Limbs-first device polynomial algebra over Fr ((L, n) coefficient arrays).

The prover-pipeline twin of `poly_device.py`, built on `fields.fr_lf` (which
dispatches limb-convolution internals on TPU / einsum internals on CPU).
All operations are O(n log n)-work, log-depth, static-shape jnp — no
sequential coefficient recurrences.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields import fr_lf as lf
from ..ntt import ntt as dntt

L = lf.L


def pad_to(coeffs: jnp.ndarray, n: int) -> jnp.ndarray:
    """(L, k) -> (L, n) zero-padded on the lane axis."""
    k = coeffs.shape[1]
    assert k <= n
    if k == n:
        return coeffs
    return jnp.concatenate(
        [coeffs, jnp.zeros((coeffs.shape[0], n - k), coeffs.dtype)], axis=1
    )


@jax.jit
def eval_coeffs(coeffs: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """p(z) for coeffs (L, n), z (L, 1) -> (L, 1)."""
    pw = lf.powers(z, coeffs.shape[1])
    return lf.tree_sum(lf.mul(coeffs, pw))


def _tree_reduce_axis1(x: jnp.ndarray) -> jnp.ndarray:
    """Field-add reduction of (L, k, n) over axis 1 -> (L, n). k is a
    static (usually small) stack height; log-depth halving."""
    k = x.shape[1]
    while k > 1:
        half = k // 2
        lo = x[:, :half]
        hi = x[:, half : 2 * half]
        s = lf.add(
            lo.reshape(L, -1), hi.reshape(L, -1)
        ).reshape(lo.shape)
        if k % 2:
            s = jnp.concatenate([s, x[:, -1:]], axis=1)
        x = s
        k = s.shape[1]
    return x[:, 0]


@jax.jit
def fold_stack(stack: jnp.ndarray, gpows: jnp.ndarray) -> jnp.ndarray:
    """sum_i gpows[:, i] * stack[:, i, :]: (L, k, n), (L, k) -> (L, n)."""
    k, n = stack.shape[1], stack.shape[2]
    g = jnp.repeat(gpows, n, axis=1)                    # (L, k*n)
    weighted = lf.mul(stack.reshape(L, k * n), g).reshape(L, k, n)
    return _tree_reduce_axis1(weighted)


@functools.partial(jax.jit, static_argnames=("n",))
def divide_by_vanishing(a: jnp.ndarray, n: int):
    """Divide (L, m) by v_H(X) = X^n - 1 using X^{jn} = 1 (mod v_H).
    Returns (quotient (L, m-n) or (L, 0), remainder (L, n))."""
    m = a.shape[1]
    if m <= n:
        return jnp.zeros((L, 0), a.dtype), pad_to(a, n)
    k = -(-m // n)
    a_pad = pad_to(a, k * n)
    chunks = a_pad.reshape(L, k, n)
    rem = chunks[:, 0]
    for j in range(1, k):
        rem = lf.add(rem, chunks[:, j])
    suffix = [None] * k
    acc = chunks[:, k - 1]
    suffix[k - 1] = acc
    for j in range(k - 2, 0, -1):
        acc = lf.add(acc, chunks[:, j])
        suffix[j] = acc
    quo = jnp.concatenate(suffix[1:], axis=1)[:, : m - n]
    return quo, rem


def divide_by_linear_via_domain(coeffs: jnp.ndarray, z: jnp.ndarray):
    """(q, y) with p(X) - y = q(X)(X - z), y = p(z); coeffs (L, n), z (L, 1).

    Computed on an evaluation domain: q(x_i) = (p(x_i) - y) / (x_i - z) for
    x_i in a size-n subgroup H (exact since deg q < n); requires z outside H
    (overwhelming probability for transcript z).
    """
    n = coeffs.shape[1]
    npow2 = 1 << max(1, (n - 1).bit_length())
    c = pad_to(coeffs, npow2)
    y = eval_coeffs(coeffs, z)
    evals = dntt.ntt_lf(c)
    d = dntt.domain(npow2)
    q_evals = _linear_quotient_evals(evals, jnp.asarray(d.wpow_np), z, y)
    q = dntt.intt_lf(q_evals)
    return q[:, : max(1, n - 1)], y


@jax.jit
def _linear_quotient_evals(evals, wpow_ll, z, y):
    n = evals.shape[1]
    xs = wpow_ll.T                                     # (L, n)
    denom = lf.sub(xs, jnp.broadcast_to(z, xs.shape))
    dinv = lf.batch_inv(denom)
    return lf.mul(lf.sub(evals, jnp.broadcast_to(y, evals.shape)), dinv)


@functools.lru_cache(maxsize=None)
def _coset_vh_inv(n_domain: int, n_vanish: int, shift: int) -> jnp.ndarray:
    """1 / v(x) for v(X) = X^n_vanish - 1 on the coset shift * H_{n_domain},
    limbs-first (L, n_domain). Device-computed (powers + batch inverse)."""
    from .. import params

    R = params.R
    w = dntt.domain(n_domain).w
    x_pow = lf.const(pow(shift, n_vanish, R))
    w_pow = lf.const(pow(w, n_vanish, R))

    @jax.jit
    def build(x_pow, w_pow):
        pows = lf.powers(w_pow, n_domain)
        vals = lf.sub(lf.mul(pows, jnp.broadcast_to(x_pow, pows.shape)),
                      lf.one(n_domain))
        return lf.batch_inv(vals)

    return build(x_pow, w_pow)
