#!/usr/bin/env python
"""Piecewise profile of the Montgomery mul: conv vs carry vs cond-sub."""
import sys, time
import jax, jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from aleo_tpu import params
from aleo_tpu.fields.modring import FQ_RING as F

N = 1 << 16
L = 24
MASK = 0xFFFF


def timeit(fn, *args, iters=30, label=""):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{label:44s} {dt*1e6:10.1f} us", flush=True)
    return dt


def conv_padsum_ll(a, b):  # limbs-last (N, L) -> (N, 2L)
    K = 2 * L
    lo = jnp.zeros(a.shape[:-1] + (K,), jnp.uint32)
    hi = jnp.zeros(a.shape[:-1] + (K,), jnp.uint32)
    for i in range(L):
        p = a[..., i : i + 1] * b
        lo = lo + jnp.pad(p & MASK, [(0, 0)] * (a.ndim - 1) + [(i, K - i - L)])
        hi = hi + jnp.pad(p >> 16, [(0, 0)] * (a.ndim - 1) + [(i + 1, K - i - 1 - L)]) if i + 1 + L <= K else hi
    return lo + hi


def conv_padsum_lf(a, b):  # limbs-first (L, N) -> (2L, N)
    K = 2 * L
    lo = jnp.zeros((K,) + a.shape[1:], jnp.uint32)
    hi = jnp.zeros((K,) + a.shape[1:], jnp.uint32)
    for i in range(L):
        p = a[i][None, :] * b
        lo = lo + jnp.pad(p & MASK, [(i, K - i - L)] + [(0, 0)] * (a.ndim - 1))
        hi = hi + jnp.pad(p >> 16, [(i + 1, K - i - 1 - L)] + [(0, 0)] * (a.ndim - 1))
    return lo + hi


def carry_ll(cols):
    return F._carry(cols)


def carry_lf(cols):
    lo = cols & MASK
    hi = cols >> 16
    hi_shift = jnp.concatenate([jnp.zeros_like(hi[:1]), hi[:-1]], axis=0)
    s = lo + hi_shift
    d = s & MASK
    g = (s >> 16).astype(jnp.uint32)
    pf = d == MASK

    def comb(lo_, hi_):
        gl, pl = lo_
        gh, ph = hi_
        return (gh | (ph & gl), ph & pl)

    G, _ = jax.lax.associative_scan(comb, (g, pf), axis=0)
    c_in = jnp.concatenate([jnp.zeros_like(G[:1]), G[:-1]], axis=0)
    return (d + c_in) & MASK


def carry_ripple2_lf(cols):
    """2 ripple passes + unrolled KS on bools (no associative_scan)."""
    lo = cols & MASK
    hi = cols >> 16
    s = lo + jnp.concatenate([jnp.zeros_like(hi[:1]), hi[:-1]], axis=0)
    d = s & MASK
    g = (s >> 16) != 0
    pf = d == MASK
    # unrolled Kogge-Stone on (K, N) bools along axis 0
    K = cols.shape[0]
    Gc, Pc = g, pf
    sh = 1
    while sh < K:
        Gs = jnp.concatenate([jnp.zeros_like(Gc[:sh]), Gc[:-sh]], axis=0)
        Ps = jnp.concatenate([jnp.zeros_like(Pc[:sh]), Pc[:-sh]], axis=0)
        Gc = Gc | (Pc & Gs)
        Pc = Pc & Ps
        sh *= 2
    c_in = jnp.concatenate([jnp.zeros_like(Gc[:1]), Gc[:-1]], axis=0)
    return (d + c_in.astype(jnp.uint32)) & MASK


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(3)
    a_ll = jnp.asarray(rng.integers(0, MASK + 1, (N, L)), jnp.uint32)
    b_ll = jnp.asarray(rng.integers(0, MASK + 1, (N, L)), jnp.uint32)
    a_lf = jnp.asarray(np.asarray(a_ll).T.copy())
    b_lf = jnp.asarray(np.asarray(b_ll).T.copy())
    cols_ll = jnp.asarray(rng.integers(0, 1 << 22, (N, 2 * L)), jnp.uint32)
    cols_lf = jnp.asarray(np.asarray(cols_ll).T.copy())

    timeit(jax.jit(conv_padsum_ll), a_ll, b_ll, label="conv padsum limbs-last (N,24)->(N,48)")
    timeit(jax.jit(conv_padsum_lf), a_lf, b_lf, label="conv padsum limbs-first (24,N)->(48,N)")
    timeit(jax.jit(carry_ll), cols_ll, label="carry KS assoc_scan limbs-last")
    timeit(jax.jit(carry_lf), cols_lf, label="carry KS assoc_scan limbs-first")
    r1 = timeit(jax.jit(carry_ripple2_lf), cols_lf, label="carry KS unrolled limbs-first")
    # check unrolled == assoc_scan
    x = np.asarray(jax.jit(carry_lf)(cols_lf))
    y = np.asarray(jax.jit(carry_ripple2_lf)(cols_lf))
    assert np.array_equal(x, y)
    print("carry variants agree", flush=True)

    # conv in f32 8-bit limbs, limbs-first
    a8 = jnp.concatenate([a_lf & 0xFF, a_lf >> 8], axis=0).astype(jnp.float32)  # (48,N) wrong order but timing-equiv
    b8 = jnp.concatenate([b_lf & 0xFF, b_lf >> 8], axis=0).astype(jnp.float32)

    def conv8_lf(a, b):
        L8 = 48
        K = 2 * L8
        acc = jnp.zeros((K,) + a.shape[1:], jnp.float32)
        for i in range(L8):
            acc = acc + jnp.pad(a[i][None, :] * b, [(i, K - i - L8)] + [(0, 0)] * (a.ndim - 1))
        return acc

    timeit(jax.jit(conv8_lf), a8, b8, label="conv8 padsum f32 limbs-first (48,N)")


if __name__ == "__main__":
    main()
