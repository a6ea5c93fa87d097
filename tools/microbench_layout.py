#!/usr/bin/env python
"""Probe raw VPU throughput + limb layout for the Montgomery mul."""
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
    print(f"{label:36s} {dt*1e6:10.1f} us", flush=True)
    return dt


def chain_mul_u32(x, y):
    acc = x
    for _ in range(16):
        acc = acc * y + x
    return acc

def chain_mul_f32(x, y):
    acc = x
    for _ in range(16):
        acc = acc * y + x
    return acc


# limbs-first montgomery mul: arrays (L, N)
def mul_cols_lf(a, b, K):
    # a, b: (L, N); returns (K, N) column sums < 2^22
    lo = jnp.zeros((K,) + a.shape[1:], jnp.uint32)
    hi = jnp.zeros((K,) + a.shape[1:], jnp.uint32)
    Lc = a.shape[0]
    for i in range(Lc):
        width = min(Lc, K - i)
        if width <= 0:
            break
        p = a[i][None, :] * b[:width]
        lo = lo.at[i : i + width].add(p & MASK)
        if i + 1 < K:
            w2 = min(width, K - i - 1)
            hi = hi.at[i + 1 : i + 1 + w2].add((p >> 16)[:w2])
    return lo + hi


def carry_lf(cols):
    # cols: (K, N) < 2^22 -> 16-bit limbs via Kogge-Stone along axis 0
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


P_LF = None
NP_LF = None

def mont_mul_lf(a, b):
    cols = mul_cols_lf(a, b, 2 * L)
    t = carry_lf(cols)
    m = carry_lf(mul_cols_lf(t[:L], NP_LF, L))
    u = carry_lf(mul_cols_lf(m, P_LF, 2 * L) + t)
    # cond sub p on (L, N)
    res = u[L:]
    tw = MASK - P_LF
    s = res + tw
    s = s.at[0].add(1)
    d = s & MASK
    g = (s >> 16).astype(jnp.uint32)
    pf = d == MASK
    def comb(lo_, hi_):
        gl, pl = lo_
        gh, ph = hi_
        return (gh | (ph & gl), ph & pl)
    G, _ = jax.lax.associative_scan(comb, (g, pf), axis=0)
    c_in = jnp.concatenate([jnp.zeros_like(G[:1]), G[:-1]], axis=0)
    diff = (d + c_in) & MASK
    borrow = 1 - G[-1]
    return jnp.where((borrow == 0)[None, :], diff, res)


def main():
    global P_LF, NP_LF
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(3)
    x32 = jnp.asarray(rng.integers(0, MASK, (N, 32)), jnp.uint32)
    y32 = jnp.asarray(rng.integers(0, MASK, (N, 32)), jnp.uint32)
    xf = x32.astype(jnp.float32); yf = y32.astype(jnp.float32)
    x128 = x32.reshape(-1, 128); y128 = y32.reshape(-1, 128)
    xf128 = xf.reshape(-1, 128); yf128 = yf.reshape(-1, 128)

    f1 = jax.jit(chain_mul_u32); f2 = jax.jit(chain_mul_f32)
    timeit(f1, x32, y32, label="u32 mul+add x16  (N,32)")
    timeit(f1, x128, y128, label="u32 mul+add x16  (N/4,128)")
    timeit(f2, xf, yf, label="f32 fma x16      (N,32)")
    timeit(f2, xf128, yf128, label="f32 fma x16      (N/4,128)")

    av = [int(rng.integers(0, 2**62)) ** 2 % params.Q for _ in range(64)]
    bv = [int(rng.integers(0, 2**62)) ** 2 % params.Q for _ in range(64)]
    a_ll = jnp.asarray(np.tile(F.to_mont_host(av), (N // 64, 1)))   # (N, L)
    b_ll = jnp.asarray(np.tile(F.to_mont_host(bv), (N // 64, 1)))
    a_lf = a_ll.T.copy()  # (L, N)
    b_lf = b_ll.T.copy()
    P_LF = jnp.asarray(np.asarray(F.p_limbs))[:, None]
    NP_LF = jnp.asarray(np.asarray(F.np_limbs))[:, None]

    f_lf = jax.jit(mont_mul_lf)
    ref = np.asarray(jax.jit(F.mul)(a_ll[:256], b_ll[:256]))
    got = np.asarray(f_lf(a_lf[:, :256], b_lf[:, :256]))
    assert np.array_equal(ref.T, got), "limbs-first mismatch"
    print("limbs-first correctness ok", flush=True)

    timeit(f_lf, a_lf, b_lf, iters=30, label="mont_mul limbs-first (L,N)")

    # 12 stacked muls limbs-first: (12, L, N)? -> vmap over leading dim
    a12 = jnp.tile(a_lf[None], (12, 1, 1))
    b12 = jnp.tile(b_lf[None], (12, 1, 1))
    f12 = jax.jit(jax.vmap(mont_mul_lf))
    timeit(f12, a12, b12, iters=10, label="mont_mul limbs-first x12 vmap")


if __name__ == "__main__":
    main()
