#!/usr/bin/env python
"""Microbenchmark: Montgomery Fq mul formulations on the real TPU chip.

Compares, at MSM batch shape (N=2^16, L=24 16-bit limbs):
  1. einsum    — round-1 one-hot f32 einsum (MXU, HIGHEST precision)
  2. shiftadd  — VPU int32 shift-and-add convolution (padded-sum form)
  3. dus       — VPU int32 with dynamic-update-slice accumulation
Then times a full RCB16 point-add (12 muls) with the best variant.
"""
import sys
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from aleo_tpu import params
from aleo_tpu.fields.modring import FQ_RING as F, ints_to_limbs

N = 1 << 16
L = F.L
MASK = 0xFFFF


def timeit(fn, *args, iters=20, label=""):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{label:28s} {dt*1e3:9.3f} ms   (compile {compile_s:.1f}s)", flush=True)
    return dt


# ---- variant 2: padded-sum shift-add --------------------------------------
def mul_cols_shiftadd(a, b, K):
    lo_acc = jnp.zeros(a.shape[:-1] + (K,), jnp.uint32)
    hi_acc = jnp.zeros(a.shape[:-1] + (K,), jnp.uint32)
    pad_cfg = [(0, 0)] * (a.ndim - 1)
    for i in range(L):
        width = min(L, K - i)
        if width <= 0:
            break
        p = a[..., i : i + 1] * b[..., :width]
        lo = p & MASK
        hi = p >> 16
        lo_acc = lo_acc + jnp.pad(lo, pad_cfg + [(i, K - i - width)])
        if i + 1 < K:
            w2 = min(width, K - i - 1)
            hi_acc = hi_acc + jnp.pad(hi[..., :w2], pad_cfg + [(i + 1, K - i - 1 - w2)])
    return lo_acc + hi_acc


def mont_mul_shiftadd(a, b):
    cols = mul_cols_shiftadd(a, b, 2 * L)
    t = F._carry(cols)
    m = F._carry(mul_cols_shiftadd(t[..., :L], jnp.broadcast_to(F.np_limbs, t[..., :L].shape), L))
    u = F._carry(mul_cols_shiftadd(m, jnp.broadcast_to(F.p_limbs, m.shape), 2 * L) + t)
    return F._cond_sub_p(u[..., L:])


# ---- variant 3: dynamic-update-slice accumulation ---------------------------
def mul_cols_dus(a, b, K):
    acc = jnp.zeros(a.shape[:-1] + (K,), jnp.uint32)
    hic = jnp.zeros(a.shape[:-1] + (K,), jnp.uint32)
    for i in range(L):
        width = min(L, K - i)
        if width <= 0:
            break
        p = a[..., i : i + 1] * b[..., :width]
        acc = acc.at[..., i : i + width].add(p & MASK)
        if i + 1 < K:
            w2 = min(width, K - i - 1)
            hic = hic.at[..., i + 1 : i + 1 + w2].add((p >> 16)[..., :w2])
    return acc + hic


def mont_mul_dus(a, b):
    cols = mul_cols_dus(a, b, 2 * L)
    t = F._carry(cols)
    m = F._carry(mul_cols_dus(t[..., :L], jnp.broadcast_to(F.np_limbs, t[..., :L].shape), L))
    u = F._carry(mul_cols_dus(m, jnp.broadcast_to(F.p_limbs, m.shape), 2 * L) + t)
    return F._cond_sub_p(u[..., L:])


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(7)
    av = [int(rng.integers(0, 2**62)) * int(rng.integers(0, 2**62)) % params.Q for _ in range(64)]
    bv = [int(rng.integers(0, 2**62)) * int(rng.integers(0, 2**62)) % params.Q for _ in range(64)]
    a = jnp.asarray(np.tile(F.to_mont_host(av), (N // 64, 1)))
    b = jnp.asarray(np.tile(F.to_mont_host(bv), (N // 64, 1)))

    f_ein = jax.jit(F.mul)
    f_sa = jax.jit(mont_mul_shiftadd)
    f_dus = jax.jit(mont_mul_dus)

    # correctness cross-check on a small slice
    ref = np.asarray(f_ein(a[:64], b[:64]))
    got_sa = np.asarray(f_sa(a[:64], b[:64]))
    got_dus = np.asarray(f_dus(a[:64], b[:64]))
    assert np.array_equal(ref, got_sa), "shiftadd mismatch"
    assert np.array_equal(ref, got_dus), "dus mismatch"
    print("correctness ok", flush=True)

    timeit(f_ein, a, b, label="einsum mont_mul (N=65536)")
    t_sa = timeit(f_sa, a, b, label="shiftadd mont_mul")
    t_dus = timeit(f_dus, a, b, label="dus mont_mul")

    # 12 independent muls stacked (the point-add inner shape)
    a12 = jnp.tile(a[None], (12, 1, 1))
    b12 = jnp.tile(b[None], (12, 1, 1))
    best = f_sa if t_sa <= t_dus else f_dus
    timeit(jax.jit(best._fun if hasattr(best, "_fun") else best), a12, b12, iters=5,
           label="best x12 stacked")

    # full point add via monkeypatched ring mul
    from aleo_tpu.curves import g1 as g1mod
    orig = F.mul
    pts_x, pts_y = a, b
    one = jnp.broadcast_to(F.one_mont, a.shape)
    P = g1mod.G1Points(pts_x, pts_y, one)
    Q = g1mod.G1Points(pts_y, pts_x, one)
    f_add_orig = jax.jit(g1mod.add)
    timeit(f_add_orig, P, Q, iters=5, label="point add (einsum mul)")
    F.mul = lambda x, y: (f_sa._fun if hasattr(f_sa, "_fun") else mont_mul_shiftadd)(x, y)
    f_add_new = jax.jit(g1mod.add)
    timeit(f_add_new, P, Q, iters=5, label="point add (shiftadd mul)")
    F.mul = orig


if __name__ == "__main__":
    main()
