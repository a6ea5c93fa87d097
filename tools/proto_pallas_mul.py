#!/usr/bin/env python
"""Prototype: Pallas Montgomery Fq mul, limbs-first (24, N) layout.

Validates:  correctness vs jnp path, throughput at N=2^16, and the cost of a
fused 12-mul chain (point-add-like workload) in one kernel.
"""
import sys, time, functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from aleo_tpu import params
from aleo_tpu.fields.modring import FQ_RING as F

L = 24
MASK = 0xFFFF
N = 1 << 16
TILE = 512

P_NP = np.asarray(F.p_limbs)        # (24,) uint32
NP_NP = np.asarray(F.np_limbs)


def _ks_carry(cols, K):
    """cols: (K, T) u32 with entries < 2^22 -> exact 16-bit limbs (K, T).
    Kogge-Stone carry propagation along axis 0, unrolled."""
    lo = cols & MASK
    hi = cols >> 16
    s = lo + jnp.concatenate([jnp.zeros_like(hi[:1]), hi[:-1]], axis=0)
    d = s & MASK
    g = s >> 16                      # in {0,1}
    p = (d == MASK).astype(jnp.uint32)
    sh = 1
    while sh < K:
        gs = jnp.concatenate([jnp.zeros_like(g[:sh]), g[:-sh]], axis=0)
        ps = jnp.concatenate([jnp.zeros_like(p[:sh]), p[:-sh]], axis=0)
        g = g | (p & gs)
        p = p & ps
        sh *= 2
    c_in = jnp.concatenate([jnp.zeros_like(g[:1]), g[:-1]], axis=0)
    return (d + c_in) & MASK


def _shift_rows(x, r, K):
    """Place x (Lx, T) at row offset r of a (K, T) zero buffer (concat form)."""
    Lx = x.shape[0]
    parts = []
    if r > 0:
        parts.append(jnp.zeros((r,) + x.shape[1:], x.dtype))
    take = min(Lx, K - r)
    parts.append(x[:take])
    tail = K - r - take
    if tail > 0:
        parts.append(jnp.zeros((tail,) + x.shape[1:], x.dtype))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _conv(a, b, K, p_limbs_b=None):
    """Column sums of a*b: a (La, T), b (Lb, T) -> (K, T), entries < 2^22.

    Offsets are grouped by (i mod 8): within a group, relative shifts are
    multiples of 8 rows (sublane-tile aligned, cheap); only the final group
    shift is an arbitrary sublane rotation.
    """
    La = a.shape[0]
    acc = None
    for r in range(min(8, La)):
        grp = None
        for i in range(r, La, 8):
            p = a[i][None, :] * b
            lo = _shift_rows(p & MASK, i - r, K)
            hi = _shift_rows(p >> 16, i - r + 1, K)
            term = lo + hi
            grp = term if grp is None else grp + term
        shifted = _shift_rows(grp, r, K) if r else grp
        if shifted.shape[0] > K:
            shifted = shifted[:K]
        acc = shifted if acc is None else acc + shifted
    return acc


def _mont_mul_tile(a, b, pL, npL):
    """a, b: (24, T) mont limbs; returns (24, T). Output < 2p (lazy)."""
    t = _ks_carry(_conv(a, b, 2 * L, None), 2 * L)          # (48, T)
    m = _ks_carry(_conv(t[:L], npL, L, None), L)            # (24, T)
    u_cols = _conv(m, pL, 2 * L, None) + t                  # < 2^22 + 2^16 ok
    u = _ks_carry(u_cols, 2 * L)
    return u[L:]


def _cond_sub_p(r, pL):
    """r (24, T) < 2p -> canonical < p."""
    tw = MASK - pL
    s = r + tw
    s = jnp.concatenate([s[:1] + 1, s[1:]], axis=0)
    d = s & MASK
    g = s >> 16
    p = (d == MASK).astype(jnp.uint32)
    sh = 1
    while sh < L:
        gs = jnp.concatenate([jnp.zeros_like(g[:sh]), g[:-sh]], axis=0)
        ps = jnp.concatenate([jnp.zeros_like(p[:sh]), p[:-sh]], axis=0)
        g = g | (p & gs)
        p = p & ps
        sh *= 2
    c_in = jnp.concatenate([jnp.zeros_like(g[:1]), g[:-1]], axis=0)
    diff = (d + c_in) & MASK
    borrow = g[L - 1 : L] == 0    # no carry-out => r < p
    return jnp.where(borrow, r, diff)


def make_mul(n, tile=TILE):
    def kernel(p_ref, np_ref, a_ref, b_ref, o_ref):
        pL = p_ref[:]
        npL = np_ref[:]
        r = _mont_mul_tile(a_ref[:], b_ref[:], pL, npL)
        o_ref[:] = _cond_sub_p(r, pL)

    grid = n // tile
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((L, tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    )
    pT = jnp.asarray(np.broadcast_to(P_NP[:, None], (L, tile)).copy())
    npT = jnp.asarray(np.broadcast_to(NP_NP[:, None], (L, tile)).copy())
    return lambda a, b: call(pT, npT, a, b)


def make_mul12(n, tile=TILE):
    """Chain of 12 dependent muls in one kernel (point-add compute proxy)."""
    def kernel(p_ref, np_ref, a_ref, b_ref, o_ref):
        pL = p_ref[:]
        npL = np_ref[:]
        x = a_ref[:]
        y = b_ref[:]
        for _ in range(6):
            x2 = _mont_mul_tile(x, y, pL, npL)
            y = _mont_mul_tile(y, x, pL, npL)
            x = x2
        o_ref[:] = _cond_sub_p(x, pL)

    grid = n // tile
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((L, tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    )
    pT = jnp.asarray(np.broadcast_to(P_NP[:, None], (L, tile)).copy())
    npT = jnp.asarray(np.broadcast_to(NP_NP[:, None], (L, tile)).copy())
    return lambda a, b: call(pT, npT, a, b)


def timeit(fn, *args, iters=30, label=""):
    t0 = time.time()
    out = fn(*args); jax.block_until_ready(out)
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{label:40s} {dt*1e6:10.1f} us   (compile {comp:.1f}s)", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(5)
    av = [int(rng.integers(0, 2**62)) ** 2 % params.Q for _ in range(64)]
    bv = [int(rng.integers(0, 2**62)) ** 2 % params.Q for _ in range(64)]
    a_ll = np.tile(F.to_mont_host(av), (N // 64, 1))
    b_ll = np.tile(F.to_mont_host(bv), (N // 64, 1))
    a = jnp.asarray(a_ll.T.copy())
    b = jnp.asarray(b_ll.T.copy())

    mul = jax.jit(make_mul(N))
    ref = np.asarray(jax.jit(F.mul)(jnp.asarray(a_ll[:512]), jnp.asarray(b_ll[:512])))
    got = np.asarray(mul(a, b))[:, :512].T
    assert np.array_equal(ref, got), "pallas mul mismatch"
    print("pallas correctness ok", flush=True)

    timeit(mul, a, b, label="pallas mont_mul (24,65536)")
    mul12 = jax.jit(make_mul12(N))
    t12 = timeit(mul12, a, b, iters=10, label="pallas 12-dep-mul chain")
    print(f"per-mul in chain: {t12/12*1e6:.1f} us", flush=True)


if __name__ == "__main__":
    main()
