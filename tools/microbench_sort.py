#!/usr/bin/env python
"""Probe sort/gather costs for the MSM restructure."""
import sys, time
import jax, jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
N = 1 << 16


def timeit(fn, *args, iters=10, label=""):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{label:44s} {dt*1e6:10.1f} us", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(3)
    d1 = jnp.asarray(rng.integers(0, 1 << 16, (N,)), jnp.uint32)
    d16 = jnp.asarray(rng.integers(0, 1 << 16, (16, N)), jnp.uint32)
    pts = jnp.asarray(rng.integers(0, 1 << 16, (N, 24)), jnp.uint32)
    ptsT = jnp.asarray(rng.integers(0, 1 << 16, (24, N)), jnp.uint32)
    order = jnp.asarray(rng.permutation(N), jnp.int32)

    timeit(jax.jit(jnp.sort), d1, label="sort (65536,) u32")
    timeit(jax.jit(jnp.argsort), d1, label="argsort (65536,) u32")
    timeit(jax.jit(lambda x: jnp.argsort(x, axis=-1)), d16, label="argsort (16, 65536) u32")
    timeit(jax.jit(lambda p, o: p[o]), pts, order, label="gather rows (65536,24) by perm")
    timeit(jax.jit(lambda p, o: p[:, o]), ptsT, order, label="gather cols (24,65536) by perm")
    timeit(jax.jit(lambda p, o: jnp.take(p, o, axis=0)), pts, order, label="take rows (65536,24)")
    # scatter set rows
    timeit(jax.jit(lambda p, o: jnp.zeros_like(p).at[o].set(p)), pts, order,
           label="scatter-set rows (65536,24)")
    # one-hot matmul gather alternative for small permutation? skip.


if __name__ == "__main__":
    main()
