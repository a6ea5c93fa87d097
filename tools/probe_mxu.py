"""Probe raw MXU throughput for the dtype paths the field-matmul design
could use. Through the axon tunnel block_until_ready can return before the
device finishes, so every measurement chains ITERS dependent steps inside a
single jitted fori_loop and ends with a host materialization (np.asarray) —
the bench.py methodology.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

ITERS = 50


def timed(fn, x):
    out = fn(x)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile + settle
    t0 = time.time()
    out = fn(x)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / ITERS


def chain(step):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, ITERS, lambda i, v: step(v), x)

    return run


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # 1. big square matmul, int8 (chained via mask+cast to keep int8)
    n = 4096
    A8 = jnp.asarray(rng.integers(0, 127, (n, n)), dtype=jnp.int8)

    def step_s8(x):
        y = jax.lax.dot_general(
            A8, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (y & 127).astype(jnp.int8)

    dt = timed(chain(step_s8), A8)
    print(f"matmul {n}^3 s8 (chained): {dt*1e3:.3f} ms -> "
          f"{n**3/dt/1e12:.1f} T MAC/s", flush=True)

    # bf16
    Ab = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.bfloat16)

    def step_bf(x):
        y = jax.lax.dot_general(
            Ab, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return (y * 1e-3).astype(jnp.bfloat16)

    dt = timed(chain(step_bf), Ab)
    print(f"matmul {n}^3 bf16 (chained): {dt*1e3:.3f} ms -> "
          f"{n**3/dt/1e12:.1f} T MAC/s", flush=True)

    # 2. MatNTT DFT-stage shape: (32*78, 32*38) s8 @ (32*38, T) s8
    L, K = 38, 78
    for T in (1 << 14, 1 << 15):
        A = jnp.asarray(rng.integers(0, 127, (32 * K, 32 * L)), dtype=jnp.int8)
        X0 = jnp.asarray(rng.integers(0, 127, (32 * L, T)), dtype=jnp.int8)

        def step_dft(x):
            y = jax.lax.dot_general(
                A, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (32*78, T)
            return (y[: 32 * L] & 127).astype(jnp.int8)

        dt = timed(chain(step_dft), X0)
        macs = (32 * K) * (32 * L) * T
        print(f"DFT32-stage s8 T={T}: {dt*1e3:.3f} ms -> "
              f"{macs/dt/1e12:.1f} T MAC/s, {32*T/dt/1e6:.0f} M elem/s",
              flush=True)

    # 3. batched Toeplitz const-mul: (B, 78, 38) s8 @ (B, 38, lanes) s8
    for B, lanes in ((1024, 1024), (32768, 32), (128, 256)):
        W = jnp.asarray(rng.integers(0, 127, (B, K, L)), dtype=jnp.int8)
        X0 = jnp.asarray(rng.integers(0, 127, (B, L, lanes)), dtype=jnp.int8)

        def step_t(x):
            y = jax.lax.dot_general(
                W, x, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )  # (B, 78, lanes)
            return (y[:, :L] & 127).astype(jnp.int8)

        dt = timed(chain(step_t), X0)
        macs = B * K * L * lanes
        print(f"toeplitz B={B} lanes={lanes}: {dt*1e3:.3f} ms -> "
              f"{macs/dt/1e12:.2f} T MAC/s, {B*lanes/dt/1e6:.1f} M mul/s",
              flush=True)

    # 4. carry pass standalone over (78, N) limbs-first
    from tools.proto_int8_mul import BASE, LIMB_BITS

    def carryT(c):
        x = c
        for _ in range(3):
            lo = x & (BASE - 1)
            hi = x >> LIMB_BITS
            x = lo + jnp.concatenate([jnp.zeros_like(hi[:1]), hi[:-1]], axis=0)
        d = x & (BASE - 1)
        g = (x >> LIMB_BITS).astype(jnp.int32)
        pr = (d == BASE - 1).astype(jnp.int32)
        Kk = c.shape[0]
        sh = 1
        while sh < Kk:
            zs = jnp.zeros_like(g[:sh])
            g = g | (pr & jnp.concatenate([zs, g[:-sh]], axis=0))
            pr = pr & jnp.concatenate([zs, pr[:-sh]], axis=0)
            sh *= 2
        c_in = jnp.concatenate([jnp.zeros_like(g[:1]), g[:-1]], axis=0)
        return (d + c_in) & (BASE - 1)

    for N in (1 << 17, 1 << 20):
        cols0 = jnp.asarray(
            rng.integers(0, 1 << 24, (K, N)), dtype=jnp.int32
        )

        def step_c(x):
            return carryT(x) + (x & 1)  # keep int32, data-dependent

        dt = timed(chain(step_c), cols0)
        print(f"carryT ({K}, 2^{N.bit_length()-1}): {dt*1e3:.3f} ms", flush=True)

    # 5. VPU u32 multiply rate reference
    for N in (1 << 20,):
        x0 = jnp.asarray(rng.integers(0, 1 << 16, (16, N)), dtype=jnp.uint32)

        def step_m(x):
            return (x * x) & 0xFFFF

        dt = timed(chain(step_m), x0)
        print(f"u32 mul (16, 2^20): {dt*1e3:.3f} ms -> "
              f"{16*N/dt/1e9:.1f} G mul/s", flush=True)

        def step_a(x):
            return (x + x) & 0xFFFF

        dt = timed(chain(step_a), x0)
        print(f"u32 add+and (16, 2^20): {dt*1e3:.3f} ms -> "
              f"{16*N/dt/1e9:.1f} G op-pair/s", flush=True)


if __name__ == "__main__":
    main()
