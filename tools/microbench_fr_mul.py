"""Compare Fr mul formulations on the current backend (run on real TPU).

Paths:
  a) modring einsum Montgomery mul, limbs-last (n, L)
  b) limbs-first jnp conv (limb_kernels.mont_mul), (L, n), plain XLA
  c) limbs-first Pallas-fused mul kernel (TPU only)

Also times a fused NTT-butterfly-stage shape for (b): mul + add/sub + select.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from aleo_tpu import params
from aleo_tpu.fields import limb_kernels as lk
from aleo_tpu.fields.modring import FR_RING as F

N = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16


def bench(fn, *args, iters=20, label=""):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])   # force a real device sync:
    t0 = time.time()                      # block_until_ready returns early
    for _ in range(iters):                # through the axon tunnel and
        out = fn(*args)                   # underreports by >10x
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.time() - t0) / iters
    print(f"{label:32s} {dt*1e3:8.3f} ms  {N/dt/1e6:10.2f} Mmul/s")
    return out


def main():
    print("backend:", jax.default_backend(), "N =", N)
    rng = np.random.default_rng(0)
    a_int = [int.from_bytes(rng.bytes(31), "little") % params.R for _ in range(N)]
    b_int = [int.from_bytes(rng.bytes(31), "little") % params.R for _ in range(N)]
    a = F.encode(a_int)
    b = F.encode(b_int)

    mul_j = jax.jit(F.mul)
    bench(mul_j, a, b, label="einsum limbs-last")

    ring = lk.get_fr()
    consts = {k: jnp.asarray(v[:, None]) for k, v in ring.rows.items()}
    alf = a.T
    blf = b.T

    @jax.jit
    def lf_mul(x, y):
        return lk.mont_mul(consts, x, y)

    out_lf = bench(lf_mul, alf, blf, label="limbs-first jnp conv")

    # correctness spot check (lf result < 2p lazy; normalize first)
    @jax.jit
    def lf_norm(x):
        return lk.normalize(consts, x)

    got = F.decode(np.asarray(lf_norm(out_lf)).T[:8])
    want = F.decode(np.asarray(mul_j(a, b))[:8])
    assert list(got) == list(want), (got, want)
    print("lf == einsum: ok")

    if jax.default_backend() == "tpu":
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        L = ring.L
        TILE = 2048

        def kernel(c_ref, x_ref, y_ref, o_ref):
            c = ring.unpack_consts(c_ref[:])
            o_ref[:] = lk.mont_mul(c, x_ref[:], y_ref[:])

        spec = pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec(
            (ring.n_const_rows, TILE), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, N), jnp.uint32),
            grid=(N // TILE,),
            in_specs=[cspec, spec, spec],
            out_specs=spec,
        )
        cblk = jnp.asarray(ring.const_block(TILE))
        pmul = jax.jit(lambda x, y: call(cblk, x, y))
        out_p = bench(pmul, alf, blf, label="limbs-first pallas fused")
        got = F.decode(np.asarray(lf_norm(out_p)).T[:8])
        assert list(got) == list(want)
        print("pallas == einsum: ok")

    # butterfly-stage shape: gather twiddle + mul + add/sub/select, jnp lf
    wtab = F.encode([pow(5, i, params.R) for i in range(N)]).T
    iota = jnp.arange(N, dtype=jnp.int32)

    @jax.jit
    def stage_lf(x):
        tw = wtab[:, (iota * 7) & (N - 1)]
        m = lk.mont_mul(consts, tw, x)
        partner_idx = iota ^ 128
        m_p = m[:, partner_idx]
        x_p = x[:, partner_idx]
        lower = ((iota & 128) == 0)[None, :]
        s = lk.add(consts, x, m_p)
        d = lk.sub(consts, x_p, m)
        return jnp.where(lower, s, d)

    bench(stage_lf, alf, label="bfly stage limbs-first jnp")

    @jax.jit
    def stage_ll(x):
        tw = wtab.T[(iota * 7) & (N - 1)]
        m = F.mul(tw, x)
        partner_idx = iota ^ 128
        m_p = m[partner_idx]
        x_p = x[partner_idx]
        lower = (iota & 128) == 0
        return F.select(lower, F.add(x, m_p), F.sub(x_p, m))

    bench(stage_ll, a, label="bfly stage einsum limbs-last")


if __name__ == "__main__":
    main()
