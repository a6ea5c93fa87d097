"""Prototype: constant-point Montgomery mul as batched int8 MXU matmuls.

The round-4 design study (BASELINE.md lever #1). Key observation: every mul
on the NTT critical path multiplies by a CONSTANT (twiddles, coset scalings,
n^-1) shared across lanes, so the limb convolution becomes a matrix-vector
product with a constant Toeplitz band matrix:

    cols[k] = sum_j w[k-j] * b[j]      =>      cols = W @ b

With 7-bit limbs (max 127) both W and b fit int8, products accumulate in
int32 — the s8 x s8 -> s32 MXU path (~394 TOPS on v5e vs ~0.18 Tops for the
u32 VPU limb stream). A full Montgomery constant-mul is 3 such matmuls
(W, N', p are all constants) + base-128 carry normalization.

This prototype validates (a) bit-exactness of the 7-bit-limb Montgomery
pipeline against python bigints, (b) the achievable matmul rate at NTT-like
shapes (batched over the twiddle index j with n2 lanes per matrix).

Run: python tools/proto_int8_mul.py [log2_batch]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from aleo_tpu import params

R = params.R
LIMB_BITS = 7
BASE = 1 << LIMB_BITS
L7 = -(-259 // LIMB_BITS)        # 37 limbs -> R7 = 2^259
R7 = 1 << (LIMB_BITS * L7)
assert 4 * R <= R7
NPRIME = (-pow(R, -1, R7)) % R7
R7_MOD = R7 % R
R7_SQ = R7_MOD * R7_MOD % R


def to_limbs7(x: int) -> np.ndarray:
    out = np.zeros(L7, dtype=np.int8)
    for i in range(L7):
        out[i] = x & (BASE - 1)
        x >>= LIMB_BITS
    assert x == 0
    return out


def from_limbs7(a) -> int:
    v = 0
    for k in range(len(a) - 1, -1, -1):
        v = (v << LIMB_BITS) | int(a[k])
    return v


def band_matrix(c_limbs: np.ndarray, out_cols: int) -> np.ndarray:
    """Toeplitz band W[k, j] = c[k - j] for the convolution by constant c."""
    W = np.zeros((out_cols, L7), dtype=np.int8)
    for k in range(out_cols):
        for j in range(L7):
            i = k - j
            if 0 <= i < L7:
                W[k, j] = c_limbs[i]
    return W


def mont_const_matrices(c_mont: int):
    """The three constant matrices of a Montgomery mul by c (in Mont form)."""
    Wc = band_matrix(to_limbs7(c_mont), 2 * L7)
    Wnp = band_matrix(to_limbs7(NPRIME), L7)      # truncated mod R7
    Wp = band_matrix(to_limbs7(R), 2 * L7)
    return Wc, Wnp, Wp


def carry7(cols):
    """Normalize int32 column values (< 2^24) to 7-bit limbs, dropping the
    carry out of the top column (mod-R7 semantics). cols: (..., K).

    Three magnitude-reduction rounds bring values <= BASE, then an exact
    Kogge-Stone generate/propagate pass resolves arbitrary ripple chains.
    """
    c = cols
    for _ in range(3):
        lo = c & (BASE - 1)
        hi = c >> LIMB_BITS
        c = lo + jnp.concatenate(
            [jnp.zeros_like(hi[..., :1]), hi[..., :-1]], axis=-1
        )
    d = c & (BASE - 1)
    g = (c >> LIMB_BITS).astype(jnp.int32)       # in {0, 1}
    pr = (d == BASE - 1).astype(jnp.int32)
    K = cols.shape[-1]
    sh = 1
    while sh < K:
        zs = jnp.zeros_like(g[..., :sh])
        gs = jnp.concatenate([zs, g[..., :-sh]], axis=-1)
        ps = jnp.concatenate([zs, pr[..., :-sh]], axis=-1)
        g = g | (pr & gs)
        pr = pr & ps
        sh *= 2
    c_in = jnp.concatenate([jnp.zeros_like(g[..., :1]), g[..., :-1]], axis=-1)
    return (d + c_in) & (BASE - 1)


def mont_mul_const(Wc, Wnp, Wp, b):
    """b: (..., L7) int8 limbs (Montgomery form) -> (..., L7) int32 < 2p."""
    f32 = jnp.int32
    t_cols = jax.lax.dot_general(
        b, Wc.T, (((b.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                             # (..., 2 L7)
    t = carry7(t_cols)
    t_lo = t[..., :L7].astype(jnp.int8)           # values < 128 ✓
    m_cols = jax.lax.dot_general(
        t_lo, Wnp.T, (((b.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    m = carry7(m_cols)[..., :L7].astype(jnp.int8)
    u_cols = jax.lax.dot_general(
        m, Wp.T, (((b.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + t_cols
    u = carry7(u_cols)
    return u[..., L7:]


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    N = 1 << logn
    rng = np.random.default_rng(3)

    # ---- correctness (host) -------------------------------------------------
    c_int = int.from_bytes(rng.bytes(31), "little") % R
    c_mont = c_int * R7_MOD % R
    Wc, Wnp, Wp = (jnp.asarray(m) for m in mont_const_matrices(c_mont))
    b_ints = [int.from_bytes(rng.bytes(31), "little") % R for _ in range(64)]
    b_mont = np.stack([to_limbs7(b * R7_MOD % R) for b in b_ints])
    out = np.asarray(mont_mul_const(Wc, Wnp, Wp, jnp.asarray(b_mont)))
    ok = True
    for i, b in enumerate(b_ints):
        got = from_limbs7(out[i]) % R            # lazy < 2p -> reduce
        want = (c_int * b) % R * R7_MOD % R      # Montgomery form of c*b
        ok &= got == want
    print(f"bit-exact vs bigints: {ok}", flush=True)
    assert ok

    # ---- throughput at NTT-stage shape -------------------------------------
    # stage shape: n1/2 distinct twiddles, each multiplying n2 lanes:
    # batched dot_general (j, 2L7, L7) x (j, L7, n2)
    n1 = 1 << (logn // 2)
    n2 = N // n1
    half = n1 // 2
    Wc_b = jnp.asarray(
        np.stack([np.asarray(Wc)] * half)        # same matrix per j (shape proxy)
    )
    x = jnp.asarray(
        rng.integers(0, 127, size=(half, L7, n2), dtype=np.int8)
    )

    @jax.jit
    def stage_mul(xb):
        t_cols = jax.lax.dot_general(
            Wc_b, xb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )                                         # (j, 2L7, n2)
        return carry7(t_cols.swapaxes(1, 2)).swapaxes(1, 2)

    out = stage_mul(x)
    jax.block_until_ready(out)
    t0 = time.time()
    iters = 50
    for _ in range(iters):
        out = stage_mul(x)
    np.asarray(out)
    dt = (time.time() - t0) / iters
    muls = half * n2
    macs = muls * 2 * L7 * L7 * 2
    print(
        f"stage-mul ({half} twiddles x {n2} lanes = {muls} muls): "
        f"{dt*1e3:.3f} ms -> {muls/dt/1e6:.1f} M mul/s, "
        f"{macs/dt/1e12:.2f} T int8-MAC/s",
        flush=True,
    )

    # full constant montgomery mul (3 matmuls + carries) over a flat batch
    b_big = jnp.asarray(rng.integers(0, 127, size=(N, L7), dtype=np.int8))

    @jax.jit
    def full_mul(bb):
        return mont_mul_const(Wc, Wnp, Wp, bb)

    out2 = full_mul(b_big)
    jax.block_until_ready(out2)
    t0 = time.time()
    for _ in range(iters):
        out2 = full_mul(b_big)
    np.asarray(out2)
    dt = (time.time() - t0) / iters
    print(
        f"full mont const-mul batch 2^{logn}: {dt*1e3:.3f} ms -> "
        f"{N/dt/1e6:.1f} M mul/s (limb path today: ~24 M mul/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
