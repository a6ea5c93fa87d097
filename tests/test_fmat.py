"""fmat int8-MXU field engine unit tests (CPU): limb packing, the DFT/
Toeplitz matmul+reduce path vs host bigints, and the fused Pallas reduce
body (`fmat_pallas._reduce_body`) against the plain-XLA reduction chain it
replaces on TPU (same math, one kernel)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from aleo_tpu import params
from aleo_tpu.fields import fmat
from aleo_tpu.ntt import matntt
from aleo_tpu.reference import polynomial as rpoly

R = params.R


def test_pack_unpack_roundtrip():
    rng = random.Random(9001)
    vals = [rng.randrange(2 * R) for _ in range(64)]  # lazy range < 2p
    x16 = jnp.asarray(
        np.array(
            [[(v >> (16 * i)) & 0xFFFF for v in vals] for i in range(16)],
            dtype=np.uint32,
        )
    )
    back = fmat.unpack7(fmat.pack7(x16))
    assert np.array_equal(np.asarray(back), np.asarray(x16))


def test_dft_apply_matches_host():
    rng = random.Random(9002)
    d, T = 4, 8
    mat = [[rng.randrange(R) for _ in range(d)] for _ in range(d)]
    xs = [rng.randrange(R) for _ in range(d * T)]
    bank = jnp.asarray(fmat.dft_bank_np(mat))
    # (L7, d, T) limbs-first -> the (L7*d, T) ravel dft_apply expects
    x7 = fmat.encode7(xs).reshape(fmat.L7, d, T).reshape(fmat.L7 * d, T)
    y = fmat.dft_apply(bank, x7, d)
    got = fmat.decode7(y.reshape(fmat.L7, d * T))
    for r in range(d):
        for t in range(T):
            want = sum(mat[r][m] * xs[m * T + t] for m in range(d)) % R
            assert got[r * T + t] == want


def test_toeplitz_apply_matches_host():
    rng = random.Random(9003)
    B, T = 4, 8
    consts = [rng.randrange(R) for _ in range(B)]
    xs = [rng.randrange(R) for _ in range(B * T)]
    bank = jnp.asarray(fmat.toeplitz_bank_np(consts))
    x = jnp.stack(
        [fmat.encode7(xs[b * T : (b + 1) * T]) for b in range(B)]
    )  # (B, L7, T)
    y = fmat.toeplitz_apply(bank, x)
    for b in range(B):
        got = fmat.decode7(y[b])
        assert got == [consts[b] * v % R for v in xs[b * T : (b + 1) * T]]


def test_fused_reduce_body_matches_chain():
    """fmat_pallas._reduce_body (the TPU-fused Montgomery reduction) is
    bit-identical to fmat.mont_reduce_cols' carry/matmul chain on raw
    convolution columns from a real bank matmul."""
    from aleo_tpu.fields import fmat_pallas

    rng = random.Random(9004)
    d, T = 8, 16
    mat = [[rng.randrange(R) for _ in range(d)] for _ in range(d)]
    xs = [rng.randrange(R) for _ in range(d * T)]
    bank = jnp.asarray(fmat.dft_bank_np(mat))
    x7 = fmat.encode7(xs).reshape(fmat.L7, d, T).reshape(fmat.L7 * d, T)
    t_cols = jnp.matmul(
        bank.astype(jnp.int32), x7.astype(jnp.int32)
    ).reshape(fmat.K7, d * T)
    want = fmat.mont_reduce_cols(t_cols)  # CPU backend -> plain XLA chain
    Wnp, Wp = fmat._reduce_mats()
    got = fmat_pallas._reduce_body(
        t_cols, jnp.asarray(Wnp), jnp.asarray(Wp)
    )
    assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("n", [256, 4096])
def test_matntt_matches_host_ntt(n):
    rng = random.Random(9005)
    xs = [rng.randrange(R) for _ in range(n)]
    from aleo_tpu.fields.modring import FR_RING as F

    out = matntt.ntt_lf16(F.encode(xs).T)
    got = [v % R for v in F.decode(jnp.asarray(out).T)]
    assert got == rpoly.ntt(xs)


def test_matntt_batch_axis_matches_single(n=256, k=3):
    rng = random.Random(9006)
    from aleo_tpu.fields.modring import FR_RING as F

    cols = [[rng.randrange(R) for _ in range(n)] for _ in range(k)]
    xb = jnp.stack([F.encode(c).T for c in cols])  # (k, 16, n)
    outs = matntt.ntt_batch_lf16(xb)
    for i in range(k):
        got = [v % R for v in F.decode(jnp.asarray(outs[i]).T)]
        assert got == rpoly.ntt(cols[i])
