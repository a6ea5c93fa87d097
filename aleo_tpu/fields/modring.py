"""Batched Montgomery modular arithmetic on 16-bit limbs (the TPU compute core).

This is the TPU-native replacement for the reference's `snarkvm-fields`
multi-limb Montgomery arithmetic (SURVEY.md §2.8 item 1; the Rust crate uses
64-bit limbs + u128 carries, which do not exist on TPU). Design:

  * A field element is a little-endian vector of 16-bit limbs stored in
    uint32 lanes, shape (..., L). Fq: L = 24 (384 bits), Fr: L = 16 (256).
  * 16x16-bit limb products fit exactly in uint32; schoolbook-convolution
    column sums stay < 2^22, so whole convolutions run carry-free on the VPU
    and carries are resolved by one sequential scan pass at the end.
  * Multiplication is Montgomery with full-width radix R = 2^(16 L):
        t = a * b                       (2L columns)
        m = (t mod R) * N' mod R        (N' = -p^-1 mod R)
        res = (t + m * p) / R  in [0, 2p), then one conditional subtract.
    Keeping the radix full-width turns the reduction into two more
    convolutions — no per-limb sequential CIOS dependency chain, which is
    what makes this formulation vectorize on the VPU.
  * All elements on device live in Montgomery form.

Everything here is pure jnp and jittable; limbs-first primitives used by the
Pallas-fused kernels live in aleo_tpu/fields/limb_kernels.py.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import params

LIMB_BITS = params.LIMB_BITS
MASK = params.LIMB_MASK


def int_to_limbs(x: int, n_limbs: int) -> np.ndarray:
    out = np.zeros(n_limbs, dtype=np.uint32)
    for i in range(n_limbs):
        out[i] = x & MASK
        x >>= LIMB_BITS
    assert x == 0, "value does not fit in limbs"
    return out


def ints_to_limbs(xs: Sequence[int], n_limbs: int) -> np.ndarray:
    """Vectorized host conversion: list of ints -> (N, L) uint32."""
    nbytes = n_limbs * 2
    buf = b"".join(int(x).to_bytes(nbytes, "little") for x in xs)
    return np.frombuffer(buf, dtype="<u2").reshape(len(xs), n_limbs).astype(np.uint32)


def limbs_to_ints(a) -> np.ndarray:
    """(..., L) uint32 -> object array of python ints."""
    a = np.asarray(a)
    flat = a.reshape(-1, a.shape[-1])
    out = np.empty(flat.shape[0], dtype=object)
    for i, row in enumerate(flat):
        v = 0
        for k in range(len(row) - 1, -1, -1):
            v = (v << LIMB_BITS) | int(row[k])
        out[i] = v
    return out.reshape(a.shape[:-1])


class ModRing:
    """Montgomery arithmetic mod a fixed prime, vectorized over leading dims."""

    def __init__(self, p: int, n_limbs: int, name: str):
        self.p = p
        self.L = n_limbs
        self.name = name
        self.R_mont = 1 << (LIMB_BITS * n_limbs)
        self.R_mod = self.R_mont % p
        self.R2 = (self.R_mont * self.R_mont) % p
        self.nprime = (-pow(p, -1, self.R_mont)) % self.R_mont

        self.p_limbs = jnp.asarray(int_to_limbs(p, n_limbs))
        self.np_limbs = jnp.asarray(int_to_limbs(self.nprime, n_limbs))
        self.r2_limbs = jnp.asarray(int_to_limbs(self.R2, n_limbs))
        self.one_mont = jnp.asarray(int_to_limbs(self.R_mod, n_limbs))
        self.zero = jnp.zeros(n_limbs, dtype=jnp.uint32)
        # bits of p - 2, LSB first, for Fermat inversion
        self._inv_exp_bits = jnp.asarray(
            [(p - 2) >> i & 1 for i in range((p - 2).bit_length())], dtype=jnp.uint32
        )
        # One-hot convolution tensors: cols[k] = sum_{i+j=k} lo(a_i b_j)
        #                                     + sum_{i+j+1=k} hi(a_i b_j).
        # Shaped (2, L, L, 2L); contracting against the stacked lo/hi product
        # tensor turns the whole schoolbook convolution into ONE dot_general,
        # which keeps the op count (and XLA compile time) small.
        L = n_limbs
        E = np.zeros((2, L, L, 2 * L), dtype=np.uint32)
        for i in range(L):
            for j in range(L):
                E[0, i, j, i + j] = 1
                E[1, i, j, i + j + 1] = 1
        # Stored directly as f32 (the contraction dtype) so every mul call
        # site shares one constant instead of re-materializing casts.
        self._conv_full = jnp.asarray(E, dtype=jnp.float32)
        self._conv_low = jnp.asarray(E[..., :L].copy(), dtype=jnp.float32)

    # -- host <-> device ----------------------------------------------------

    def to_mont_host(self, xs: Sequence[int]) -> np.ndarray:
        return ints_to_limbs([(x % self.p) * self.R_mod % self.p for x in xs], self.L)

    def from_mont_host(self, a) -> np.ndarray:
        rinv = pow(self.R_mod, -1, self.p)
        ints = limbs_to_ints(a)
        flat = ints.reshape(-1) if ints.ndim else ints.reshape(1)
        out = np.empty(flat.shape, dtype=object)
        for i, v in enumerate(flat.tolist() if hasattr(flat, "tolist") else flat):
            out[i] = v * rinv % self.p
        return out.reshape(ints.shape) if ints.ndim else out[0]

    def encode(self, xs: Sequence[int]) -> jnp.ndarray:
        """Host ints -> device Montgomery limbs (N, L)."""
        return jnp.asarray(self.to_mont_host(xs))

    def decode(self, a) -> np.ndarray:
        """Device Montgomery limbs -> host ints."""
        return self.from_mont_host(np.asarray(a))

    def const(self, x: int) -> jnp.ndarray:
        """Single constant in Montgomery form, shape (L,)."""
        return jnp.asarray(int_to_limbs(x % self.p * self.R_mod % self.p, self.L))

    # -- carry machinery ----------------------------------------------------

    @staticmethod
    def _ppadd(x, y, carry_in: int = 0):
        """Parallel-prefix (Kogge-Stone) addition of two 16-bit-limb numbers.

        x, y: (..., K) uint32 with x + y < 2^17 per position (i.e. both
        operands' positions <= ~2^16). Returns (sum limbs, carry_out).
        Log-depth instead of a K-long ripple chain — this both compiles fast
        and maps well onto the VPU.
        """
        s = x + y
        if carry_in:
            s = s.at[..., 0].add(jnp.uint32(carry_in))
        d = s & MASK
        g = s >> LIMB_BITS           # generate, in {0, 1}
        pf = (d == MASK)             # propagate

        def comb(lo, hi):
            gl, pl = lo
            gh, ph = hi
            return (gh | (ph & gl), ph & pl)

        G, _ = jax.lax.associative_scan(comb, (g.astype(jnp.uint32), pf), axis=-1)
        c_in = jnp.concatenate([jnp.zeros_like(G[..., :1]), G[..., :-1]], axis=-1)
        return (d + c_in) & MASK, G[..., -1]

    def _carry(self, cols: jnp.ndarray) -> jnp.ndarray:
        """Normalize column sums (each < 2^22) to 16-bit limbs. Drops overflow
        beyond the last column, which the call sites' range analysis
        guarantees is absent."""
        lo = cols & MASK
        hi = cols >> LIMB_BITS       # <= 2^6 per position
        hi_shift = jnp.concatenate([jnp.zeros_like(hi[..., :1]), hi[..., :-1]], axis=-1)
        out, _ = self._ppadd(lo, hi_shift)
        return out

    def _sub_chain(self, a, b):
        """a - b limbwise; returns (diff limbs, borrow_out in {0,1})."""
        a, b = jnp.broadcast_arrays(a, b)
        tw = MASK - b                # 16-bit one's complement
        out, carry = self._ppadd(a, tw, carry_in=1)
        return out, jnp.uint32(1) - carry

    def _cond_sub_p(self, a):
        d, borrow = self._sub_chain(a, jnp.broadcast_to(self.p_limbs, a.shape))
        return jnp.where((borrow == 0)[..., None], d, a)

    # -- ring ops ------------------------------------------------------------

    def add(self, a, b):
        cols = a + b
        return self._cond_sub_p(self._carry(cols))

    def sub(self, a, b):
        d, borrow = self._sub_chain(a, b)
        dp = self._carry(d + self.p_limbs)
        return jnp.where((borrow == 1)[..., None], dp, d)

    def neg(self, a):
        is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
        d, _ = self._sub_chain(jnp.broadcast_to(self.p_limbs, a.shape), a)
        return jnp.where(is_zero, a, d)

    def double(self, a):
        return self.add(a, a)

    def _mul_cols(self, a, b, out_cols=None):
        """Schoolbook convolution columns: (..., L) x (..., L) -> (..., K).

        16x16-bit limb products are exact in uint32; lo/hi 16-bit halves are
        accumulated into their columns by a single one-hot contraction.
        Column sums are < 2L * 2^16 < 2^22, far from uint32 overflow.
        """
        K = out_cols or 2 * self.L
        a, b = jnp.broadcast_arrays(a, b)
        p = a[..., :, None] * b[..., None, :]            # (..., L, L)
        ps = jnp.stack([p & MASK, p >> LIMB_BITS], axis=-3)  # (..., 2, L, L)
        E = self._conv_full if K == 2 * self.L else self._conv_low
        # The contraction runs in float32: every term is < 2^16 and every
        # column sum < 2^22, both exactly representable in f32, so the result
        # is bit-exact while hitting real matmul units (Eigen GEMM on CPU,
        # MXU on TPU) instead of naive integer loops.
        # Precision.HIGHEST is mandatory on TPU: the default MXU f32 path
        # truncates through single-pass bf16, which silently corrupts the
        # integer arithmetic. HIGHEST (multi-pass bf16) is exact for 16-bit
        # operands with <2^24 column sums.
        cols = jnp.einsum(
            "...xij,xijk->...k",
            ps.astype(jnp.float32),
            E,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return cols.astype(jnp.uint32)

    def mul(self, a, b):
        """Montgomery product: a * b * R^-1 mod p (inputs/outputs in Mont form)."""
        L = self.L
        cols = self._mul_cols(a, b)              # (..., 2L), sums < 2^22
        t = self._carry(cols)                    # exact limbs of a*b (< p^2 < R^2)
        m_cols = self._mul_cols(t[..., :L], self.np_limbs, out_cols=L)
        m = self._carry(m_cols)                  # (t mod R) * N' mod R
        u_cols = self._mul_cols(m, self.p_limbs) + t
        u = self._carry(u_cols)                  # t + m*p, low L limbs == 0
        return self._cond_sub_p(u[..., L:])

    def sq(self, a):
        return self.mul(a, a)

    def mul_small(self, a, k: int):
        """Multiply by a small host constant via repeated addition (k <= 8)."""
        acc = jnp.zeros_like(a)
        base = a
        kk = k
        while kk:
            if kk & 1:
                acc = self.add(acc, base)
            kk >>= 1
            if kk:
                base = self.add(base, base)
        return acc

    def pow_fixed(self, a, e: int):
        """a^e for a small host-known exponent (unrolled square-and-multiply)."""
        assert e >= 1
        bits = bin(e)[2:]
        acc = a
        for bit in bits[1:]:
            acc = self.sq(acc)
            if bit == "1":
                acc = self.mul(acc, a)
        return acc

    def inv(self, a):
        """Fermat inversion a^(p-2) via an MSB-first square-and-multiply scan
        (compiles the round body once instead of unrolling ~380 rounds)."""
        bits = jnp.asarray([int(b) for b in bin(self.p - 2)[2:]], dtype=jnp.uint32)

        def step(acc, bit):
            acc = self.sq(acc)
            with_mul = self.mul(acc, a)
            return jnp.where(bit == 1, with_mul, acc), None

        acc0 = jnp.broadcast_to(self.one_mont, a.shape)
        out, _ = jax.lax.scan(step, acc0, bits)
        return out

    def scan_mul(self, a, reverse: bool = False):
        """Inclusive prefix product along axis 0 (Hillis-Steele under
        fori_loop: a single mul instance in the compiled graph)."""
        n = a.shape[0]
        if n == 1:
            return a
        logn = max(1, (n - 1).bit_length())
        iota = jnp.arange(n, dtype=jnp.int32)
        if reverse:
            iota = iota[::-1]

        def body(d, v):
            o = jnp.int32(1) << d
            vs = jnp.roll(v, -o if reverse else o, axis=0)
            prod = self.mul(v, vs)
            valid = iota >= o
            return self.select(valid, prod, v)

        return jax.lax.fori_loop(0, logn, body, a)

    def batch_inv(self, a):
        """Batched inversion: prefix/suffix products + one Fermat inversion.

        inv_i = prefix_{i-1} * suffix_{i+1} * (total)^-1. a: (N, L), no zero
        entries (zeros produce garbage, as in the reference's bigint batch
        inversion).
        """
        n = a.shape[0]
        if n == 1:
            return self.inv(a)
        pre = self.scan_mul(a)                      # (N, L), pre[i] = a0..ai
        suf = self.scan_mul(a, reverse=True)        # suf[i] = ai..a_{n-1}
        total_inv = self.inv(pre[-1:])              # (1, L)
        one = jnp.broadcast_to(self.one_mont, (1, self.L))
        pre_shift = jnp.concatenate([one, pre[:-1]], axis=0)
        suf_shift = jnp.concatenate([suf[1:], one], axis=0)
        return self.mul(self.mul(pre_shift, suf_shift), total_inv)

    # -- form conversions on device -----------------------------------------

    def to_mont(self, a_raw):
        return self.mul(a_raw, self.r2_limbs)

    def from_mont(self, a):
        one_raw = jnp.zeros(self.L, dtype=jnp.uint32).at[0].set(1)
        return self.mul(a, one_raw)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def select(self, cond, a, b):
        """cond: (...,) bool; a, b: (..., L)."""
        return jnp.where(cond[..., None], a, b)


FQ_RING = ModRing(params.Q, params.FQ_LIMBS, "Fq")
FR_RING = ModRing(params.R, params.FR_LIMBS, "Fr")
