"""Fr field ops as int8 MXU matmuls (7-bit limbs) — the MatNTT compute core.

TPU-native replacement for the NTT hot path of snarkVM's polynomial FFT
(`snarkvm-algorithms` fft, SURVEY.md §2.8 item 4). The VPU limb-convolution
path (fields/limb_kernels.py) tops out near the chip's u32-multiply rate
(~23 G mul/s measured); this module instead routes every constant-by-variable
multiplication through the MXU's s8xs8->s32 path (~78 T MAC/s measured via
tools/probe_mxu.py), which covers the entire NTT critical path:

  * DFT matrices  -> one "limb-blocked" int8 matmul per radix stage,
  * twiddle/coset tables -> batched Toeplitz constant-mul matmuls,
  * Montgomery reduction -> block-diagonal constant matmuls.

Representation: a field element batch is (L7, ...) int8 — 38 little-endian
7-bit limbs (axis 0), value < 2^266 = R7 (the Montgomery radix of this
module). Constants are stored in R7-Montgomery form (c * R7 mod p), so each
matmul's Montgomery reduction by R7 preserves whatever external form the
variable data carries — the 16-bit pipeline's 2^256 form flows through
unchanged, and only limb REPACKING happens at module boundaries (no form
conversion).

Why 7-bit limbs: band-matrix entries and data limbs must fit int8 (<= 127)
for the MXU s8 path; products are 14-bit and column sums stay < 2^26 under
a conv width of 38 and radix <= 64, far from int32 overflow.

Why L7 = 38 (266 bits) for a 253-bit prime: the matmul accumulates up to 64
unreduced products, so a single Montgomery reduction leaves values
u < t/R7 + p; with R7 >= 2^13 * p the lazy bound converges to < 1.1p and
always fits 38 limbs.

All functions are pure jnp (XLA) and run on CPU for tests; the carry
normalization (the only HBM-bound step) has a fused Pallas TPU kernel in
fmat_pallas.py with this module's jnp version as the fallback/oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import params

LIMB_BITS = 7
BASE = 1 << LIMB_BITS
L7 = 38                      # limbs per element
K7 = 2 * L7                  # convolution columns
R7 = 1 << (LIMB_BITS * L7)   # Montgomery radix 2^266

P = params.R                 # the Fr modulus (snarkVM scalar field)
assert (1 << 13) * P <= R7, "lazy accumulation bound needs R7 >= 2^13 p"
NPRIME = (-pow(P, -1, R7)) % R7
R7_MOD = R7 % P


# ---------------------------------------------------------------------------
# host-side packing / band-matrix builders (numpy)
# ---------------------------------------------------------------------------


def to7_np(xs) -> np.ndarray:
    """Host ints (< R7) -> (N, L7) int8 limbs (little-endian)."""
    out = np.zeros((len(xs), L7), dtype=np.int8)
    for n, x in enumerate(xs):
        x = int(x)
        for i in range(L7):
            out[n, i] = x & (BASE - 1)
            x >>= LIMB_BITS
        assert x == 0
    return out


def from7_np(a: np.ndarray):
    """(..., L7) limbs -> object array of host ints."""
    a = np.asarray(a, dtype=np.int64)
    flat = a.reshape(-1, a.shape[-1])
    out = np.empty(flat.shape[0], dtype=object)
    for n, row in enumerate(flat):
        v = 0
        for k in range(len(row) - 1, -1, -1):
            v = (v << LIMB_BITS) | int(row[k])
        out[n] = v
    return out.reshape(a.shape[:-1])


def band_np(c: int, out_cols: int) -> np.ndarray:
    """Toeplitz band W[k, j] = limb_{k-j}(c): conv-by-c as a matmul."""
    limbs = to7_np([c])[0]
    W = np.zeros((out_cols, L7), dtype=np.int8)
    for k in range(out_cols):
        lo = max(0, k - L7 + 1)
        for j in range(lo, min(L7, k + 1)):
            W[k, j] = limbs[k - j]
    return W


@functools.lru_cache(maxsize=None)
def _reduce_mats():
    """(Wnp (L7, L7), Wp (K7, L7)) numpy int8 — the two constant matrices of
    the R7-Montgomery reduction (m = t*N' mod R7; u = (t + m*p)/R7)."""
    Wnp = band_np(NPRIME, L7)
    Wp = band_np(P, K7)
    return Wnp, Wp


def toeplitz_bank_np(consts) -> np.ndarray:
    """Constants (plain ints mod p) -> (B, K7, L7) int8 Toeplitz bank for a
    batched Montgomery const-mul. Entries carry the R7 form factor so the
    reduction preserves the variable operand's external form."""
    return np.stack([band_np(c % P * R7_MOD % P, K7) for c in consts])


def dft_bank_np(mat) -> np.ndarray:
    """DFT matrix (R x M plain ints mod p) -> big int8 matmul matrix of shape
    (K7 * R, L7 * M), row index k*R + r, col index j*M + m — matching the
    natural ravel of (L7, M, T) limbs-first data and (K7, R, T) output.

    Y[(k, r), t] = sum_{(j, m)} limb_{k-j}(mat[r][m] * R7) * X[(j, m), t]
    computes the raw 76-column convolution sums of sum_m mat[r][m]*x[m] for
    every lane t — the whole radix-R DFT stage as ONE s8 matmul.
    """
    mat = [[int(v) % P * R7_MOD % P for v in row] for row in mat]
    Rr, M = len(mat), len(mat[0])
    limbs = np.zeros((Rr, M, L7), dtype=np.int8)
    for r in range(Rr):
        for m in range(M):
            limbs[r, m] = to7_np([mat[r][m]])[0]
    A = np.zeros((K7, Rr, L7, M), dtype=np.int8)
    for k in range(K7):
        lo = max(0, k - L7 + 1)
        for j in range(lo, min(L7, k + 1)):
            A[k, :, j, :] = limbs[:, :, k - j]
    return A.reshape(K7 * Rr, L7 * M)


# ---------------------------------------------------------------------------
# device ops (pure jnp; the Pallas TPU carry in fmat_pallas.py is swapped in
# by the dispatchers below when running on TPU)
# ---------------------------------------------------------------------------


def _shift_down(x: jnp.ndarray, s: int, axis: int) -> jnp.ndarray:
    """Shift rows toward higher indices along `axis`, zero-filling."""
    pad = jnp.zeros_like(jax.lax.slice_in_dim(x, 0, s, axis=axis))
    keep = jax.lax.slice_in_dim(x, 0, x.shape[axis] - s, axis=axis)
    return jnp.concatenate([pad, keep], axis=axis)


def carry_cols(cols: jnp.ndarray, peels: int = 4, axis: int = 0) -> jnp.ndarray:
    """Normalize int32 column sums (< 2^26) to 7-bit limbs along `axis`.

    `peels` magnitude-reduction rounds bring values <= 255, then an exact
    Kogge-Stone generate/propagate pass resolves the remaining ripple
    chains. Carry out of the top position is dropped (callers' range
    analysis guarantees it is absent). Returns int32 in [0, 127].
    """
    K = cols.shape[axis]
    x = cols
    for _ in range(peels):
        lo = x & (BASE - 1)
        hi = x >> LIMB_BITS
        x = lo + _shift_down(hi, 1, axis)
    d = x & (BASE - 1)
    g = x >> LIMB_BITS                       # in {0, 1} after peels
    pr = (d == BASE - 1).astype(jnp.int32)
    sh = 1
    while sh < K:
        g = g | (pr & _shift_down(g, sh, axis))
        pr = pr & _shift_down(pr, sh, axis)
        sh *= 2
    out = d + _shift_down(g, 1, axis)
    return out & (BASE - 1)


def _dispatch_carry8(cols, peels, axis):
    """Carry to int8; routed to the fused Pallas kernel on TPU."""
    if jax.default_backend() == "tpu":
        from . import fmat_pallas

        return fmat_pallas.carry8(cols, peels, axis)
    return carry_cols(cols, peels, axis).astype(jnp.int8)


def mont_reduce_cols(t_cols: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Montgomery-reduce raw convolution columns (K7 wide along `axis`).

    The limb axis is independent of every other axis (the dft_bank layout is
    limb-major), so the N'/p reduction matmuls contract just the limb axis
    with the globally shared Wnp/Wp band matrices. Returns int8 limbs
    (L7 along `axis`), values < 1.1p.

    On TPU the whole chain (3 carries + 2 small constant matmuls) runs as
    ONE fused Pallas kernel (fmat_pallas.mont_reduce8): the chain is the
    HBM-bound part of every MatNTT stage, and fusing it is the round-5
    stage-traffic lever (BASELINE.md).
    """
    if t_cols.ndim == 2 and axis == 0 and jax.default_backend() == "tpu":
        from ..config import FUSED_REDUCE

        if FUSED_REDUCE:
            from . import fmat_pallas

            return fmat_pallas.mont_reduce8(t_cols)
    Wnp, Wp = _reduce_mats()
    t_lo = jax.lax.slice_in_dim(
        _dispatch_carry8(t_cols, 4, axis), 0, L7, axis=axis
    )
    nd = t_cols.ndim
    m_cols = jax.lax.dot_general(
        jnp.asarray(Wnp), t_lo, (((1,), (axis,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                        # limb axis now leading
    m_cols = jnp.moveaxis(m_cols, 0, axis) if axis else m_cols
    m = _dispatch_carry8(m_cols, 3, axis)
    u_cols = jax.lax.dot_general(
        jnp.asarray(Wp), m, (((1,), (axis,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    u_cols = (jnp.moveaxis(u_cols, 0, axis) if axis else u_cols) + t_cols
    u = _dispatch_carry8(u_cols, 4, axis)
    return jax.lax.slice_in_dim(u, L7, K7, axis=axis)


def dft_apply(bank: jnp.ndarray, x: jnp.ndarray, E_out: int) -> jnp.ndarray:
    """One radix stage: x (L7*E_in, T) int8 -> (L7*E_out, T) int8.

    bank: (K7*E_out, L7*E_in) int8 from dft_bank_np (limb-major rows). The
    matmul computes raw field-matmul columns; the reduction sees them as
    (K7, E_out*T) — a free reshape in this layout.
    """
    T = x.shape[-1]
    t_cols = jax.lax.dot_general(
        bank, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    u = mont_reduce_cols(t_cols.reshape(K7, E_out * T))
    return u.reshape(L7 * E_out, T)


def toeplitz_apply(bank: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Batched Montgomery const-mul: x (B, L7, T) s8 * bank (B, K7, L7) s8
    -> (B, L7, T) s8 (values < 1.1p).

    One batched matmul for the constants' convolution, then ONE int32
    transpose into limb-leading layout so the whole reduction runs on the
    cheap 2D path (contiguous reshapes, 2D fused carries) — the 3D
    axis-1 path costs two hidden transposes per reduce and poorly-tiled
    carry kernels (measured 2-4x slower at the split-twiddle shapes).
    """
    B, _, T = x.shape
    t_cols = jax.lax.dot_general(
        bank, x, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )                                                    # (B, K7, T)
    t2 = jnp.moveaxis(t_cols, 0, 1).reshape(K7, B * T)
    u = mont_reduce_cols(t2)                             # (L7, B*T) int8
    return jnp.moveaxis(u.reshape(L7, B, T), 0, 1)


# ---------------------------------------------------------------------------
# 16-bit <-> 7-bit limb repacking (module boundary; bit-exact, form-neutral)
# ---------------------------------------------------------------------------


def pack7(x16: jnp.ndarray) -> jnp.ndarray:
    """(16, ...) u32 16-bit limbs -> (L7, ...) int8 7-bit limbs.

    Values may be lazy (< 2p < 2^254); the raw 256-bit integer is re-sliced
    bit-exactly. 7-bit limb i covers bits [7i, 7i+7), spanning <= 2 16-bit
    limbs.
    """
    outs = []
    for i in range(L7):
        bit0 = i * LIMB_BITS
        j, s = bit0 // 16, bit0 % 16
        if j >= 16:                      # bits >= 256: zero for values < 2^256
            outs.append(jnp.zeros_like(x16[0]))
            continue
        v = x16[j] >> s
        if s > 9 and j + 1 < 16:
            v = v | (x16[j + 1] << (16 - s))
        outs.append(v & (BASE - 1))
    return jnp.stack(outs).astype(jnp.int8)


def unpack7(x7: jnp.ndarray) -> jnp.ndarray:
    """(L7, ...) int8 7-bit limbs -> (16, ...) u32 16-bit limbs.

    Input values < 2^256 (canonical/lazy field elements; top limbs of the
    266-bit capacity must be clear, which mont-reduced outputs guarantee).
    """
    x = x7.astype(jnp.uint32)
    outs = []
    for j in range(16):
        bit0 = j * 16
        acc = None
        # 7-bit limbs overlapping [bit0, bit0+16): indices floor(bit0/7)-ish
        for i in range(max(0, (bit0 - 6) // LIMB_BITS), L7):
            lb = i * LIMB_BITS
            if lb >= bit0 + 16:
                break
            if lb >= bit0:
                term = x[i] << (lb - bit0)
            else:
                term = x[i] >> (bit0 - lb)
            acc = term if acc is None else acc + term
        outs.append(acc & 0xFFFF)
    return jnp.stack(outs)


# ---------------------------------------------------------------------------
# host encode/decode (tests / standalone use)
# ---------------------------------------------------------------------------


def encode7(xs) -> jnp.ndarray:
    """Host ints -> (L7, N) int8 limbs, NO form factor (raw values)."""
    return jnp.asarray(to7_np([x % P for x in xs]).T)


def decode7(a) -> list:
    """(L7, N) device limbs (raw values, possibly lazy < 2p) -> host ints."""
    vals = from7_np(np.asarray(a).T)
    return [int(v) % P for v in vals]
