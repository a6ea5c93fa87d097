"""MatNTT: mixed-radix NTT where every multiply rides the MXU (int8 matmuls).

TPU-native replacement for the radix-2 VPU butterfly network of ntt.py at
large sizes — the round-4 performance lever (BASELINE.md #1). The transform
is a decimation-in-frequency mixed-radix decomposition n = d1 * d2 * ... * ds
(radices <= 32) where

  * each radix-d stage is ONE limb-blocked s8 matmul (fields/fmat.dft_apply):
    the DFT_d matrix's constants are folded into a (76d x 38d) int8 matrix,
    so the stage's muls AND butterfly adds all run on the MXU,
  * inter-stage twiddles w^{k*j} are batched Toeplitz constant-mul matmuls;
    when the natural lane sharing is too narrow (early depths of a single
    transform) the exponent k*j is SPLIT j = hi*S + lo into two factors,
    each shared across >= 128 lanes — two cheap MXU muls replace one
    unshareable elementwise mul,
  * coset scalings g^j factor over the digit axes of j (one tiny Toeplitz
    bank per digit), and the n^-1 of the inverse transform is folded into
    the depth-1 DFT matrix for free.

Data flow: (16, n) u32 16-bit Montgomery limbs -> pack7 -> s stages of
[DFT matmul -> Montgomery reduce -> twiddle matmuls] -> digit-reversal
transpose -> unpack7. The 2^256 Montgomery form factor of the 16-bit
pipeline passes through unchanged (all constants carry fmat's R7 factor).

Everything here is pure jnp: it runs (slowly) on CPU for the test suite and
compiles to MXU matmuls + VPU carries on TPU. Reference behavior:
snarkvm-algorithms fft (/root/reference/Cargo.lock:2200-2229), oracle-tested
against ntt.py and the host bigint NTT.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import params
from ..fields import fmat
from ..reference.field import fr_root_of_unity

R = params.R
L7 = fmat.L7

MIN_LANES = 128        # below this, twiddle exponents are split


def _factorize(n: int) -> list:
    """n = prod(dims), radices <= 64, balanced, fewest stages.

    Stage count dominates cost (each stage pays a fixed carry/reduce
    budget), so radices go up to 64 (column sums stay < 2^26, see fmat);
    balancing keeps the per-stage matmuls similar sizes.
    """
    k = n.bit_length() - 1
    s = max(1, -(-k // 6))
    base, rem = divmod(k, s)
    return [1 << (base + 1)] * rem + [1 << base] * (s - rem)


def _dft_matrix(d: int, root: int, scale: int = 1) -> list:
    """DFT_d matrix entries [r][m] = root^(r*m) * scale (plain ints mod R)."""
    return [[pow(root, r * m, R) * scale % R for m in range(d)] for r in range(d)]


MAX_TW_BATCH = 4096   # Toeplitz batch cap (carry-kernel tiling sweet spot)


def _plan_groups(d: int, m_next: int, bpre: int) -> list:
    """Split jrest's log2(m_next) bits into groups sized so each factor's
    Toeplitz matmul has B = d*2^g <= MAX_TW_BATCH and, where achievable,
    lanes = bpre * m_next / 2^g >= MIN_LANES."""
    total = m_next.bit_length() - 1
    if total == 0:
        return []
    cap_batch = max(1, (MAX_TW_BATCH // d).bit_length() - 1)
    lane_bits = (bpre * m_next).bit_length() - 1
    cap_lanes = max(1, lane_bits - (MIN_LANES.bit_length() - 1))
    gmax = max(1, min(cap_batch, cap_lanes))
    n_groups = -(-total // gmax)
    base, rem = divmod(total, n_groups)
    return [base + 1] * rem + [base] * (n_groups - rem)


class Plan:
    """Host-precomputed banks for one (n, inverse, fold_scale) transform."""

    def __init__(self, n: int, inverse: bool, fold_scale: int = 1):
        self.n = n
        self.dims = _factorize(n)
        w = fr_root_of_unity(n)
        if inverse:
            w = pow(w, -1, R)
        self.w = w
        s = len(self.dims)
        # depth-1 DFT folds the caller's scale (n^-1 for inverse transforms)
        self.dft_banks = []
        m_i = n
        for i, d in enumerate(self.dims):
            root_d = pow(w, n // d, R)
            scale = fold_scale if i == 0 else 1
            self.dft_banks.append(
                fmat.dft_bank_np(_dft_matrix(d, root_d, scale))
            )
            m_i //= d
        # Twiddle banks per depth. The exponent k*j over (d, m_next) is split
        # into factors over bit-groups of j so every Toeplitz matmul gets a
        # well-shaped batch (B = d*2^g <= MAX_TW_BATCH) and enough lanes
        # (bpre * m_next / 2^g >= MIN_LANES where achievable) — a single
        # badly-shaped split costs more than all the DFT matmuls combined
        # (measured on v5e: B=8192 x 16-lane batches at 2^17).
        self.tw = []
        m_i = n
        bpre = 1
        for i, d in enumerate(self.dims[:-1]):
            m_next = m_i // d
            root = pow(w, n // m_i, R)           # w_{m_i}
            groups = _plan_groups(d, m_next, bpre)
            factors = []
            stride_bits = m_next.bit_length() - 1
            for g in groups:
                stride_bits -= g
                consts = [
                    pow(root, k * (j << stride_bits), R)
                    for k in range(d)
                    for j in range(1 << g)
                ]
                factors.append(fmat.toeplitz_bank_np(consts))
            self.tw.append((tuple(groups), factors))
            m_i = m_next
            bpre *= d

    @staticmethod
    def dev(key, host_arr):
        """Banks stay numpy; jnp.asarray at each use site so traced graphs
        capture fresh constants, never cached tracers."""
        return jnp.asarray(host_arr)


@functools.lru_cache(maxsize=24)
def plan(n: int, inverse: bool, fold_scale: int = 1) -> Plan:
    return Plan(n, inverse, fold_scale)


class ScalePlan:
    """Digit-factored elementwise scaling by base^j (coset shifts)."""

    def __init__(self, n: int, base: int, dims: tuple):
        self.dims = dims
        self.banks = []
        stride = n
        for d in dims:
            stride //= d
            self.banks.append(
                fmat.toeplitz_bank_np([pow(base, j * stride, R) for j in range(d)])
            )

    def dev(self, i):
        return jnp.asarray(self.banks[i])


@functools.lru_cache(maxsize=24)
def scale_plan(n: int, base: int, dims: tuple) -> ScalePlan:
    return ScalePlan(n, base, dims)


# ---------------------------------------------------------------------------
# device transform
# ---------------------------------------------------------------------------


def _dft_stage(x: jnp.ndarray, bank: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Apply one radix-d DFT matmul along `axis` of (L7, d1.., d, ..) data."""
    d = x.shape[axis]
    x = jnp.moveaxis(x, axis, 1)
    shape = x.shape
    x2 = x.reshape(L7 * d, -1)
    y2 = fmat.dft_apply(bank, x2, d)
    return jnp.moveaxis(y2.reshape(shape), 1, axis)


def _tw_multi(x, groups, banks, depth):
    """Twiddle at `depth` as a product of bit-group factors.

    x viewed as (L7, pre, d, 2^g1, ..., 2^gz): factor i's constants depend
    on (d, group_i); all other axes are its lanes. Each factor is one
    batched Toeplitz const-mul at a planner-guaranteed shape."""
    shape = x.shape
    d = shape[depth + 1]
    pre = int(np.prod(shape[1 : depth + 1])) if depth else 1
    xg = x.reshape((L7, pre, d) + tuple(1 << g for g in groups))
    z = len(groups)
    for i in range(z):
        gi_ax = 3 + i
        lane_axes = tuple(
            a for a in range(1, xg.ndim) if a not in (2, gi_ax)
        )
        perm = (2, gi_ax, 0) + lane_axes
        xt = jnp.transpose(xg, perm)
        B = d * (1 << groups[i])
        T = int(np.prod([xg.shape[a] for a in lane_axes])) if lane_axes else 1
        y = fmat.toeplitz_apply(banks[i], xt.reshape(B, L7, T))
        xg = jnp.transpose(y.reshape(xt.shape), tuple(np.argsort(perm)))
    return xg.reshape(shape)


def _scale_digits(x: jnp.ndarray, sp: ScalePlan, lead: int = 1) -> jnp.ndarray:
    """Elementwise scale by base^j via one Toeplitz mul per digit axis.

    `lead` = number of leading non-digit axes after the limb axis (1 when a
    batch axis precedes the digit axes)."""
    for i, d in enumerate(sp.dims):
        nd = x.ndim
        axis = lead + i
        lane_axes = tuple(a for a in range(1, nd) if a != axis)
        perm = (axis, 0) + lane_axes
        xt = jnp.transpose(x, perm)
        T = int(np.prod([x.shape[a] for a in lane_axes])) if lane_axes else 1
        y = fmat.toeplitz_apply(sp.dev(i), xt.reshape(d, L7, T))
        x = jnp.transpose(y.reshape(xt.shape), tuple(np.argsort(perm)))
    return x


def transform7(x7: jnp.ndarray, p: Plan, batch: int = 1) -> jnp.ndarray:
    """Core transform on (L7, [batch,] n) int8 limbs -> same, natural order.

    A leading batch axis (between limbs and digits) rides along as extra
    "pre" lanes for every stage — the twiddle factors only get wider-lane
    (better-shaped) matmuls out of it.
    """
    n = p.n
    dims = p.dims
    x = x7.reshape((L7, batch) + tuple(dims))
    for i, d in enumerate(dims):
        x = _dft_stage(x, p.dev(("dft", i), p.dft_banks[i]), axis=2 + i)
        if i < len(dims) - 1:
            groups, factors = p.tw[i]
            banks = [p.dev(("tw", i, j), f) for j, f in enumerate(factors)]
            x = _tw_multi(x, groups, banks, depth=i + 1)
    # output digit-reversal: position (k1..ks) holds X[k1 + d1*(k2 + ...)]
    s = len(dims)
    x = jnp.transpose(x, (0, 1) + tuple(range(s + 1, 1, -1)))
    return x.reshape((L7, batch, n) if batch > 1 else (L7, n))


# ---------------------------------------------------------------------------
# public API: (16, n) u32 16-bit Montgomery limbs, lazy in/out.
# Entry points are jit-cached per (n, direction, shift): the prover calls
# them eagerly, and un-jitted graphs would dispatch every limb op through
# the device tunnel one by one.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=96)
def _jit_entry(n: int, inverse: bool, shift: int | None, batch: int = 1):
    ninv = pow(n, -1, R) if inverse else 1
    p = plan(n, inverse, ninv if inverse else 1)
    sp = None
    if shift is not None:
        base = shift if not inverse else pow(shift, -1, R)
        sp = scale_plan(n, base, tuple(p.dims))
    bshape = (L7, batch) + tuple(p.dims)

    def fwd(x16):
        x7 = fmat.pack7(x16)
        if sp is not None and not inverse:
            x7 = _scale_digits(x7.reshape(bshape), sp, lead=2).reshape(x7.shape)
        out7 = transform7(x7, p, batch=batch)
        if sp is not None and inverse:
            out7 = _scale_digits(
                out7.reshape(bshape), sp, lead=2
            ).reshape(out7.shape)
        return fmat.unpack7(out7)

    return jax.jit(fwd)


def ntt_lf16(x16: jnp.ndarray) -> jnp.ndarray:
    return _jit_entry(x16.shape[1], False, None)(x16)


def intt_lf16(x16: jnp.ndarray) -> jnp.ndarray:
    return _jit_entry(x16.shape[1], True, None)(x16)


def coset_ntt_lf16(x16: jnp.ndarray, shift: int) -> jnp.ndarray:
    return _jit_entry(x16.shape[1], False, shift)(x16)


def coset_intt_lf16(x16: jnp.ndarray, shift: int) -> jnp.ndarray:
    return _jit_entry(x16.shape[1], True, shift)(x16)


# -- batched API: x16 (k, 16, n) u32, the batch prover's array layout --------


def _batched(x16: jnp.ndarray, inverse: bool, shift: int | None) -> jnp.ndarray:
    k, _, n = x16.shape
    f = _jit_entry(n, inverse, shift, batch=k)
    # (k, 16, n) -> (16, k, n): limbs leading for pack7; back at the end
    out = f(jnp.swapaxes(x16, 0, 1))
    return jnp.swapaxes(out, 0, 1)


def ntt_batch_lf16(x16: jnp.ndarray) -> jnp.ndarray:
    return _batched(x16, False, None)


def intt_batch_lf16(x16: jnp.ndarray) -> jnp.ndarray:
    return _batched(x16, True, None)


def coset_ntt_batch_lf16(x16: jnp.ndarray, shift: int) -> jnp.ndarray:
    return _batched(x16, False, shift)


def coset_intt_batch_lf16(x16: jnp.ndarray, shift: int) -> jnp.ndarray:
    return _batched(x16, True, shift)
