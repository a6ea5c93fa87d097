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
        # twiddle banks per depth (None for the last)
        self.tw = []
        m_i = n
        bpre = 1
        for i, d in enumerate(self.dims[:-1]):
            m_next = m_i // d
            root = pow(w, n // m_i, R)           # w_{m_i}
            if bpre >= MIN_LANES or m_next < 4:
                consts = [
                    pow(root, k * j, R)
                    for k in range(d)
                    for j in range(m_next)
                ]
                self.tw.append(("one", fmat.toeplitz_bank_np(consts)))
            else:
                # split j = hi*S + lo so both factors share >= MIN_LANES lanes
                S = 1 << max(
                    1, min(m_next.bit_length() - 1 - 1,
                           max((m_next.bit_length() - 1) // 2,
                               (MIN_LANES // max(bpre, 1)).bit_length() - 1))
                )
                hi_sz = m_next // S
                f1 = [
                    pow(root, k * h * S, R)
                    for k in range(d) for h in range(hi_sz)
                ]
                f2 = [
                    pow(root, k * lo, R)
                    for k in range(d) for lo in range(S)
                ]
                self.tw.append(
                    ("split", S, fmat.toeplitz_bank_np(f1),
                     fmat.toeplitz_bank_np(f2))
                )
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


def _tw_one(x: jnp.ndarray, bank: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Twiddle at `depth` (0-based): const axes = all axes > depth, lane axes
    = axes 1..depth. x: (L7, d1, ..., ds)."""
    nd = x.ndim
    const_axes = tuple(range(depth + 1, nd))
    lane_axes = tuple(range(1, depth + 1))
    perm = const_axes + (0,) + lane_axes
    xt = jnp.transpose(x, perm)
    B = int(np.prod([x.shape[a] for a in const_axes]))
    T = int(np.prod([x.shape[a] for a in lane_axes])) if lane_axes else 1
    xt2 = xt.reshape(B, L7, T)
    y = fmat.toeplitz_apply(bank, xt2)
    yt = y.reshape(xt.shape)
    inv = np.argsort(perm)
    return jnp.transpose(yt, tuple(inv))


def _tw_split(x, S, bank1, bank2, depth):
    """Split twiddle at `depth`: axes (1..depth)=pre, depth+1 = k, rest = j.
    j is split j = hi*S + lo; factor1 over (k, hi) lanes (pre, lo); factor2
    over (k, lo) lanes (pre, hi)."""
    nd = x.ndim
    d = x.shape[depth + 1]
    rest = int(np.prod(x.shape[depth + 2 :])) if depth + 2 < nd else 1
    pre = int(np.prod(x.shape[1 : depth + 1]))
    hi_sz = rest // S
    x5 = x.reshape((L7, pre, d, hi_sz, S))
    # factor1: consts (d, hi), lanes (pre, S)
    xt = jnp.transpose(x5, (2, 3, 0, 1, 4)).reshape(d * hi_sz, L7, pre * S)
    y = fmat.toeplitz_apply(bank1, xt).reshape(d, hi_sz, L7, pre, S)
    # factor2: consts (d, lo), lanes (pre, hi)
    yt = jnp.transpose(y, (0, 4, 2, 3, 1)).reshape(d * S, L7, pre * hi_sz)
    z = fmat.toeplitz_apply(bank2, yt).reshape(d, S, L7, pre, hi_sz)
    z5 = jnp.transpose(z, (2, 3, 0, 4, 1))       # (L7, pre, d, hi, S)
    return z5.reshape(x.shape)


def _scale_digits(x: jnp.ndarray, sp: ScalePlan) -> jnp.ndarray:
    """Elementwise scale by base^j via one Toeplitz mul per digit axis."""
    for i, d in enumerate(sp.dims):
        nd = x.ndim
        axis = 1 + i
        lane_axes = tuple(a for a in range(1, nd) if a != axis)
        perm = (axis, 0) + lane_axes
        xt = jnp.transpose(x, perm)
        T = int(np.prod([x.shape[a] for a in lane_axes])) if lane_axes else 1
        y = fmat.toeplitz_apply(sp.dev(i), xt.reshape(d, L7, T))
        x = jnp.transpose(y.reshape(xt.shape), tuple(np.argsort(perm)))
    return x


def transform7(x7: jnp.ndarray, p: Plan) -> jnp.ndarray:
    """Core transform on (L7, n) int8 limbs -> (L7, n) int8, natural order."""
    n = p.n
    dims = p.dims
    x = x7.reshape((L7,) + tuple(dims))
    for i, d in enumerate(dims):
        x = _dft_stage(x, p.dev(("dft", i), p.dft_banks[i]), axis=1 + i)
        if i < len(dims) - 1:
            tw = p.tw[i]
            if tw[0] == "one":
                x = _tw_one(x, p.dev(("tw", i), tw[1]), depth=i)
            else:
                _, S, b1, b2 = tw
                x = _tw_split(
                    x, S, p.dev(("tw1", i), b1), p.dev(("tw2", i), b2), depth=i
                )
    # output digit-reversal: position (k1..ks) holds X[k1 + d1*(k2 + ...)]
    s = len(dims)
    x = jnp.transpose(x, (0,) + tuple(range(s, 0, -1)))
    return x.reshape(L7, n)


# ---------------------------------------------------------------------------
# public API: (16, n) u32 16-bit Montgomery limbs, lazy in/out.
# Entry points are jit-cached per (n, direction, shift): the prover calls
# them eagerly, and un-jitted graphs would dispatch every limb op through
# the device tunnel one by one.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _jit_entry(n: int, inverse: bool, shift: int | None):
    ninv = pow(n, -1, R) if inverse else 1
    p = plan(n, inverse, ninv if inverse else 1)
    sp = None
    if shift is not None:
        base = shift if not inverse else pow(shift, -1, R)
        sp = scale_plan(n, base, tuple(p.dims))

    def fwd(x16):
        x7 = fmat.pack7(x16)
        if sp is not None and not inverse:
            x7 = _scale_digits(
                x7.reshape((L7,) + tuple(p.dims)), sp
            ).reshape(L7, n)
        out7 = transform7(x7, p)
        if sp is not None and inverse:
            out7 = _scale_digits(
                out7.reshape((L7,) + tuple(p.dims)), sp
            ).reshape(L7, n)
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
