"""Radix-2 NTT/iNTT over Fr on TPU (single chip).

TPU-native replacement for snarkVM's polynomial FFT (`snarkvm-algorithms`
fft module, SURVEY.md §2.8 item 4). The prover evaluates/interpolates
polynomials over two-adic subgroups of Fr (2-adicity 47) and their cosets.

Design: iterative Cooley-Tukey DIT with a *uniform* butterfly stage —
partner indices are `iota ^ half` and per-stage twiddles are gathered from a
single power table with indices computed from the stage number, so the whole
transform is one lax.scan over log2(n) identical stages: a single compiled
field-mul instance regardless of size (flat XLA compile time), static shapes
throughout, log-depth butterfly network (XLA semantics notes of the brief).

Domain tables (root powers, bit-reversal permutation, coset scalings) are
host-precomputed per size and cached.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import params
from ..fields.modring import FR_RING as F
from ..reference.field import fr_root_of_unity

R = params.R


def _bitrev_perm(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    out = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for i in range(n):
        b = 0
        x = i
        for _ in range(logn):
            b = (b << 1) | (x & 1)
            x >>= 1
        rev[i] = b
    return rev


class Domain:
    """Radix-2 evaluation domain of size n over Fr, with cached tables."""

    def __init__(self, n: int):
        assert n & (n - 1) == 0 and n >= 1
        self.n = n
        self.logn = n.bit_length() - 1
        self.w = fr_root_of_unity(n) if n > 1 else 1
        self.w_inv = pow(self.w, -1, R)
        self.n_inv = pow(n, -1, R)
        # Powers W^k, k in [0, n), Montgomery form; forward and inverse.
        # Stored as NUMPY arrays so constructing a Domain inside a jax trace
        # (e.g. under shard_map) captures plain constants, never tracers;
        # device copies for the host-side wrappers are made lazily.
        pw, piw = [], []
        acc_f, acc_i = 1, 1
        for _ in range(n):
            pw.append(acc_f)
            piw.append(acc_i)
            acc_f = acc_f * self.w % R
            acc_i = acc_i * self.w_inv % R
        self.wpow_np = F.to_mont_host(pw)
        self.wpow_inv_np = F.to_mont_host(piw)
        self.bitrev_np = _bitrev_perm(n).astype(np.int32)
        self.n_inv_mont_np = F.to_mont_host([self.n_inv])[0]
        self._dev = {}

    def _device(self, name: str):
        if name not in self._dev:
            self._dev[name] = jnp.asarray(getattr(self, name + "_np"))
        return self._dev[name]

    @property
    def wpow(self):
        return self._device("wpow")

    @property
    def wpow_inv(self):
        return self._device("wpow_inv")

    @property
    def bitrev(self):
        return self._device("bitrev")

    @property
    def n_inv_mont(self):
        return self._device("n_inv_mont")

    def elements(self):
        """Host list of the domain points [W^0, ..., W^(n-1)]."""
        out, acc = [], 1
        for _ in range(self.n):
            out.append(acc)
            acc = acc * self.w % R
        return out


@functools.lru_cache(maxsize=64)
def domain(n: int) -> Domain:
    return Domain(n)


def _transform(x: jnp.ndarray, wpow: jnp.ndarray, bitrev: jnp.ndarray) -> jnp.ndarray:
    """Core DIT butterfly network. x: (n, L) Montgomery limbs."""
    n = x.shape[0]
    if n == 1:
        return x
    logn = n.bit_length() - 1
    iota = jnp.arange(n, dtype=jnp.int32)
    wpow = jnp.asarray(wpow)      # accept numpy tables (in-trace constants)
    x = x[jnp.asarray(bitrev)]

    def stage(xc, s):
        half = jnp.int32(1) << s
        tw_idx = (iota & (half - 1)) * (jnp.int32(n) >> (s + 1))
        tw = wpow[tw_idx]                       # (n, L)
        m = F.mul(tw, xc)                       # w * x at every lane
        partner = iota ^ half
        m_p = m[partner]
        x_p = xc[partner]
        lower = (iota & half) == 0
        out = F.select(lower, F.add(xc, m_p), F.sub(x_p, m))
        return out, None

    x, _ = jax.lax.scan(stage, x, jnp.arange(logn, dtype=jnp.int32))
    return x


_transform_jit = jax.jit(_transform)


@jax.jit
def _intt_core(x, wpow_inv, bitrev, n_inv_mont):
    out = _transform(x, wpow_inv, bitrev)
    return F.mul(out, n_inv_mont)


def ntt(x: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT: coefficients -> evaluations over the size-n subgroup.
    x: (n, L) Montgomery limbs, natural order in and out.

    Domain tables are resolved OUTSIDE jit (they are cached host-side and
    passed as device arguments, not baked into the graph)."""
    d = domain(x.shape[0])
    return _transform_jit(x, d.wpow, d.bitrev)


def intt(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse NTT: evaluations -> coefficients."""
    d = domain(x.shape[0])
    return _intt_core(x, d.wpow_inv, d.bitrev, d.n_inv_mont)


class Coset:
    """Multiplicative coset shift*H with cached scaling vectors."""

    def __init__(self, n: int, shift: int):
        self.shift = shift
        sp, spi = [], []
        acc, acci = 1, 1
        sinv = pow(shift, -1, R)
        for _ in range(n):
            sp.append(acc)
            spi.append(acci)
            acc = acc * shift % R
            acci = acci * sinv % R
        self.shift_pows_np = F.to_mont_host(sp)
        self.shift_pows_inv_np = F.to_mont_host(spi)
        self._dev = {}

    def _device(self, name: str):
        if name not in self._dev:
            self._dev[name] = jnp.asarray(getattr(self, name + "_np"))
        return self._dev[name]

    @property
    def shift_pows(self):
        return self._device("shift_pows")

    @property
    def shift_pows_inv(self):
        return self._device("shift_pows_inv")


@functools.lru_cache(maxsize=64)
def coset(n: int, shift: int) -> Coset:
    return Coset(n, shift)


_mul_jit = jax.jit(F.mul)


def coset_ntt(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Evaluate coefficients on the coset shift*H."""
    c = coset(x.shape[0], shift)
    return ntt(_mul_jit(x, c.shift_pows))


def coset_intt(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    c = coset(x.shape[0], shift)
    return _mul_jit(intt(x), c.shift_pows_inv)
