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
from ..fields import fr_lf as lf
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


def _transform_lf(x: jnp.ndarray, wpow: jnp.ndarray, bitrev) -> jnp.ndarray:
    """Core DIT butterfly network, limbs-first. x: (L, n), lazy < 2p in/out.

    The butterfly mul dispatches through `fields.fr_lf`: limb convolutions
    on TPU (~20x faster + ~30x faster to compile than the einsum path —
    VERDICT r2 weak #2), einsum Montgomery on CPU. wpow is the (n, L)
    limbs-last power table (gathered per stage then transposed; XLA fuses
    the layout change into the gather).
    """
    n = x.shape[1]
    if n == 1:
        return x
    logn = n.bit_length() - 1
    iota = jnp.arange(n, dtype=jnp.int32)
    wpow = jnp.asarray(wpow)      # accept numpy tables (in-trace constants)
    x = x[:, jnp.asarray(bitrev)]

    def stage(xc, s):
        half = jnp.int32(1) << s
        tw_idx = (iota & (half - 1)) * (jnp.int32(n) >> (s + 1))
        tw = wpow[tw_idx].T                     # (L, n)
        m = lf.mul(tw, xc)                      # w * x at every lane
        partner = iota ^ half
        m_p = m[:, partner]
        x_p = xc[:, partner]
        lower = (iota & half) == 0
        out = jnp.where(lower[None, :], lf.add(xc, m_p), lf.sub(x_p, m))
        return out, None

    x, _ = jax.lax.scan(stage, x, jnp.arange(logn, dtype=jnp.int32))
    return x


def _transform(x: jnp.ndarray, wpow: jnp.ndarray, bitrev) -> jnp.ndarray:
    """Limbs-last (n, L) wrapper around the limbs-first core (canonical out)."""
    return lf.normalize(_transform_lf(x.T, wpow, bitrev)).T


_transform_jit = jax.jit(_transform)


@jax.jit
def _intt_core(x, wpow_inv, bitrev, n_inv_mont):
    out = _transform_lf(x.T, wpow_inv, bitrev)
    scaled = lf.mul(out, n_inv_mont[:, None])
    return lf.normalize(scaled).T


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


# -- limbs-first API (prover pipeline; no boundary transposes) ---------------


@jax.jit
def _ntt_lf_core(x, wpow, bitrev):
    return _transform_lf(x, wpow, bitrev)


@jax.jit
def _intt_lf_core(x, wpow_inv, bitrev, n_inv_mont):
    out = _transform_lf(x, wpow_inv, bitrev)
    return lf.mul(out, n_inv_mont[:, None])


def ntt_lf(x: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT on (L, n) limbs-first arrays; lazy in/out."""
    d = domain(x.shape[1])
    return _ntt_lf_core(x, d.wpow, d.bitrev)


def intt_lf(x: jnp.ndarray) -> jnp.ndarray:
    d = domain(x.shape[1])
    return _intt_lf_core(x, d.wpow_inv, d.bitrev, d.n_inv_mont)


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


@jax.jit
def _coset_ntt_core(x, shift_pows, wpow, bitrev):
    xs = lf.mul(x.T, shift_pows.T)
    return lf.normalize(_transform_lf(xs, wpow, bitrev)).T


@jax.jit
def _coset_intt_core(x, wpow_inv, bitrev, n_inv_mont, shift_pows_inv):
    out = _transform_lf(x.T, wpow_inv, bitrev)
    scaled = lf.mul(lf.mul(out, n_inv_mont[:, None]), shift_pows_inv.T)
    return lf.normalize(scaled).T


@jax.jit
def _coset_ntt_lf_core(x, shift_pows, wpow, bitrev):
    return _transform_lf(lf.mul(x, shift_pows.T), wpow, bitrev)


@jax.jit
def _coset_intt_lf_core(x, wpow_inv, bitrev, n_inv_mont, shift_pows_inv):
    out = _transform_lf(x, wpow_inv, bitrev)
    return lf.mul(lf.mul(out, n_inv_mont[:, None]), shift_pows_inv.T)


def coset_ntt(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Evaluate coefficients on the coset shift*H (scale fused into the jit)."""
    c = coset(x.shape[0], shift)
    d = domain(x.shape[0])
    return _coset_ntt_core(x, c.shift_pows, d.wpow, d.bitrev)


def coset_intt(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    c = coset(x.shape[0], shift)
    d = domain(x.shape[0])
    return _coset_intt_core(x, d.wpow_inv, d.bitrev, d.n_inv_mont, c.shift_pows_inv)


def coset_ntt_lf(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Limbs-first (L, n) coset NTT; lazy in/out."""
    c = coset(x.shape[1], shift)
    d = domain(x.shape[1])
    return _coset_ntt_lf_core(x, c.shift_pows, d.wpow, d.bitrev)


def coset_intt_lf(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    c = coset(x.shape[1], shift)
    d = domain(x.shape[1])
    return _coset_intt_lf_core(x, d.wpow_inv, d.bitrev, d.n_inv_mont, c.shift_pows_inv)
