"""Static sparse matrix-vector products over Fr on device.

R1CS matrices are fixed per circuit, so the indexer presorts the COO entries
(by row for M·z, by col for M^T·u) and the device kernel is a gather +
segmented Hillis-Steele scan + scatter — the same dense, log-depth shape as
the MSM bucket accumulation, but over Fr scalars.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.modring import FR_RING as F


class SparseTables(NamedTuple):
    """Device tables for one orientation (row- or col-sorted) of a matrix."""

    vals: jnp.ndarray      # (m, L) Montgomery coefficients, sorted
    gather_idx: jnp.ndarray  # (m,) index into the input vector
    flags: jnp.ndarray     # (m,) segment starts
    ends: jnp.ndarray      # (m,) segment ends
    out_idx: jnp.ndarray   # (m,) output position (valid at ends)
    out_size: int


def build_tables(coo, key_of, gather_of, out_size: int, m_pad: int, n_limbs: int):
    """Host: COO entries -> SparseTables sorted by key_of(entry).

    coo: list of (row, col, val); key_of/gather_of: entry -> int.
    Padded entries have val=0 and gather/out index 0.
    """
    entries = sorted(coo, key=key_of)
    keys = [key_of(e) for e in entries] + [out_size] * (m_pad - len(entries))
    gidx = [gather_of(e) for e in entries] + [0] * (m_pad - len(entries))
    vals = [e[2] for e in entries] + [0] * (m_pad - len(entries))
    keys_np = np.asarray(keys, dtype=np.int32)
    flags = np.ones(m_pad, dtype=bool)
    flags[1:] = keys_np[1:] != keys_np[:-1]
    ends = np.ones(m_pad, dtype=bool)
    ends[:-1] = flags[1:]
    return SparseTables(
        vals=F.encode(vals),
        gather_idx=jnp.asarray(gidx, dtype=jnp.int32),
        flags=jnp.asarray(flags),
        ends=jnp.asarray(ends),
        out_idx=jnp.asarray(np.minimum(keys_np, out_size), dtype=jnp.int32),
        out_size=out_size,
    )


def _segscan_add(vals: jnp.ndarray, flags: jnp.ndarray) -> jnp.ndarray:
    """Segmented inclusive prefix sum over Fr (Hillis-Steele, fori_loop)."""
    n = vals.shape[0]
    if n == 1:
        return vals
    logn = max(1, (n - 1).bit_length())
    iota = jnp.arange(n, dtype=jnp.int32)

    def body(d, carry):
        v, f = carry
        o = jnp.int32(1) << d
        valid = iota >= o
        vs = jnp.roll(v, o, axis=0)
        fs = jnp.roll(f, o, axis=0)
        s = F.add(v, vs)
        keep = f | ~valid
        nv = F.select(keep, v, s)
        nf = f | (valid & fs)
        return (nv, nf)

    v, _ = jax.lax.fori_loop(0, logn, body, (vals, flags))
    return v


import functools


@functools.partial(jax.jit, static_argnames=("out_size",))
def _spmv_core(vals, gather_idx, flags, ends, out_idx, x, out_size: int):
    prod = F.mul(vals, x[gather_idx])
    seg = _segscan_add(prod, flags)
    idx = jnp.where(ends, out_idx, out_size)
    out = jnp.zeros((out_size + 1, F.L), dtype=jnp.uint32)
    out = out.at[idx].set(seg)
    return out[:out_size]


def spmv(tables: SparseTables, x: jnp.ndarray) -> jnp.ndarray:
    """y[out_idx] = sum over segment of vals * x[gather_idx]; y: (out_size, L)."""
    return _spmv_core(
        tables.vals,
        tables.gather_idx,
        tables.flags,
        tables.ends,
        tables.out_idx,
        x,
        out_size=tables.out_size,
    )


# -- limbs-first path (prover pipeline) --------------------------------------


def _segscan_add_lf(vals: jnp.ndarray, flags: jnp.ndarray) -> jnp.ndarray:
    """Segmented inclusive prefix sum over Fr, limbs-first (L, m)."""
    from ..fields import fr_lf as lf

    m = vals.shape[1]
    if m == 1:
        return vals
    logn = max(1, (m - 1).bit_length())
    iota = jnp.arange(m, dtype=jnp.int32)

    def body(d, carry):
        v, f = carry
        o = jnp.int32(1) << d
        valid = iota >= o
        vs = jnp.roll(v, o, axis=1)
        fs = jnp.roll(f, o, axis=0)
        s = lf.add(v, vs)
        keep = f | ~valid
        nv = lf.select(keep, v, s)
        nf = f | (valid & fs)
        return (nv, nf)

    v, _ = jax.lax.fori_loop(0, logn, body, (vals, flags))
    return v


@functools.partial(jax.jit, static_argnames=("out_size",))
def _spmv_core_lf(vals, gather_idx, flags, ends, out_idx, x, out_size: int):
    from ..fields import fr_lf as lf

    prod = lf.mul(vals.T, x[:, gather_idx])
    seg = _segscan_add_lf(prod, flags)
    idx = jnp.where(ends, out_idx, out_size)
    out = jnp.zeros((out_size + 1, F.L), dtype=jnp.uint32)
    out = out.at[idx].set(seg.T)
    return out[:out_size].T


def spmv_lf(tables: SparseTables, x: jnp.ndarray) -> jnp.ndarray:
    """Limbs-first spmv: x (L, n) lazy -> y (L, out_size) lazy."""
    return _spmv_core_lf(
        tables.vals,
        tables.gather_idx,
        tables.flags,
        tables.ends,
        tables.out_idx,
        x,
        out_size=tables.out_size,
    )
