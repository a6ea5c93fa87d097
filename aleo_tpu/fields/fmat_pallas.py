"""Fused Pallas TPU kernel for fmat's carry normalization.

The carry pass (peel rounds + Kogge-Stone) is pure elementwise/shift work,
but as plain XLA each round materializes the full int32 column tensor to
HBM — measured 33 ms for (78, 2^20) on v5e, which would dominate the MatNTT
stage budget. This kernel runs all rounds in VMEM: one int32 read + one
int8 write per element (~8x less HBM traffic, and the arithmetic rides the
VPU at full rate).

Off-TPU callers use fmat.carry_cols directly (fmat._dispatch_carry8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fmat

TILE = 512


def _carry_body(x: jnp.ndarray, peels: int) -> jnp.ndarray:
    """(K, T) int32 -> (K, T) int8 normalized limbs (shared with fmat)."""
    K = x.shape[0]
    B = fmat.BASE
    for _ in range(peels):
        lo = x & (B - 1)
        hi = x >> fmat.LIMB_BITS
        x = lo + jnp.concatenate([jnp.zeros_like(hi[:1]), hi[:-1]], axis=0)
    d = x & (B - 1)
    g = x >> fmat.LIMB_BITS
    pr = (d == B - 1).astype(jnp.int32)
    sh = 1
    while sh < K:
        zs = jnp.zeros_like(g[:sh])
        g = g | (pr & jnp.concatenate([zs, g[:-sh]], axis=0))
        pr = pr & jnp.concatenate([zs, pr[:-sh]], axis=0)
        sh *= 2
    out = d + jnp.concatenate([jnp.zeros_like(g[:1]), g[:-1]], axis=0)
    return (out & (B - 1)).astype(jnp.int8)


@functools.lru_cache(maxsize=None)
def _build_2d(K: int, M_pad: int, peels: int):
    def kernel(x_ref, o_ref):
        o_ref[:] = _carry_body(x_ref[:], peels)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, M_pad), jnp.int8),
        grid=(M_pad // TILE,),
        in_specs=[pl.BlockSpec((K, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((K, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )


@functools.lru_cache(maxsize=None)
def _build_3d(B: int, K: int, T_pad: int, peels: int, tile: int):
    def kernel(x_ref, o_ref):
        o_ref[:] = _carry_body(x_ref[:][0], peels)[None]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, K, T_pad), jnp.int8),
        grid=(B, T_pad // tile),
        in_specs=[pl.BlockSpec((1, K, tile), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, K, tile), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
    )


# ---------------------------------------------------------------------------
# Fused Montgomery reduction (round-5 lever: BASELINE.md "fuse the MatNTT
# stage chain"). fmat.mont_reduce_cols as plain XLA is five HBM round trips
# per stage (carry -> Wnp dot -> carry -> Wp dot+add -> carry), each
# materializing a (K7, M)-class tensor; this kernel runs the whole chain in
# VMEM: one (K7, M) int32 read + one (L7, M) int8 write (~5x less reduce
# traffic). Wnp/Wp are 38x38 / 76x38 int8 constants contracted on the MXU
# via exact f32 FMAs (products <= 127*127*38 < 2^24, exactly representable).
# ---------------------------------------------------------------------------


def _reduce_body(x: jnp.ndarray, Wnp: jnp.ndarray, Wp: jnp.ndarray):
    """(K7, T) int32 raw conv columns -> (L7, T) int8 reduced limbs."""
    t8 = _carry_body(x, 4)
    t_lo = t8[: fmat.L7].astype(jnp.float32)
    m_cols = jax.lax.dot_general(
        Wnp.astype(jnp.float32), t_lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    m = _carry_body(m_cols, 3).astype(jnp.float32)
    u_cols = jax.lax.dot_general(
        Wp.astype(jnp.float32), m, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32) + x
    return _carry_body(u_cols, 4)[fmat.L7 :]


@functools.lru_cache(maxsize=None)
def _build_reduce_2d(M_pad: int):
    K7, L7 = fmat.K7, fmat.L7

    def kernel(x_ref, wnp_ref, wp_ref, o_ref):
        o_ref[:] = _reduce_body(x_ref[:], wnp_ref[:], wp_ref[:])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L7, M_pad), jnp.int8),
        grid=(M_pad // TILE,),
        in_specs=[
            pl.BlockSpec((K7, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L7, L7), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K7, L7), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L7, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )


def mont_reduce8(t_cols: jnp.ndarray) -> jnp.ndarray:
    """Fused fmat.mont_reduce_cols for the 2D limb-leading layout:
    (K7, M) int32 -> (L7, M) int8, values < 1.1p."""
    Wnp, Wp = fmat._reduce_mats()
    x, n = _pad_last(t_cols, TILE)
    out = _build_reduce_2d(x.shape[1])(
        x, jnp.asarray(Wnp), jnp.asarray(Wp)
    )
    return out[:, :n]


def _pad_last(x, mult):
    n = x.shape[-1]
    pad = (-n) % mult
    if pad == 0:
        return x, n
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, widths), n


def carry8(cols: jnp.ndarray, peels: int, axis: int) -> jnp.ndarray:
    """Fused carry-to-int8 along `axis`. Supports the two layouts fmat
    uses: 2D with axis=0 and 3D with axis=1."""
    if cols.ndim == 2 and axis == 0:
        x, n = _pad_last(cols, TILE)
        out = _build_2d(x.shape[0], x.shape[1], peels)(x)
        return out[:, :n]
    if cols.ndim == 3 and axis == 1:
        tile = max(128, min(TILE, -(-cols.shape[2] // 128) * 128))
        x, n = _pad_last(cols, tile)
        out = _build_3d(x.shape[0], x.shape[1], x.shape[2], peels, tile)(x)
        return out[:, :, :n]
    return fmat.carry_cols(cols, peels, axis).astype(jnp.int8)
