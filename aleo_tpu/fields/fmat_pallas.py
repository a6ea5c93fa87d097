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
