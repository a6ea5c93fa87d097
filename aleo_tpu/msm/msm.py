"""Pippenger multi-scalar multiplication on TPU.

TPU-native replacement for snarkVM's MSM (`snarkvm-algorithms`, SURVEY.md
§2.8 item 3) — the single hottest kernel of the prover (every KZG commitment
is one MSM over the SRS). GPU Pippenger relies on scatter/atomics for bucket
accumulation; that shape does not map onto XLA, so this implementation uses a
sort-and-segment-reduce formulation (cf. SZKP-style accelerator literature):

  per window:  digit extraction -> sort points by digit -> segmented
  inclusive scan with the (complete, branchless) group law -> scatter the
  per-segment totals into buckets -> suffix-scan bucket reduction.

Everything is dense, static-shaped and log-depth. Scans are Hillis-Steele
loops under lax.fori_loop and the window loop runs under lax.scan, so the
compiled graph contains each group-law instance exactly once — keeping XLA
compile time flat in problem size.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .. import params
from ..curves import g1
from ..curves.g1 import G1Points
from ..fields.modring import FQ_RING as F, FR_RING, ints_to_limbs

NBITS = params.R.bit_length()  # 253


def _scan_add(p: G1Points, flags: jnp.ndarray | None = None) -> G1Points:
    """Inclusive (optionally segmented) prefix scan with the group law.

    Hillis-Steele under fori_loop: log2(n) iterations, one point-add instance
    in the compiled graph. flags[i]=True starts a segment.
    """
    n = p.x.shape[0]
    if n == 1:
        return p
    logn = max(1, (n - 1).bit_length())
    iota = jnp.arange(n, dtype=jnp.int32)
    f0 = flags if flags is not None else jnp.zeros((n,), bool)

    def body(d, carry):
        (x, y, z), f = carry
        o = jnp.int32(1) << d
        valid = iota >= o
        xs = jnp.roll(x, o, axis=0)
        ys = jnp.roll(y, o, axis=0)
        zs = jnp.roll(z, o, axis=0)
        fs = jnp.roll(f, o, axis=0)
        s = g1.add(G1Points(x, y, z), G1Points(xs, ys, zs))
        keep = f | ~valid  # segment start (or no left neighbor): keep own value
        nx = F.select(keep, x, s.x)
        ny = F.select(keep, y, s.y)
        nz = F.select(keep, z, s.z)
        nf = f | (valid & fs)
        return ((nx, ny, nz), nf)

    (x, y, z), _ = jax.lax.fori_loop(0, logn, body, ((p.x, p.y, p.z), f0))
    return G1Points(x, y, z)


def _extract_digits(scalars_raw: jnp.ndarray, c: int) -> jnp.ndarray:
    """(N, FR_LIMBS) raw (non-Montgomery) 16-bit limbs -> (nwin, N) uint32
    window digits, least-significant window first. Requires c <= 16."""
    assert c <= 16
    n = scalars_raw.shape[0]
    nwin = math.ceil(NBITS / c)
    padded = jnp.concatenate(
        [scalars_raw, jnp.zeros((n, 1), dtype=jnp.uint32)], axis=-1
    )
    digits = []
    for w in range(nwin):
        bit0 = w * c
        j0, sh = bit0 // 16, bit0 % 16
        v = padded[:, j0] | (padded[:, j0 + 1] << 16)
        digits.append((v >> sh) & ((1 << c) - 1))
    return jnp.stack(digits, axis=0)


@functools.partial(jax.jit, static_argnames=("c",))
def msm(scalars_raw: jnp.ndarray, points: G1Points, c: int = 8) -> G1Points:
    """MSM sum_i scalars[i] * points[i].

    scalars_raw: (N, FR_LIMBS) uint32, standard (non-Montgomery) form.
    points: affine-encoded batch (z == 1, or z == 0 for identity fillers).
    Returns a single projective point (batch shape ()).
    """
    n = scalars_raw.shape[0]
    nbuckets = 1 << c
    digits = _extract_digits(scalars_raw, c)          # (nwin, N)

    def window_sum(digit):
        order = jnp.argsort(digit)
        d_s = digit[order]
        pts = G1Points(points.x[order], points.y[order], points.z[order])
        # Zero digits contribute nothing: make those points inert.
        nonzero = d_s != 0
        pts = g1.select(nonzero, pts, g1.identity((n,)))
        flags = jnp.concatenate(
            [jnp.ones((1,), bool), d_s[1:] != d_s[:-1]], axis=0
        )
        seg = _scan_add(pts, flags)
        ends = jnp.concatenate([flags[1:], jnp.ones((1,), bool)], axis=0)
        # Scatter segment totals into buckets; non-end rows go to the trash
        # bucket at index nbuckets.
        idx = jnp.where(ends, d_s, nbuckets)
        empty = g1.identity((nbuckets + 1,))
        buckets = G1Points(
            empty.x.at[idx].set(seg.x),
            empty.y.at[idx].set(seg.y),
            empty.z.at[idx].set(seg.z),
        )
        # Weighted reduction sum_b b * B_b as a double prefix scan:
        # suffix sums S_j, then sum of the S_j — both plain scans; total is
        # the last lane of the second scan.
        body = G1Points(
            buckets.x[1:nbuckets][::-1],
            buckets.y[1:nbuckets][::-1],
            buckets.z[1:nbuckets][::-1],
        )
        suffix = _scan_add(body)
        total = _scan_add(suffix)
        return G1Points(total.x[-1], total.y[-1], total.z[-1])

    def step(acc, digit):
        acc = jax.lax.fori_loop(0, c, lambda _, a: g1.double(a), acc)
        acc = g1.add(acc, window_sum(digit))
        return acc, None

    acc0 = g1.identity(())
    # windows from most significant down
    acc, _ = jax.lax.scan(step, acc0, digits[::-1])
    return acc


def msm_host(scalars, points_affine, c: int = 8):
    """Convenience host wrapper: python ints / host points -> host point."""
    sc = jnp.asarray(ints_to_limbs([s % params.R for s in scalars], FR_RING.L))
    pts = g1.encode_points(points_affine)
    out = msm(sc, pts, c=c)
    return g1.decode_points(G1Points(out.x[None], out.y[None], out.z[None]))[0]
