"""Batched Edwards-BLS12 ops on device (record-scan acceleration).

VERDICT r2 row 3: the account curve previously had only a host oracle. The
view-key record scan (`is_owner_with_address_x_coordinate`,
`/root/reference/rust/src/api/blocking.rs:275`) is a per-ciphertext ECDH:
shared_i = view_scalar * eph_i over Edwards-BLS12. Coordinates live in Fr,
so the group law runs on the limbs-first Fr pipeline (`fields.fr_lf`):
batched unified twisted-Edwards addition (a = -1), one double-and-add ladder
of ~253 iterations for the whole ciphertext batch at once.

Used by `sdk.api_client` for bulk scans; the host oracle
(`reference/edwards.py`) remains the correctness reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import params
from ..fields import fr_lf as lf

R = params.R
A = params.EDWARDS_A
D = params.EDWARDS_D


def encode_points(pts) -> tuple:
    """Host affine [(x, y)] -> ((L, N), (L, N)) Montgomery limbs-first."""
    xs = lf.encode([p[0] for p in pts])
    ys = lf.encode([p[1] for p in pts])
    return xs, ys


def decode_points(xy) -> list:
    xs = lf.decode(xy[0])
    ys = lf.decode(xy[1])
    return [(int(x), int(y)) for x, y in zip(xs, ys)]


def _unified_add(P, Q):
    """Unified twisted-Edwards addition (complete for a = -1, d non-square):
    x3 = (x1 y2 + y1 x2) / (1 + d x1 x2 y1 y2),
    y3 = (y1 y2 + x1 x2) / (1 - d x1 x2 y1 y2)   [a = -1]."""
    x1, y1 = P
    x2, y2 = Q
    x1x2 = lf.mul(x1, x2)
    y1y2 = lf.mul(y1, y2)
    x1y2 = lf.mul(x1, y2)
    y1x2 = lf.mul(y1, x2)
    t = lf.mul(x1x2, y1y2)
    dt = lf.mul(t, lf.const(D, t.shape[1]))
    one = lf.one(t.shape[1])
    inv_x = lf.batch_inv(lf.add(one, dt))
    inv_y = lf.batch_inv(lf.sub(one, dt))
    x3 = lf.mul(lf.add(x1y2, y1x2), inv_x)
    y3 = lf.mul(lf.add(y1y2, x1x2), inv_y)
    return (x3, y3)


def _identity(n: int):
    return (lf.zero(n), lf.one(n))


@jax.jit
def scalar_mul_batch(scalar_bits: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray):
    """[k]P_i for a shared scalar over a point batch.

    scalar_bits: (nbits,) uint32 MSB-first; xs/ys: (L, N) Montgomery.
    lax.scan double-and-add: one add + one double instance in the graph.
    """
    n = xs.shape[1]

    def step(acc, bit):
        acc = _unified_add(acc, acc)                      # double
        with_add = _unified_add(acc, (xs, ys))
        keep = (bit == 1)
        out = (
            jnp.where(keep, with_add[0], acc[0]),
            jnp.where(keep, with_add[1], acc[1]),
        )
        return out, None

    acc0 = _identity(n)
    out, _ = jax.lax.scan(step, acc0, scalar_bits)
    return lf.normalize(out[0]), lf.normalize(out[1])


def shared_secrets(view_scalar: int, eph_points) -> list:
    """ECDH batch: [(x, y)] host ephemeral points -> [(x, y)] shared points.

    The device path for RecordCiphertext.is_owner/decrypt over many records
    (the reverse-scan hot loop, blocking.rs:261-318).
    """
    nbits = max(1, view_scalar.bit_length())
    bits = jnp.asarray(
        [(view_scalar >> (nbits - 1 - i)) & 1 for i in range(nbits)],
        dtype=jnp.uint32,
    )
    xs, ys = encode_points(eph_points)
    ox, oy = scalar_mul_batch(bits, xs, ys)
    return decode_points((ox, oy))
