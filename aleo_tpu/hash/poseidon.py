"""Batched Poseidon permutation/sponge over Fr on TPU.

Device twin of `aleo_tpu.reference.poseidon` (same parameters — see that
module for provenance vs the reference's snarkVM `hash_psd2/4/8`,
`/root/reference/rust/src/account/encryptor.rs:47,66`). Used for bulk record
commitments/encryptions and as a building block of the in-circuit hash
gadget; rounds run under lax.scan (one compiled round body), the x^17 S-box
is 4 squarings + 1 mul, and the MDS matvec is a stacked mul + log-tree adds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.modring import FR_RING as F
from ..reference import poseidon as ref

ALPHA = ref.ALPHA


class DeviceParams:
    def __init__(self, rate: int):
        p = ref.PoseidonParams.standard(rate)
        self.rate = rate
        self.t = p.t
        self.full = p.full_rounds
        self.partial = p.partial_rounds
        n_rounds = p.full_rounds + p.partial_rounds
        # numpy (not jnp) so instances are trace-safe constants
        self.ark = np.stack(
            [F.to_mont_host(row) for row in p.ark]
        )  # (rounds, t, L)
        self.mds = np.stack(
            [F.to_mont_host(row) for row in p.mds]
        )  # (t, t, L)
        half = p.full_rounds // 2
        self.full_flag = np.asarray(
            [1 if (r < half or r >= half + p.partial_rounds) else 0 for r in range(n_rounds)],
            dtype=np.uint32,
        )


@functools.lru_cache(maxsize=None)
def device_params(rate: int) -> DeviceParams:
    return DeviceParams(rate)


def _x17(x):
    y = F.sq(F.sq(F.sq(F.sq(x))))  # x^16
    return F.mul(y, x)


def _permute_core(state, ark, mds, full_flag, t: int):
    """state: (..., t, L). Scans over rounds."""

    def round_body(s, inputs):
        rc, is_full = inputs
        s = F.add(s, rc)                        # (..., t, L) + (t, L)
        sbox = _x17(s)
        lane = jnp.arange(t)
        mask = (is_full == 1) | (lane == 0)     # (t,)
        s = F.select(jnp.broadcast_to(mask, s.shape[:-1]), sbox, s)
        # MDS: new_i = sum_j mds[i, j] * s_j
        prod = F.mul(mds, s[..., None, :, :])   # (..., t, t, L)
        acc = prod[..., 0, :]
        for j in range(1, t):
            acc = F.add(acc, prod[..., j, :])
        return acc, None

    out, _ = jax.lax.scan(round_body, state, (ark, full_flag))
    return out


_permute_jit = jax.jit(_permute_core, static_argnames=("t",))


def permute(state: jnp.ndarray, rate: int) -> jnp.ndarray:
    """Poseidon permutation; state (..., t, L) Montgomery limbs."""
    dp = device_params(rate)
    return _permute_jit(
        state, jnp.asarray(dp.ark), jnp.asarray(dp.mds), jnp.asarray(dp.full_flag), t=dp.t
    )


def hash_batch(rate: int, inputs: jnp.ndarray, domain: str = "AleoPoseidon") -> jnp.ndarray:
    """Batched fixed-length hash: inputs (B, k, L) -> (B, L).

    Matches reference.poseidon.hash_psd(rate, row, domain) per batch row.
    """
    dp = device_params(rate)
    b, k, L = inputs.shape
    dom = F.const(ref.domain_fe(f"{domain}{rate}"))
    length = F.const(k)
    # snarkVM hash_many convention: zero state; the preimage
    # [domain, len, in_0, ...] is absorbed into the rate section
    state = jnp.zeros((b, dp.t, L), dtype=jnp.uint32)
    elems = jnp.concatenate([
        jnp.broadcast_to(dom, (b, 1, L)),
        jnp.broadcast_to(length, (b, 1, L)),
        inputs,
    ], axis=1)
    n = elems.shape[1]
    pos = 0
    for i in range(n):
        if pos == rate:
            state = permute(state, rate)
            pos = 0
        state = state.at[:, 1 + pos, :].set(F.add(state[:, 1 + pos, :], elems[:, i, :]))
        pos += 1
    state = permute(state, rate)
    return state[:, 1, :]
