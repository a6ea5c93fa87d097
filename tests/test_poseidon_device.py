"""Device Poseidon vs host oracle."""

import random

import jax.numpy as jnp

from aleo_tpu import params
from aleo_tpu.fields.modring import FR_RING as F
from aleo_tpu.hash import poseidon as dev
from aleo_tpu.reference import poseidon as ref

R = params.R


def test_permutation_matches_oracle():
    rng = random.Random(500)
    p = ref.PoseidonParams.standard(2)
    states = [[rng.randrange(R) for _ in range(3)] for _ in range(4)]
    enc = jnp.stack([F.encode(s) for s in states])  # (4, 3, L)
    got = dev.permute(enc, rate=2)
    for i, s in enumerate(states):
        want = ref.permute(s, p)
        assert list(F.decode(got[i])) == want, f"row {i}"


def test_hash_batch_matches_oracle():
    rng = random.Random(501)
    b, k = 5, 7
    rows = [[rng.randrange(R) for _ in range(k)] for _ in range(b)]
    enc = jnp.stack([F.encode(r) for r in rows])
    got = dev.hash_batch(2, enc, domain="T")
    for i, row in enumerate(rows):
        assert int(F.decode(got[i : i + 1])[0]) == ref.hash_psd(2, row, domain="T")


def test_hash_batch_rate4():
    rng = random.Random(502)
    rows = [[rng.randrange(R) for _ in range(3)] for _ in range(2)]
    enc = jnp.stack([F.encode(r) for r in rows])
    got = dev.hash_batch(4, enc, domain="X")
    for i, row in enumerate(rows):
        assert int(F.decode(got[i : i + 1])[0]) == ref.hash_psd(4, row, domain="X")
