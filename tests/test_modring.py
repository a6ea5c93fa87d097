"""Bit-exact tests of JAX limb arithmetic against the Python bigint oracle."""

import random

import jax
import numpy as np
import pytest

from aleo_tpu import params
from aleo_tpu.fields.modring import FQ_RING, FR_RING, ints_to_limbs, limbs_to_ints

RINGS = [FQ_RING, FR_RING]


def _rand_ints(rng, ring, n):
    return [rng.randrange(ring.p) for _ in range(n)]


@pytest.mark.parametrize("ring", RINGS, ids=lambda r: r.name)
def test_encode_decode_roundtrip(ring):
    rng = random.Random(100)
    xs = _rand_ints(rng, ring, 7) + [0, 1, ring.p - 1]
    enc = ring.encode(xs)
    dec = ring.decode(enc)
    assert list(dec) == xs


@pytest.mark.parametrize("ring", RINGS, ids=lambda r: r.name)
def test_limbs_roundtrip(ring):
    rng = random.Random(101)
    xs = _rand_ints(rng, ring, 5)
    limbs = ints_to_limbs(xs, ring.L)
    assert list(limbs_to_ints(limbs)) == xs


@pytest.mark.parametrize("ring", RINGS, ids=lambda r: r.name)
def test_add_sub_neg(ring):
    rng = random.Random(102)
    n = 16
    a_int = _rand_ints(rng, ring, n - 2) + [0, ring.p - 1]
    b_int = _rand_ints(rng, ring, n - 2) + [ring.p - 1, ring.p - 1]
    a, b = ring.encode(a_int), ring.encode(b_int)
    got_add = ring.decode(jax.jit(ring.add)(a, b))
    got_sub = ring.decode(jax.jit(ring.sub)(a, b))
    got_neg = ring.decode(jax.jit(ring.neg)(a))
    for i in range(n):
        assert got_add[i] == (a_int[i] + b_int[i]) % ring.p
        assert got_sub[i] == (a_int[i] - b_int[i]) % ring.p
        assert got_neg[i] == (-a_int[i]) % ring.p


@pytest.mark.parametrize("ring", RINGS, ids=lambda r: r.name)
def test_mul(ring):
    rng = random.Random(103)
    n = 32
    a_int = _rand_ints(rng, ring, n - 3) + [0, 1, ring.p - 1]
    b_int = _rand_ints(rng, ring, n - 3) + [ring.p - 1, ring.p - 1, ring.p - 1]
    a, b = ring.encode(a_int), ring.encode(b_int)
    got = ring.decode(jax.jit(ring.mul)(a, b))
    for i in range(n):
        assert got[i] == a_int[i] * b_int[i] % ring.p, f"lane {i}"


@pytest.mark.parametrize("ring", RINGS, ids=lambda r: r.name)
def test_mul_broadcast_and_shapes(ring):
    rng = random.Random(104)
    a_int = _rand_ints(rng, ring, 6)
    c_int = rng.randrange(ring.p)
    a = ring.encode(a_int).reshape(2, 3, ring.L)
    c = ring.const(c_int)
    got = ring.decode(jax.jit(ring.mul)(a, c)).reshape(-1)
    for i in range(6):
        assert got[i] == a_int[i] * c_int % ring.p


@pytest.mark.parametrize("ring", RINGS, ids=lambda r: r.name)
def test_inv(ring):
    rng = random.Random(105)
    n = 4
    a_int = _rand_ints(rng, ring, n - 1) + [1]
    a = ring.encode(a_int)
    got = ring.decode(jax.jit(ring.inv)(a))
    for i in range(n):
        assert got[i] == pow(a_int[i], -1, ring.p)


@pytest.mark.parametrize("ring", RINGS, ids=lambda r: r.name)
def test_batch_inv(ring):
    rng = random.Random(106)
    for n in (1, 2, 5, 16):
        a_int = _rand_ints(rng, ring, n)
        a_int = [x or 1 for x in a_int]
        a = ring.encode(a_int)
        got = ring.decode(jax.jit(ring.batch_inv)(a))
        for i in range(n):
            assert got[i] == pow(a_int[i], -1, ring.p)


@pytest.mark.parametrize("ring", RINGS, ids=lambda r: r.name)
def test_pow_and_small(ring):
    rng = random.Random(107)
    a_int = _rand_ints(rng, ring, 3)
    a = ring.encode(a_int)
    got17 = ring.decode(jax.jit(lambda x: ring.pow_fixed(x, 17))(a))
    got3 = ring.decode(jax.jit(lambda x: ring.mul_small(x, 3))(a))
    for i in range(3):
        assert got17[i] == pow(a_int[i], 17, ring.p)
        assert got3[i] == 3 * a_int[i] % ring.p


@pytest.mark.parametrize("ring", RINGS, ids=lambda r: r.name)
def test_form_conversions(ring):
    rng = random.Random(108)
    xs = _rand_ints(rng, ring, 4)
    raw = np.asarray(ints_to_limbs(xs, ring.L))
    mont = jax.jit(ring.to_mont)(raw)
    back = jax.jit(ring.from_mont)(mont)
    assert list(limbs_to_ints(np.asarray(back))) == xs
