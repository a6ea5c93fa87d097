"""Batched G1 device arithmetic vs the host oracle."""

import random

import jax

from aleo_tpu import params
from aleo_tpu.curves import g1
from aleo_tpu.reference.curve import G1


def _rand_points(rng, n):
    G = G1.generator()
    return [G1.mul(rng.randrange(1, params.R), G) for _ in range(n)]


def test_add_matches_oracle():
    rng = random.Random(200)
    n = 8
    pa = _rand_points(rng, n - 1) + [None]
    pb = _rand_points(rng, n - 2) + [None, None]
    da, db = g1.encode_points(pa), g1.encode_points(pb)
    out = g1.decode_points(jax.jit(g1.add)(da, db))
    for i in range(n):
        assert out[i] == G1.add(pa[i], pb[i]), f"lane {i}"


def test_add_doubling_and_inverse_cases():
    rng = random.Random(201)
    P = _rand_points(rng, 1)[0]
    cases_a = [P, P, None, None]
    cases_b = [P, G1.neg(P), P, None]
    da, db = g1.encode_points(cases_a), g1.encode_points(cases_b)
    out = g1.decode_points(jax.jit(g1.add)(da, db))
    assert out[0] == G1.add(P, P)
    assert out[1] is None
    assert out[2] == P
    assert out[3] is None


def test_double_matches_oracle():
    rng = random.Random(202)
    pts = _rand_points(rng, 4) + [None]
    d = g1.encode_points(pts)
    out = g1.decode_points(jax.jit(g1.double)(d))
    for i, p in enumerate(pts):
        assert out[i] == G1.add(p, p)


def test_scale_matches_oracle():
    rng = random.Random(203)
    pts = _rand_points(rng, 2)
    k = rng.randrange(1, 1 << 32)
    bits = g1.scalar_bits(k, 32)
    d = g1.encode_points(pts)
    out = g1.decode_points(jax.jit(g1.scale)(bits, d))
    for i, p in enumerate(pts):
        assert out[i] == G1.mul(k, p)


def test_to_affine():
    rng = random.Random(204)
    pts = _rand_points(rng, 3) + [None]
    d = g1.encode_points(pts)
    s = jax.jit(g1.add)(d, d)  # non-trivial Z
    aff = jax.jit(g1.to_affine)(s)
    out = g1.decode_points(aff)
    for i, p in enumerate(pts):
        assert out[i] == G1.add(p, p)
