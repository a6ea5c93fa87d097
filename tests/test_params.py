"""Validate every numeric constant of the proving system."""

import random

from aleo_tpu import params
from aleo_tpu.reference import curve, edwards
from aleo_tpu.reference.field import FQ, FR, fr_root_of_unity


def test_params_validate():
    params.validate()


def test_fr_roots_of_unity():
    for log in (1, 2, 10, 16):
        w = fr_root_of_unity(1 << log)
        assert pow(w, 1 << log, params.R) == 1
        assert pow(w, 1 << (log - 1), params.R) == params.R - 1


def test_g1_generator_order():
    G = curve.G1.generator()
    assert curve.G1.is_on_curve(G)
    assert curve.G1.mul_full(params.R, G) is None
    assert curve.G1.mul(2, G) is not None


def test_g1_group_laws(rng):
    rng = random.Random(1)
    G = curve.G1.generator()
    a, b = rng.randrange(params.R), rng.randrange(params.R)
    P, Q = curve.G1.mul(a, G), curve.G1.mul(b, G)
    assert curve.G1.add(P, Q) == curve.G1.add(Q, P)
    assert curve.G1.add(P, curve.G1.neg(P)) is None
    assert curve.G1.mul(a + b, G) == curve.G1.add(P, Q)


def test_g2_generator_on_curve_and_order():
    H = curve.G2.generator()
    assert curve.G2.is_on_curve(H)
    assert curve.G2.mul(params.R, H) is None


def test_edwards_generator():
    G = edwards.generator()
    assert edwards.is_on_curve(G)
    assert edwards.mul(params.EDWARDS_ORDER, G) == edwards.IDENTITY
    # group laws
    P = edwards.mul(12345, G)
    Q = edwards.mul(54321, G)
    assert edwards.add(P, Q) == edwards.add(Q, P)
    assert edwards.add(P, edwards.neg(P)) == edwards.IDENTITY
    assert edwards.mul(12345 + 54321, G) == edwards.add(P, Q)


def test_fq_sqrt():
    rng = random.Random(2)
    for _ in range(5):
        a = rng.randrange(params.Q)
        s = FQ.mul(a, a)
        r = FQ.sqrt(s)
        assert FQ.mul(r, r) == s


def test_fr_field_ops():
    rng = random.Random(3)
    a, b = rng.randrange(params.R), rng.randrange(params.R)
    assert FR.mul(a, FR.inv(a)) == 1
    assert FR.sub(FR.add(a, b), b) == a
