"""Ate pairing sanity: bilinearity and non-degeneracy (host verifier core)."""

import pytest

pytestmark = pytest.mark.slow  # full-size device proofs/kernels; see pytest.ini tiers

from aleo_tpu import params
from aleo_tpu.reference import curve


@pytest.mark.slow
def test_pairing_bilinear():
    G = curve.G1.generator()
    H = curve.G2.generator()
    a, b = 127, 331
    lhs = curve.pairing(curve.G1.mul(a, G), curve.G2.mul(b, H))
    rhs = curve.pairing(G, H).pow((a * b) % params.R)
    assert lhs == rhs
    assert not curve.pairing(G, H).is_one()


@pytest.mark.slow
def test_pairing_check_product():
    G = curve.G1.generator()
    H = curve.G2.generator()
    # e(aG, H) * e(-aG, H) == 1
    P = curve.G1.mul(77, G)
    assert curve.pairing_check([(P, H), (curve.G1.neg(P), H)])
    assert not curve.pairing_check([(P, H), (P, H)])
