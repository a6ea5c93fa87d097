"""Device polynomial ops, SRS generation, and KZG commit/open/verify."""

import random

import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # full-size device proofs/kernels; see pytest.ini tiers

from aleo_tpu import params
from aleo_tpu.curves import g1
from aleo_tpu.fields.modring import FR_RING as F
from aleo_tpu.pcs import kzg, poly_device as pd
from aleo_tpu.pcs.srs import Srs
from aleo_tpu.reference import polynomial as poly
from aleo_tpu.reference.curve import G1
from aleo_tpu.reference.msm import msm_naive

R = params.R
DEG = 31  # SRS degree for tests


@pytest.fixture(scope="module")
def srs():
    return Srs.generate(DEG, seed=b"test-srs")


def test_poly_device_basics():
    rng = random.Random(600)
    a = [rng.randrange(R) for _ in range(16)]
    z = rng.randrange(R)
    ae = F.encode(a)
    ze = F.encode([z])[0]
    # powers / eval
    got = int(F.decode(pd.eval_coeffs(ae, ze)[None])[0])
    assert got == poly.evaluate(a, z)
    # tree_sum
    s = int(F.decode(pd.tree_sum(ae)[None])[0])
    assert s == sum(a) % R
    # poly_mul
    b = [rng.randrange(R) for _ in range(9)]
    prod = pd.poly_mul(ae, F.encode(b))
    assert list(F.decode(prod)) == poly.poly_mul(a, b)


def test_divide_by_vanishing_device():
    rng = random.Random(601)
    a = [rng.randrange(R) for _ in range(37)]
    n = 8
    quo, rem = pd.divide_by_vanishing(F.encode(a), n)
    q_host, r_host = poly.divide_by_vanishing(a, n)
    x = rng.randrange(R)
    vx = (pow(x, n, R) - 1) % R
    lhs = (poly.evaluate(list(F.decode(quo)), x) * vx + poly.evaluate(list(F.decode(rem)), x)) % R
    assert lhs == poly.evaluate(a, x)


def test_divide_by_linear_device():
    rng = random.Random(602)
    a = [rng.randrange(R) for _ in range(16)]
    z = rng.randrange(R)
    q, y = pd.divide_by_linear_via_domain(F.encode(a), F.encode([z])[0])
    q_host, y_host = poly.divide_by_linear(a, z)
    assert int(F.decode(y[None])[0]) == y_host
    assert list(F.decode(q)) == q_host + [0] * (len(list(F.decode(q))) - len(q_host))


def test_srs_powers_correct(srs):
    pts = g1.decode_points(srs.powers)
    tau_pts_ok = 0
    # P_0 = G; verify P_i chain: P_{i+1} = tau * P_i indirectly via pairing-free
    # check P_1 defined by generation seed; here spot-check via discrete relation:
    # msm([1,0,...]) == G etc. (full verification happens through KZG tests)
    assert pts[0] == G1.generator()
    assert all(p is not None for p in pts)


def test_kzg_commit_matches_naive_msm(srs):
    rng = random.Random(603)
    coeffs = [rng.randrange(R) for _ in range(DEG + 1)]
    cm = kzg.commit_host(srs, F.encode(coeffs))
    pts = g1.decode_points(srs.powers)
    assert cm == msm_naive(coeffs, pts)


def test_kzg_open_verify_roundtrip(srs):
    rng = random.Random(604)
    coeffs = [rng.randrange(R) for _ in range(17)]
    ce = F.encode(coeffs)
    cm = kzg.commit_host(srs, ce)
    z = rng.randrange(R)
    ze = F.encode([z])[0]
    w, y = kzg.open_at(srs, ce, ze)
    y_int = int(F.decode(y[None])[0])
    assert y_int == poly.evaluate(coeffs, z)
    assert kzg.verify(srs, cm, z, y_int, w)
    # wrong value fails
    assert not kzg.verify(srs, cm, z, (y_int + 1) % R, w)


def test_kzg_batch_open_verify(srs):
    rng = random.Random(605)
    polys = [[rng.randrange(R) for _ in range(12)], [rng.randrange(R) for _ in range(7)]]
    enc = [F.encode(p) for p in polys]
    cms = [kzg.commit_host(srs, e) for e in enc]
    z = rng.randrange(R)
    gamma = rng.randrange(R)
    w, ys = kzg.batch_open_at(srs, enc, F.encode([z])[0], F.encode([gamma])[0])
    ys_int = [int(F.decode(y[None])[0]) for y in ys]
    assert ys_int == [poly.evaluate(p, z) for p in polys]
    assert kzg.batch_verify(srs, cms, z, ys_int, gamma, w)
    assert not kzg.batch_verify(srs, cms, z, [ys_int[0], (ys_int[1] + 3) % R], gamma, w)
