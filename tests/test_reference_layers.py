"""Oracle self-consistency: NTT, polynomial algebra, MSM, Poseidon."""

import random

from aleo_tpu import params
from aleo_tpu.reference import msm, polynomial as poly, poseidon
from aleo_tpu.reference.curve import G1
from aleo_tpu.reference.field import fr_root_of_unity

R = params.R


def test_ntt_roundtrip():
    rng = random.Random(10)
    for n in (1, 2, 8, 64, 256):
        a = [rng.randrange(R) for _ in range(n)]
        assert poly.ntt(poly.ntt(a), invert=True) == a


def test_ntt_matches_naive_dft():
    rng = random.Random(11)
    n = 16
    a = [rng.randrange(R) for _ in range(n)]
    w = fr_root_of_unity(n)
    naive = [sum(a[j] * pow(w, i * j, R) for j in range(n)) % R for i in range(n)]
    assert poly.ntt(a) == naive


def test_coset_ntt_roundtrip():
    rng = random.Random(12)
    n = 32
    a = [rng.randrange(R) for _ in range(n)]
    shift = params.FR_GENERATOR
    ev = poly.coset_ntt(a, shift)
    assert poly.coset_intt(ev, shift) == a
    # coset evaluation equals direct evaluation at shift * w^i
    w = fr_root_of_unity(n)
    for i in (0, 1, 7):
        x = shift * pow(w, i, R) % R
        assert ev[i] == poly.evaluate(a, x)


def test_poly_mul_and_divide():
    rng = random.Random(13)
    a = [rng.randrange(R) for _ in range(10)]
    b = [rng.randrange(R) for _ in range(7)]
    c = poly.poly_mul(a, b)
    x = rng.randrange(R)
    assert poly.evaluate(c, x) == poly.evaluate(a, x) * poly.evaluate(b, x) % R
    # vanishing division: p(X) = q(X) * (X^4 - 1) + r(X)
    q, rem = poly.divide_by_vanishing(c, 4)
    vx = (pow(x, 4, R) - 1) % R
    assert (poly.evaluate(q, x) * vx + poly.evaluate(rem, x)) % R == poly.evaluate(c, x)
    # linear division
    z = rng.randrange(R)
    q2, r2 = poly.divide_by_linear(a, z)
    assert r2 == poly.evaluate(a, z)
    assert (poly.evaluate(q2, x) * ((x - z) % R) + r2) % R == poly.evaluate(a, x)


def test_lagrange_coeffs():
    rng = random.Random(14)
    n = 8
    evals = [rng.randrange(R) for _ in range(n)]
    coeffs = poly.interpolate_on_domain(evals)
    x = rng.randrange(R)
    lag = poly.lagrange_coeffs_at(n, x)
    assert sum(l * e for l, e in zip(lag, evals)) % R == poly.evaluate(coeffs, x)
    # at a domain point, lagrange coeffs are an indicator vector
    w = fr_root_of_unity(n)
    lag2 = poly.lagrange_coeffs_at(n, pow(w, 3, R))
    assert lag2[3] == 1 and sum(lag2) == 1


def test_msm_pippenger_matches_naive():
    rng = random.Random(15)
    n = 20
    G = G1.generator()
    pts = [G1.mul(rng.randrange(1, 1000), G) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    assert msm.msm_pippenger(scalars, pts) == msm.msm_naive(scalars, pts)


def test_poseidon_permutation_deterministic():
    p = poseidon.PoseidonParams.standard(2)
    s1 = poseidon.permute([1, 2, 3], p)
    s2 = poseidon.permute([1, 2, 3], p)
    assert s1 == s2
    assert s1 != [1, 2, 3]
    assert all(0 <= x < R for x in s1)


def test_poseidon_sponge_domains_differ():
    h1 = poseidon.hash_psd(2, [5, 6], domain="A")
    h2 = poseidon.hash_psd(2, [5, 6], domain="B")
    h3 = poseidon.hash_psd(2, [5, 6], domain="A")
    assert h1 != h2
    assert h1 == h3
    assert poseidon.hash_psd(2, [5, 6]) != poseidon.hash_psd(2, [6, 5])


def test_poseidon_rates():
    for rate in (2, 4, 8):
        h = poseidon.hash_psd(rate, list(range(10)))
        assert 0 < h < R


def test_mds_invertible():
    # Cauchy matrices are invertible; double-check via determinant-free rank test
    p = poseidon.PoseidonParams.standard(2)
    m = [[x % R for x in row] for row in p.mds]
    # Gaussian elimination over Fr
    t = len(m)
    rank = 0
    for col in range(t):
        piv = next((r for r in range(rank, t) if m[r][col] != 0), None)
        if piv is None:
            continue
        m[rank], m[piv] = m[piv], m[rank]
        inv = pow(m[rank][col], -1, R)
        m[rank] = [x * inv % R for x in m[rank]]
        for r in range(t):
            if r != rank and m[r][col]:
                f = m[r][col]
                m[r] = [(m[r][i] - f * m[rank][i]) % R for i in range(t)]
        rank += 1
    assert rank == t
