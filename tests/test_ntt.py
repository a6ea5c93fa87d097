"""Device NTT vs host oracle."""

import random

from aleo_tpu import params
from aleo_tpu.fields.modring import FR_RING as F
from aleo_tpu.ntt import ntt as dntt
from aleo_tpu.reference import polynomial as poly

R = params.R


def test_ntt_matches_oracle():
    rng = random.Random(400)
    for n in (2, 16, 64, 256):
        a = [rng.randrange(R) for _ in range(n)]
        got = F.decode(dntt.ntt(F.encode(a)))
        assert list(got) == poly.ntt(a), f"n={n}"


def test_intt_roundtrip():
    rng = random.Random(401)
    n = 128
    a = [rng.randrange(R) for _ in range(n)]
    enc = F.encode(a)
    back = F.decode(dntt.intt(dntt.ntt(enc)))
    assert list(back) == a


def test_intt_matches_oracle():
    rng = random.Random(402)
    n = 64
    a = [rng.randrange(R) for _ in range(n)]
    got = F.decode(dntt.intt(F.encode(a)))
    assert list(got) == poly.ntt(a, invert=True)


def test_coset_ntt_matches_oracle():
    rng = random.Random(403)
    n = 64
    shift = params.FR_GENERATOR
    a = [rng.randrange(R) for _ in range(n)]
    got = F.decode(dntt.coset_ntt(F.encode(a), shift))
    assert list(got) == poly.coset_ntt(a, shift)
    back = F.decode(dntt.coset_intt(dntt.coset_ntt(F.encode(a), shift), shift))
    assert list(back) == a
