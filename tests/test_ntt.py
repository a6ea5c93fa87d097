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


def test_four_step_sizes_match_flat_semantics():
    """Sizes >= FOUR_STEP_MIN route through the Bailey 4-step core; results
    must match the host oracle exactly (natural order, incl. inverse+coset)."""
    import random

    from aleo_tpu.ntt.ntt import FOUR_STEP_MIN
    from aleo_tpu.reference import polynomial as rpoly

    n = FOUR_STEP_MIN
    rng = random.Random(44)
    a = [rng.randrange(R) for _ in range(n)]
    enc = F.encode(a)
    got = list(F.decode(dntt.ntt(enc)))
    assert got == rpoly.ntt(a)
    # inverse roundtrip
    back = list(F.decode(dntt.intt(dntt.ntt(enc))))
    assert back == a
    # coset roundtrip
    from aleo_tpu import params

    cs = dntt.coset_ntt(enc, params.FR_GENERATOR)
    back2 = list(F.decode(dntt.coset_intt(cs, params.FR_GENERATOR)))
    assert back2 == a
