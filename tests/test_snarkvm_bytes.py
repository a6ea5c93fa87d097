"""snarkVM byte-format layer: encodings round-trip against the curve oracle.

Primitive encodings (LE fields, compressed SW points with flag bits) follow
the snarkvm-utilities / snarkvm-curves conventions
(`/root/reference/wasm/src/programs/proving_key.rs:34-42`); container
layouts are plumbing for the day `tools/vectors` fixtures land.
"""

import random

import pytest

from aleo_tpu import params
from aleo_tpu.reference.curve import G1, G2
from aleo_tpu.snark import snarkvm_bytes as sb

R = params.R


def _points(n, seed=9):
    rng = random.Random(seed)
    return [G1.mul(rng.randrange(1, R), G1.generator()) for _ in range(n)]


def test_field_roundtrip():
    rng = random.Random(1)
    for _ in range(50):
        v = rng.randrange(R)
        assert sb.fr_from_bytes(sb.fr_to_bytes(v)) == v
        q = rng.randrange(params.Q)
        assert sb.fq_from_bytes(sb.fq_to_bytes(q)) == q
    with pytest.raises(AssertionError):
        sb.fr_from_bytes(int(R).to_bytes(32, "little"))


def test_g1_compressed_roundtrip():
    for p in _points(12) + [None]:
        b = sb.g1_to_bytes(p, compressed=True)
        assert len(b) == 48
        assert sb.g1_from_bytes(b) == p
        bu = sb.g1_to_bytes(p, compressed=False)
        assert len(bu) == 96
        assert sb.g1_from_bytes(bu) == p


def test_g2_compressed_roundtrip():
    rng = random.Random(2)
    pts = [G2.mul(rng.randrange(1, 1 << 60), G2.generator()) for _ in range(6)]
    for p in pts + [None]:
        b = sb.g2_to_bytes(p, compressed=True)
        assert len(b) == 96
        got = sb.g2_from_bytes(b)
        assert got == p
        bu = sb.g2_to_bytes(p, compressed=False)
        assert sb.g2_from_bytes(bu) == p


def test_srs_blob_roundtrip():
    from aleo_tpu.pcs.srs import Srs

    srs = Srs.generate(15, seed=b"bytes-test")
    blob = sb.UniversalSrsBlob.from_srs(srs)
    data = blob.to_bytes()
    back = sb.UniversalSrsBlob.from_bytes(data)
    assert back.max_degree == 15
    assert back.powers_g1 == blob.powers_g1
    assert back.g2_gen == srs.g2_gen and back.g2_tau == srs.g2_tau
    srs2 = back.to_srs()
    assert srs2.host_affine() == srs.host_affine()


def test_key_blobs_roundtrip():
    pts = _points(8, seed=3)
    vk = sb.CircuitVerifyingKeyBlob(n=64, m=128, ell=4, commitments=pts)
    assert sb.CircuitVerifyingKeyBlob.from_bytes(vk.to_bytes()) == vk
    rng = random.Random(4)
    pk = sb.CircuitProvingKeyBlob(
        vk=vk,
        committer_powers=pts[:4],
        index_polys=[[rng.randrange(R) for _ in range(5)] for _ in range(3)],
    )
    back = sb.CircuitProvingKeyBlob.from_bytes(pk.to_bytes())
    assert back == pk
