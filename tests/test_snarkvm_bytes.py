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
    """snarkVM 0.14.5 container shapes: CircuitVerifyingKey(circuit_info,
    circuit_commitments) and CircuitProvingKey(vk, Circuit, CommitterKey)
    roundtrip with the documented field order."""
    pts = _points(8, seed=3)
    rng = random.Random(4)
    info = sb.CircuitInfoBlob(4, 64, 64, 128, 128, 128)
    vk = sb.CircuitVerifyingKeyBlob(circuit_info=info, circuit_commitments=pts)
    assert sb.CircuitVerifyingKeyBlob.from_bytes(vk.to_bytes()) == vk
    # the vk bytes START with the 48-byte u64 size header (field order)
    assert vk.to_bytes()[:48] == info.to_bytes()

    def fr_vec(n):
        return [rng.randrange(R) for _ in range(n)]

    arith = sb.MatrixArithmetizationBlob(
        row=fr_vec(4), col=fr_vec(4), row_col=fr_vec(4), val=fr_vec(4),
        evals_row=fr_vec(4), evals_col=fr_vec(4), evals_row_col=fr_vec(4),
        evals_val=fr_vec(4),
    )
    mat = sb.MatrixBlob([[(rng.randrange(R), 3), (rng.randrange(R), 7)], []])
    circuit = sb.CircuitBlob(info, mat, mat, mat, arith, arith, arith)
    ck = sb.CommitterKeyBlob(
        powers_of_beta_g=pts,
        lagrange_bases_at_beta_g=[(8, pts[:2])],
        powers_of_beta_times_gamma_g=pts[:2],
        shifted_powers_of_beta_g=pts[:3],
        shifted_powers_of_beta_times_gamma_g=None,
        enforced_degree_bounds=[62, 126],
        max_degree=255,
    )
    pk = sb.CircuitProvingKeyBlob(
        circuit_verifying_key=vk, circuit=circuit, committer_key=ck
    )
    back = sb.CircuitProvingKeyBlob.from_bytes(pk.to_bytes())
    assert back == pk
    # field order: vk bytes are the prefix of the pk bytes
    assert pk.to_bytes()[: len(vk.to_bytes())] == vk.to_bytes()


def test_key_blobs_from_index():
    """Serialize a real Index + ConstraintSystem into the snarkVM shapes."""
    from aleo_tpu.pcs.srs import Srs
    from aleo_tpu.snark.indexer import index_r1cs
    from aleo_tpu.snark.r1cs import LC, ConstraintSystem

    cs = ConstraintSystem()
    out = cs.alloc_input(35)
    x = cs.alloc_witness(5)
    x2 = cs.mul(LC.of(x), LC.of(x))
    cs.enforce_eq(LC.of(x2) + LC.of(x) + LC.constant(5), LC.of(out))
    srs = Srs.generate(63, seed=b"blob-index-test")
    index = index_r1cs(cs, srs=srs)
    pk = sb.CircuitProvingKeyBlob.from_index(index, cs)
    back = sb.CircuitProvingKeyBlob.from_bytes(pk.to_bytes())
    assert back == pk
    assert back.circuit_verifying_key.circuit_commitments == list(
        index.index_commitments()
    )
    assert len(back.circuit.a.rows) == cs.num_constraints
    assert back.committer_key.max_degree == srs.max_degree
