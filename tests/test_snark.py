"""End-to-end SNARK: R1CS -> index -> TPU prove -> independent host verify."""

import pytest

pytestmark = pytest.mark.slow  # full-size device proofs/kernels; see pytest.ini tiers

from aleo_tpu import params
from aleo_tpu.pcs.srs import Srs
from aleo_tpu.snark.indexer import index_r1cs
from aleo_tpu.snark.prover import prove
from aleo_tpu.snark.r1cs import LC, ConstraintSystem
from aleo_tpu.snark.verifier import VerifyingKey, verify

R = params.R


def cubic_circuit(x_val: int) -> ConstraintSystem:
    """Prove knowledge of x with x^3 + x + 5 = out (out public)."""
    cs = ConstraintSystem()
    out_val = (pow(x_val, 3, R) + x_val + 5) % R
    out = cs.alloc_input(out_val)
    x = cs.alloc_witness(x_val)
    x2 = cs.mul(LC.of(x), LC.of(x))
    x3 = cs.mul(LC.of(x2), LC.of(x))
    cs.enforce_eq(LC.of(x3) + LC.of(x) + LC.constant(5), LC.of(out))
    assert cs.is_satisfied()
    return cs


@pytest.fixture(scope="module")
def srs():
    return Srs.generate(63, seed=b"snark-test-srs")


def test_snark_end_to_end(srs):
    cs = cubic_circuit(3)
    index = index_r1cs(cs, srs=srs)
    proof = prove(index, cs)
    vk = VerifyingKey.from_index(index)
    assert verify(vk, cs.public_inputs(), proof)


def test_snark_rejects_wrong_public_input(srs):
    cs = cubic_circuit(3)
    index = index_r1cs(cs, srs=srs)
    proof = prove(index, cs)
    vk = VerifyingKey.from_index(index)
    bad_inputs = list(cs.public_inputs())
    bad_inputs[1] = (bad_inputs[1] + 1) % R
    assert not verify(vk, bad_inputs, proof)


def test_snark_rejects_tampered_proof(srs):
    cs = cubic_circuit(5)
    index = index_r1cs(cs, srs=srs)
    proof = prove(index, cs)
    vk = VerifyingKey.from_index(index)
    proof.evals_beta["z_a"] = (proof.evals_beta["z_a"] + 1) % R
    assert not verify(vk, cs.public_inputs(), proof)


def test_snark_proofs_are_hiding(srs):
    """Two proofs of the same statement must differ (ZK masking randomness)."""
    cs = cubic_circuit(3)
    index = index_r1cs(cs, srs=srs)
    p1 = prove(index, cs)
    p2 = prove(index, cs)
    vk = VerifyingKey.from_index(index)
    assert verify(vk, cs.public_inputs(), p1)
    assert verify(vk, cs.public_inputs(), p2)
    assert p1.commitments["z"] != p2.commitments["z"]
    assert p1.evals_beta["z"] != p2.evals_beta["z"]


def test_snark_rejects_degree_violation(srs):
    """A g1 of illegal degree must fail the shifted-commitment check."""
    import random

    cs = cubic_circuit(3)
    index = index_r1cs(cs, srs=srs)
    rng = random.Random(42)
    proof = prove(index, cs, rng=rng)
    vk = VerifyingKey.from_index(index)
    # forge: pretend g1 evaluates to something else while keeping the
    # lincheck identity intact by shifting h1's claimed value — the shifted
    # eval check must catch the mismatch.
    tr_beta_g1 = proof.evals_beta["g1"]
    proof.evals_beta["g1_shift"] = (proof.evals_beta["g1_shift"] + 1) % R
    assert not verify(vk, cs.public_inputs(), proof)
    proof.evals_beta["g1_shift"] = (
        proof.evals_beta["g1_shift"] - 1
    ) % R  # restore
    assert proof.evals_beta["g1"] == tr_beta_g1


def test_proof_serialization_roundtrip(srs):
    from aleo_tpu.snark.serialize import proof_from_bytes, proof_to_bytes

    cs = cubic_circuit(7)
    index = index_r1cs(cs, srs=srs)
    proof = prove(index, cs)
    vk = VerifyingKey.from_index(index)
    blob = proof_to_bytes(proof, index.n, index.m, index.ell)
    proof2, n, m, ell = proof_from_bytes(blob)
    assert (n, m, ell) == (index.n, index.m, index.ell)
    assert proof2.commitments == proof.commitments
    assert proof2.w_beta == proof.w_beta and proof2.w_gamma == proof.w_gamma
    assert proof2.evals_beta == proof.evals_beta
    assert proof2.evals_gamma == proof.evals_gamma
    assert verify(vk, cs.public_inputs(), proof2)
    assert len(blob) == 16 + (len(proof.commitments) + 2) * 48 + (
        4 + len(proof.evals_beta) + len(proof.evals_gamma)
    ) * 32
