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
    """Degree bounds are enforced by the pairing check
    e(cm_shift, H) == e(cm, [tau^s]H): a g1_shift commitment that is not
    the tau^s-multiple of cm_g1 (equivalently, a g1 of illegal degree, for
    which no valid cm_shift is computable from the SRS) must fail."""
    from aleo_tpu.reference.curve import G1

    cs = cubic_circuit(3)
    index = index_r1cs(cs, srs=srs)
    proof = prove(index, cs)
    vk = VerifyingKey.from_index(index)
    good = proof.commitments["g1_shift"]
    proof.commitments["g1_shift"] = G1.add(good, G1.generator())
    assert not verify(vk, cs.public_inputs(), proof)
    proof.commitments["g1_shift"] = good
    assert verify(vk, cs.public_inputs(), proof)
    # same for a K-side bound
    good2 = proof.commitments["g2_shift_b"]
    proof.commitments["g2_shift_b"] = G1.add(good2, G1.generator())
    assert not verify(vk, cs.public_inputs(), proof)
    proof.commitments["g2_shift_b"] = good2
    assert verify(vk, cs.public_inputs(), proof)


def test_commit_shifted_matches_dense(srs):
    """commit_shifted_lf(p, s) must equal the commitment of X^s * p."""
    import jax.numpy as jnp
    from aleo_tpu.fields import fr_lf as lf
    from aleo_tpu.pcs import kzg

    coeffs = [3, 1, 4, 1, 5, 9, 2, 6]
    p = lf.encode(coeffs)
    s = 5
    dense = jnp.concatenate(
        [jnp.zeros((lf.L, s), jnp.uint32), p], axis=1
    )
    assert kzg.commit_shifted_lf(srs, p, s) == kzg.commit_lf(srs, dense)
    many = kzg.commit_many_lf(srs, [p, p], shift=s)
    assert many[0] == many[1] == kzg.commit_lf(srs, dense)


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
