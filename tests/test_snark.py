"""End-to-end SNARK: R1CS -> index -> TPU prove -> independent host verify."""

import pytest

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
