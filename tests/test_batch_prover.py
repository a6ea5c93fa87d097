"""Batched Varuna prover: k same-circuit proofs in one device pipeline.

BASELINE config-5 shape (batch proving); each proof must verify
independently under the standard verifier with its own transcript.
"""

import pytest

pytestmark = pytest.mark.slow  # full-size device proofs/kernels; see pytest.ini tiers

from aleo_tpu import params
from aleo_tpu.pcs.srs import Srs
from aleo_tpu.snark.batch import prove_batch
from aleo_tpu.snark.indexer import index_r1cs
from aleo_tpu.snark.verifier import VerifyingKey, verify
from tests.test_snark import cubic_circuit

R = params.R


@pytest.fixture(scope="module")
def setup():
    srs = Srs.generate(63, seed=b"batch-test-srs")
    cs_list = [cubic_circuit(x) for x in (3, 5, 11)]
    index = index_r1cs(cs_list[0], srs=srs)
    return index, cs_list


def test_batch_proofs_verify_independently(setup):
    index, cs_list = setup
    proofs = prove_batch(index, cs_list)
    vk = VerifyingKey.from_index(index)
    assert len(proofs) == 3
    for cs, proof in zip(cs_list, proofs):
        assert verify(vk, cs.public_inputs(), proof)
    # proofs are bound to their own statements
    assert not verify(vk, cs_list[1].public_inputs(), proofs[0])


def test_batch_matches_transcript_independence(setup):
    """Each batched proof differs (per-proof masking) and has distinct
    commitments."""
    index, cs_list = setup
    proofs = prove_batch(index, cs_list[:2])
    assert proofs[0].commitments["z"] != proofs[1].commitments["z"]
