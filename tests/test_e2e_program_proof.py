"""End-to-end: Aleo program execution -> R1CS -> Varuna prove -> verify.

Closes BASELINE.json config 3's correctness half: the synthesizer
(`program/synthesizer.py`) and the SNARK stack (`snark/`) meet through
`snark/pipeline.py`, mirroring the reference's execute->prove flow
(`/root/reference/wasm/src/programs/manager/execute.rs:117-190`). Keys are
synthesized from burner inputs (deploy-time shape) and reused to prove a
different concrete execution — the structural-stability property snarkVM's
ProvingKey reuse relies on.
"""

import pytest

from aleo_tpu import params
from aleo_tpu.program.examples import load_example
from aleo_tpu.program.interpreter import Registry
from aleo_tpu.program.parser import parse_program
from aleo_tpu.program.values import Record, Value
from aleo_tpu.snark import pipeline

R = params.R

MICRO = """
program micro.aleo;

function bump:
    input r0 as u64.private;
    add r0 1u64 into r1;
    output r1 as u64.private;
"""


@pytest.fixture(scope="module")
def micro_keys():
    reg = Registry()
    reg.add(parse_program(MICRO))
    keys = pipeline.synthesize_keys(reg, "micro.aleo", "bump")
    return reg, keys


def test_micro_program_proof_roundtrip(micro_keys):
    reg, keys = micro_keys
    ep = pipeline.prove_execution(keys, reg, [Value("u64", 41)])
    assert ep.transition.outputs[0].data == 42
    assert pipeline.verify_execution(keys, ep)


@pytest.mark.slow
def test_micro_program_proof_rejects_tampered_output(micro_keys):
    reg, keys = micro_keys
    ep = pipeline.prove_execution(keys, reg, [Value("u64", 7)])
    ep.public_inputs[-1] = (ep.public_inputs[-1] + 1) % R
    assert not pipeline.verify_execution(keys, ep)


@pytest.mark.slow
def test_simple_token_transfer_proof():
    """BASELINE config 3: prove a simple_token `transfer` transition."""
    reg = load_example("simple_token")
    keys = pipeline.synthesize_keys(reg, "token.aleo", "transfer")
    sender, receiver = 123456789, 987654321
    rec = Record(
        "token.aleo", "token", owner=sender, gates=0,
        entries={"amount": Value("u64", 500)}, nonce=7,
    )
    ep = pipeline.prove_execution(
        keys, reg, [rec, Value("address", receiver), Value("u64", 120)],
        caller=sender,
    )
    out_recs = ep.transition.created_records
    assert [r.entries["amount"].data for r in out_recs] == [120, 380]
    assert pipeline.verify_execution(keys, ep)
    # proof must not verify with a different transition's public inputs
    bad = list(ep.public_inputs)
    bad[2] = (bad[2] + 1) % R
    from aleo_tpu.snark.verifier import verify

    assert not verify(keys.vk, bad, ep.proof)


def test_function_key_cache_roundtrip(micro_keys):
    """Disk-cached keys reload with identical structure (pipeline key cache,
    the reference's proving-key file role)."""
    import time

    reg, keys = micro_keys
    t0 = time.time()
    keys2 = pipeline.synthesize_keys(reg, "micro.aleo", "bump")
    assert time.time() - t0 < 5, "second synthesis should hit the disk cache"
    assert (keys2.index.n, keys2.index.m, keys2.index.ell) == (
        keys.index.n, keys.index.m, keys.index.ell
    )
    assert keys2.vk.index_commitments == keys.vk.index_commitments
    assert keys2.constraint_counts == keys.constraint_counts
