"""Circuit synthesizer: Aleo program -> R1CS, satisfied + sound shapes.

Mirrors the reference's circuit-synthesis behavior (`Process::execute`'s
synthesis half, `/root/reference/wasm/src/programs/macros.rs:85-87`) and
the per-function constraint-count reporting of `aleo run`
(`/root/reference/cli/commands/run.rs:64-95`).
"""

import pytest

from aleo_tpu import params
from aleo_tpu.program.interpreter import Interpreter, Registry
from aleo_tpu.program.parser import parse_program
from aleo_tpu.program.synthesizer import Synthesizer, SynthesisError, synthesize_execution
from aleo_tpu.program.values import Record, Value

R = params.R

SIMPLE_TOKEN = """
program token.aleo;

record token:
    owner as address.private;
    gates as u64.private;
    amount as u64.private;

function mint:
    input r0 as address.private;
    input r1 as u64.private;
    cast r0 0u64 r1 into r2 as token.record;
    output r2 as token.record;

function transfer:
    input r0 as token.record;
    input r1 as address.private;
    input r2 as u64.private;
    sub r0.amount r2 into r3;
    cast r1 0u64 r2 into r4 as token.record;
    cast r0.owner r0.gates r3 into r5 as token.record;
    output r4 as token.record;
    output r5 as token.record;
"""

OPS = """
program ops.aleo;

function arith:
    input r0 as u64.private;
    input r1 as u64.private;
    add r0 r1 into r2;
    mul r0 r1 into r3;
    lt r0 r1 into r4;
    ternary r4 r2 r3 into r5;
    is.eq r0 r1 into r6;
    and r0 r1 into r7;
    div r0 r1 into r8;
    hash.psd2 r2 into r9;
    output r5 as u64.private;
    output r9 as field.private;
"""


@pytest.fixture
def registry():
    reg = Registry()
    reg.add(parse_program(SIMPLE_TOKEN))
    reg.add(parse_program(OPS))
    return reg


def _mk_record(owner, amount, nonce=7):
    return Record("token.aleo", "token", owner, 0,
                  {"amount": Value("u64", amount)}, nonce)


def test_transfer_synthesis_satisfied_and_matches_interpreter(registry):
    rec = _mk_record(owner=123456789, amount=500)
    inputs = [rec, Value("address", 987654321), Value("u64", 120)]
    nonces = iter([11, 22])
    syn = synthesize_execution(
        registry, "token.aleo", "transfer", inputs, caller=123456789,
        rng_nonce=lambda: next(nonces),
    )
    assert syn.cs.is_satisfied()
    # same execution through the plain interpreter gives the same records
    nonces2 = iter([11, 22])
    tr = Interpreter(registry).execute(
        "token.aleo", "transfer", inputs, caller=123456789,
        rng_nonce=lambda: next(nonces2),
    )
    assert [r.commitment() for r in syn.transition.created_records] == [
        r.commitment() for r in tr.created_records
    ]
    # public inputs: tag + 3 input IDs + 2 output IDs
    assert len(syn.public_inputs) == 1 + 1 + 3 + 2
    # output IDs are the new records' commitments
    assert syn.public_inputs[-2:] == [r.commitment() for r in tr.created_records]
    assert syn.constraint_counts["total"] > 0


def test_tampered_public_input_unsatisfied(registry):
    rec = _mk_record(owner=5, amount=50)
    inputs = [rec, Value("address", 6), Value("u64", 20)]
    syn = synthesize_execution(
        registry, "token.aleo", "transfer", inputs, caller=5,
        rng_nonce=lambda: 3,
    )
    assert syn.cs.is_satisfied()
    # flipping an output commitment must break satisfaction
    syn.cs.assignments[len(syn.public_inputs) - 1] = (
        syn.cs.assignments[len(syn.public_inputs) - 1] + 1
    ) % R
    assert not syn.cs.is_satisfied()


def test_arith_ops_circuit(registry):
    inputs = [Value("u64", 100), Value("u64", 7)]
    syn = synthesize_execution(registry, "ops.aleo", "arith", inputs)
    assert syn.cs.is_satisfied()
    tr = syn.transition
    # lt false -> ternary picks mul
    assert tr.outputs[0].data == 700
    # tamper a witness: the range/consistency constraints must catch it
    syn.cs.assignments[len(syn.public_inputs) + 1] ^= 1
    assert not syn.cs.is_satisfied()


def test_underflow_halts(registry):
    rec = _mk_record(owner=1, amount=10)
    inputs = [rec, Value("address", 2), Value("u64", 20)]
    with pytest.raises(Exception):
        synthesize_execution(
            registry, "token.aleo", "transfer", inputs, caller=1,
            rng_nonce=lambda: 3,
        )
