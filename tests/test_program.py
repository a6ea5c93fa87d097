"""Parser + interpreter over the reference example programs' semantics."""

import pathlib

import pytest

from aleo_tpu.program.interpreter import (
    ExecutionError,
    Interpreter,
    MappingStore,
    Registry,
    run_finalize,
)
from aleo_tpu.program.parser import parse_program
from aleo_tpu.program.values import Record, Value

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

PUBLIC_TOKEN = """
program pub.aleo;

mapping account:
    key owner as address.public;
    value amount as u64.public;

function mint_public:
    input r0 as address.public;
    input r1 as u64.public;
    finalize r0 r1;

finalize mint_public:
    input r0 as address.public;
    input r1 as u64.public;
    get.or_init account[r0] 0u64 into r2;
    add r2 r1 into r3;
    set r3 into account[r0];

function transfer_public:
    input r0 as address.public;
    input r1 as u64.public;
    finalize self.caller r0 r1;

finalize transfer_public:
    input r0 as address.public;
    input r1 as address.public;
    input r2 as u64.public;
    get.or_init account[r0] 0u64 into r3;
    sub r3 r2 into r4;
    set r4 into account[r0];
    get.or_init account[r1] 0u64 into r5;
    add r5 r2 into r6;
    set r6 into account[r1];
"""


def _setup(src):
    prog = parse_program(src)
    reg = Registry()
    reg.add(prog)
    return prog, Interpreter(reg)


def test_parse_simple_token():
    prog = parse_program(SIMPLE_TOKEN)
    assert prog.id == "token.aleo"
    assert set(prog.functions) == {"mint", "transfer"}
    assert prog.records["token"].fields[0] == ("owner", "address", "private")
    assert len(prog.functions["transfer"].instructions) == 3
    assert len(prog.functions["transfer"].outputs) == 2


def test_parse_reference_examples():
    base = pathlib.Path("/root/reference/examples")
    for name in ("simple_token", "token", "external_call"):
        src = (base / name / "main.aleo").read_text()
        prog = parse_program(src)
        assert prog.functions, name


def test_mint_and_transfer():
    prog, interp = _setup(SIMPLE_TOKEN)
    alice, bob = 1111, 2222
    t = interp.execute("token.aleo", "mint", [Value("address", alice), Value("u64", 100)])
    rec = t.outputs[0]
    assert isinstance(rec, Record)
    assert rec.owner == alice and rec.entries["amount"].data == 100

    t2 = interp.execute(
        "token.aleo", "transfer", [rec, Value("address", bob), Value("u64", 30)], caller=alice
    )
    out_bob, out_alice = t2.outputs
    assert out_bob.owner == bob and out_bob.entries["amount"].data == 30
    assert out_alice.owner == alice and out_alice.entries["amount"].data == 70
    assert t2.consumed_records == [rec]
    # commitments and serial numbers well-formed
    assert 0 < rec.commitment() < (1 << 253)
    assert rec.serial_number(12345) != rec.serial_number(54321)


def test_transfer_underflow_fails():
    prog, interp = _setup(SIMPLE_TOKEN)
    t = interp.execute("token.aleo", "mint", [Value("address", 1), Value("u64", 10)])
    with pytest.raises(ExecutionError):
        interp.execute(
            "token.aleo", "transfer", [t.outputs[0], Value("address", 2), Value("u64", 11)]
        )


def test_finalize_mappings():
    prog, interp = _setup(PUBLIC_TOKEN)
    store = MappingStore()
    alice, bob = 7, 8
    t = interp.execute("pub.aleo", "mint_public", [Value("address", alice), Value("u64", 50)])
    run_finalize(prog, "mint_public", t.finalize_args, store)
    assert store.get("pub.aleo", "account", alice).data == 50

    t2 = interp.execute(
        "pub.aleo", "transfer_public", [Value("address", bob), Value("u64", 20)], caller=alice
    )
    run_finalize(prog, "transfer_public", t2.finalize_args, store)
    assert store.get("pub.aleo", "account", alice).data == 30
    assert store.get("pub.aleo", "account", bob).data == 20

    # underflow reverts atomically
    t3 = interp.execute(
        "pub.aleo", "transfer_public", [Value("address", bob), Value("u64", 999)], caller=alice
    )
    with pytest.raises(ExecutionError):
        run_finalize(prog, "transfer_public", t3.finalize_args, store)
    assert store.get("pub.aleo", "account", alice).data == 30
