"""Wide/signed integer gadgets: 128-bit mul, signed div/rem/shr, register
shifts, register-exponent pow — the round-3 verdict's synthesizer gaps.

Each op is checked three ways, mirroring the reference's semantics
(snarkVM console integers; Rust checked/wrapping arithmetic):
  1. satisfiability of the honest circuit,
  2. value agreement with the host interpreter,
  3. a tamper test (flipping the output witness breaks satisfaction).
"""

import pytest

from aleo_tpu import params
from aleo_tpu.program.parser import parse_program
from aleo_tpu.program.interpreter import ExecutionError, Registry
from aleo_tpu.program.synthesizer import SynthesisError, synthesize_execution
from aleo_tpu.program.values import Value

R = params.R

WIDE = """
program wide.aleo;

function mul128:
    input r0 as u128.private;
    input r1 as u128.private;
    mul r0 r1 into r2;
    mul.w r0 r1 into r3;
    output r2 as u128.private;
    output r3 as u128.private;

function smul128:
    input r0 as i128.private;
    input r1 as i128.private;
    mul r0 r1 into r2;
    mul.w r0 r1 into r3;
    output r2 as i128.private;
    output r3 as i128.private;

function sdiv:
    input r0 as i64.private;
    input r1 as i64.private;
    div r0 r1 into r2;
    rem r0 r1 into r3;
    output r2 as i64.private;
    output r3 as i64.private;

function sdiv128:
    input r0 as i128.private;
    input r1 as i128.private;
    div r0 r1 into r2;
    rem r0 r1 into r3;
    output r2 as i128.private;
    output r3 as i128.private;

function shifts:
    input r0 as i64.private;
    input r1 as u8.private;
    shr r0 3u8 into r2;
    shr r0 r1 into r3;
    shl.w r0 r1 into r4;
    output r2 as i64.private;
    output r3 as i64.private;
    output r4 as i64.private;

function shlchk:
    input r0 as u32.private;
    input r1 as u8.private;
    shl r0 r1 into r2;
    output r2 as u32.private;

function vpow:
    input r0 as u32.private;
    input r1 as u8.private;
    pow r0 r1 into r2;
    pow.w r0 r1 into r3;
    output r2 as u32.private;
    output r3 as u32.private;

function spow:
    input r0 as i16.private;
    input r1 as u8.private;
    pow r0 r1 into r2;
    output r2 as i16.private;
"""


@pytest.fixture
def reg():
    r = Registry()
    r.add(parse_program(WIDE))
    return r


def _run(reg, fn, inputs):
    syn = synthesize_execution(reg, "wide.aleo", fn, inputs)
    assert syn.cs.is_satisfied()
    return syn


def _tamper(syn):
    """Flipping the last witness assignment must break satisfaction."""
    idx = len(syn.cs.assignments) - 1
    syn.cs.assignments[idx] = (syn.cs.assignments[idx] + 1) % R
    assert not syn.cs.is_satisfied()


def test_u128_mul_checked_and_wrapped(reg):
    a, b = (1 << 100) + 12345, 37
    syn = _run(reg, "mul128", [Value("u128", a), Value("u128", b)])
    assert syn.transition.outputs[0].data == a * b
    assert syn.transition.outputs[1].data == (a * b) % (1 << 128)
    _tamper(syn)
    # checked overflow halts (mirrors snarkVM's halt on overflow)
    with pytest.raises((SynthesisError, ExecutionError)):
        synthesize_execution(
            reg, "wide.aleo", "mul128",
            [Value("u128", 1 << 100), Value("u128", 1 << 100)],
        )


def test_u128_wrap_crosses_128_bits(reg):
    a = (1 << 127) | 0xDEADBEEF
    b = (1 << 90) + 991
    # force wrap-only function by picking values whose checked mul overflows
    with pytest.raises((SynthesisError, ExecutionError)):
        synthesize_execution(
            reg, "wide.aleo", "mul128", [Value("u128", a), Value("u128", b)]
        )


def test_i128_mul(reg):
    a, b = -(1 << 90) - 7, (1 << 30) + 3
    syn = _run(reg, "smul128", [Value("i128", a), Value("i128", b)])
    assert syn.transition.outputs[0].data == a * b
    enc = (a * b) % (1 << 128)
    want_wrap = enc - (1 << 128) if enc >= (1 << 127) else enc
    assert syn.transition.outputs[1].data == want_wrap
    _tamper(syn)


def test_signed_div_rem(reg):
    cases = [(-7, 2), (7, -2), (-7, -2), (100, 9), (-100, -9)]
    for x, y in cases:
        syn = _run(reg, "sdiv", [Value("i64", x), Value("i64", y)])
        q = abs(x) // abs(y)
        q = -q if (x < 0) != (y < 0) else q
        assert syn.transition.outputs[0].data == q, (x, y)
        assert syn.transition.outputs[1].data == x - y * q, (x, y)
    _tamper(syn)
    with pytest.raises((SynthesisError, ExecutionError)):
        synthesize_execution(
            reg, "wide.aleo", "sdiv", [Value("i64", 5), Value("i64", 0)]
        )


def test_signed_div_128(reg):
    x, y = -(1 << 120) - 12345, (1 << 60) + 7
    syn = _run(reg, "sdiv128", [Value("i128", x), Value("i128", y)])
    q = -(abs(x) // abs(y))
    assert syn.transition.outputs[0].data == q
    assert syn.transition.outputs[1].data == x - y * q
    _tamper(syn)


def test_signed_shr_and_register_shifts(reg):
    x = -123456789
    syn = _run(reg, "shifts", [Value("i64", x), Value("u8", 5)])
    assert syn.transition.outputs[0].data == x >> 3       # literal signed shr
    assert syn.transition.outputs[1].data == x >> 5       # register signed shr
    enc = (x << 5) % (1 << 64)
    want = enc - (1 << 64) if enc >= (1 << 63) else enc
    assert syn.transition.outputs[2].data == want         # register shl.w
    _tamper(syn)
    # checked shift by >= width halts
    with pytest.raises((SynthesisError, ExecutionError)):
        synthesize_execution(
            reg, "wide.aleo", "shifts", [Value("i64", 1), Value("u8", 64)]
        )


def test_register_shl_checked(reg):
    syn = _run(reg, "shlchk", [Value("u32", 123), Value("u8", 10)])
    assert syn.transition.outputs[0].data == 123 << 10
    _tamper(syn)
    with pytest.raises((SynthesisError, ExecutionError)):
        synthesize_execution(
            reg, "wide.aleo", "shlchk", [Value("u32", 1 << 30), Value("u8", 5)]
        )


def test_register_pow(reg):
    syn = _run(reg, "vpow", [Value("u32", 7), Value("u8", 9)])
    assert syn.transition.outputs[0].data == 7**9
    assert syn.transition.outputs[1].data == (7**9) % (1 << 32)
    _tamper(syn)
    # checked pow overflow halts; wrapped result still defined
    with pytest.raises((SynthesisError, ExecutionError)):
        synthesize_execution(
            reg, "wide.aleo", "vpow", [Value("u32", 1000), Value("u8", 20)]
        )


def test_register_pow_zero_exponent(reg):
    syn = _run(reg, "vpow", [Value("u32", 12345), Value("u8", 0)])
    assert syn.transition.outputs[0].data == 1
    assert syn.transition.outputs[1].data == 1


def test_signed_pow(reg):
    syn = _run(reg, "spow", [Value("i16", -3), Value("u8", 5)])
    assert syn.transition.outputs[0].data == (-3) ** 5
    _tamper(syn)
    syn = _run(reg, "spow", [Value("i16", -2), Value("u8", 14)])
    assert syn.transition.outputs[0].data == 16384
