"""snarkVM golden-vector checks (auto-skipped until vectors exist).

`tools/vectors` (Rust, pinned snarkvm = "=0.14.5") dumps JSON fixtures on a
machine with a Rust toolchain + crates.io access — neither exists in this
build container (documented in BASELINE.md). Drop its output into
`tests/vectors/` and these tests flip the field-op and Poseidon checks from
self-consistent to snarkVM-checked (BASELINE config 1).
"""

import json
import os

import pytest

VEC_DIR = os.path.join(os.path.dirname(__file__), "vectors")


def _load(name):
    path = os.path.join(VEC_DIR, name)
    if not os.path.exists(path):
        pytest.skip(
            f"{name} not present — build tools/vectors on a machine with a "
            "Rust toolchain (see BASELINE.md)"
        )
    with open(path) as f:
        return json.load(f)


def _parse(s):
    # snarkVM Display for Field is "<decimal>field"
    return int(str(s).replace("field", ""))


def test_fr_ops_match_snarkvm():
    from aleo_tpu import params

    rows = _load("fr_ops.json")
    R = params.R
    for row in rows:
        a, b = _parse(row["a"]), _parse(row["b"])
        assert (a + b) % R == _parse(row["add"])
        assert (a * b) % R == _parse(row["mul"])
        if row.get("inv"):
            assert pow(a, -1, R) == _parse(row["inv"])


def test_poseidon_digests_match_snarkvm():
    from aleo_tpu.reference import poseidon

    rows = _load("poseidon.json")
    for row in rows:
        inputs = [_parse(v) for v in row["inputs"]]
        got = poseidon.hash_psd(2, inputs, domain="snarkvm/psd2")
        assert got == _parse(row["psd2"]), (
            "Poseidon constants differ from snarkVM's — load dumped ark/MDS "
            "through PoseidonParams.from_constants (reference/poseidon.py)"
        )


def test_fq_ops_match_snarkvm():
    from aleo_tpu import params

    rows = _load("fq_ops.json")
    Q = params.Q
    for row in rows:
        a, b = _parse(row["a"]), _parse(row["b"])
        assert (a + b) % Q == _parse(row["add"])
        assert (a * b) % Q == _parse(row["mul"])
        if row.get("inv"):
            assert pow(a, -1, Q) == _parse(row["inv"])
        if row.get("sqrt"):
            s = _parse(row["sqrt"])
            assert s * s % Q == a % Q


def test_ntt_matches_snarkvm():
    """Device NTT (both the VPU butterfly path and MatNTT via the public
    dispatch) against snarkvm-algorithms fft outputs."""
    import jax.numpy as jnp

    from aleo_tpu import params
    from aleo_tpu.fields import fr_lf as lf
    from aleo_tpu.ntt import ntt as dntt

    cases = _load("ntt.json")
    for case in cases:
        n = case["n"]
        coeffs = [_parse(v) for v in case["coeffs"]]
        x = lf.encode(coeffs)
        got = [int(v) for v in lf.decode(dntt.ntt_lf(x))]
        want = [_parse(v) for v in case["evals"]]
        # snarkVM's domain generator may be a different primitive n-th root
        # than ours; evaluation SETS over the subgroup must agree, and with
        # the same generator the orders agree too.
        if _parse(case["root_of_unity"]) == dntt.domain(n).w:
            assert got == want, f"NTT mismatch at n={n}"
        else:
            assert sorted(got) == sorted(want), f"NTT value-set mismatch n={n}"
        shift = _parse(case["coset_shift"])
        gotc = [int(v) for v in lf.decode(dntt.coset_ntt_lf(x, shift))]
        wantc = [_parse(v) for v in case["coset_evals"]]
        if _parse(case["root_of_unity"]) == dntt.domain(n).w:
            assert gotc == wantc
        else:
            assert sorted(gotc) == sorted(wantc)


def test_msm_matches_snarkvm():
    from aleo_tpu.reference.msm import msm_pippenger_jac

    cases = _load("msm.json")
    for case in cases:
        bases = [(int(x), int(y)) for x, y in case["bases"]]
        scalars = [_parse(s) for s in case["scalars"]]
        rx, ry = (int(v) for v in case["result"])
        got = msm_pippenger_jac(scalars, bases, c=8)
        assert got == (rx, ry), f"MSM mismatch at n={case['n']}"
