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
