"""Execution proving pipeline: Aleo program function -> keys -> proof.

This is the layer that connects the circuit synthesizer (`program/synthesizer.py`)
to the Marlin indexer/prover/verifier (`snark/`), mirroring the reference's
two flows:

  * key synthesis at deployment: snarkVM synthesizes a ProvingKey/VerifyingKey
    per function from the circuit *structure* (burner inputs), see
    `/root/reference/wasm/src/programs/manager/deploy.rs:93-94` and
    `manager/mod.rs:164-177` (`synthesizeKeypair`);
  * proving at execution: synthesize the circuit with the real inputs and run
    the Varuna prover over the indexed matrices, see
    `/root/reference/wasm/src/programs/manager/execute.rs:157-169`
    (`execute_program!` -> `trace.prove_execution`).

The circuit structure (constraint rows and coefficients) for a fixed function
signature is input-independent, so an `Index` built from burner inputs proves
any concrete execution of that function; `tests/test_e2e_program_proof.py`
asserts this by proving with keys synthesized from different inputs.
"""

from __future__ import annotations

import hashlib
import os
import pickle

from dataclasses import dataclass
from typing import Dict, List, Optional

from .. import params
from ..program.interpreter import Registry, Transition
from ..program.parser import Program
from ..program.synthesizer import Synthesis, synthesize_execution
from ..program.values import Record, Value
from .indexer import Index, index_r1cs
from .prover import Proof, prove
from .verifier import VerifyingKey, verify

R = params.R

INT_DEFAULTS = {
    "u8": 0, "u16": 0, "u32": 0, "u64": 0, "u128": 0,
    "i8": 0, "i16": 0, "i32": 0, "i64": 0, "i128": 0,
}


def burner_inputs(prog: Program, function: str) -> List:
    """Structure-only inputs for key synthesis (snarkVM's burner inputs).

    Values are arbitrary; only the type shapes matter for the circuit.
    """
    fn = prog.functions[function]
    out = []
    for decl in fn.inputs:
        out.append(_burner_value(prog, decl.type_, decl.visibility))
    return out


def _burner_value(prog: Program, type_: str, vis: str):
    if vis == "record" or type_ in prog.records:
        rt = prog.records[type_.split(".")[-1] if "." in type_ else type_]
        entries = {}
        for (name, base, _v) in rt.fields:
            if name in ("owner", "gates"):
                continue
            entries[name] = _burner_value(prog, base, "private")
        return Record(prog.id, rt.name, owner=1, gates=0, entries=entries, nonce=1)
    if type_ in prog.structs:
        st = prog.structs[type_]
        return Value(type_, {n: _burner_value(prog, t, "private") for n, t in st.fields})
    if type_ == "boolean":
        return Value("boolean", False)
    if type_ in INT_DEFAULTS:
        return Value(type_, 0)
    # field / group / scalar / address
    return Value(type_, 1)


@dataclass
class FunctionKeys:
    """Per-function proving/verifying key pair (snarkVM ProvingKey/VerifyingKey
    twin, `/root/reference/wasm/src/programs/proving_key.rs:34-42`)."""

    program_id: str
    function: str
    index: Index            # proving key: committed index polys + spmv tables
    vk: VerifyingKey
    constraint_counts: Dict[str, int]


@dataclass
class ExecutionProof:
    """A proven transition (the payload of `OfflineExecution`,
    `/root/reference/rust/src/program/helpers/offline.rs:21-26`)."""

    program_id: str
    function: str
    public_inputs: List[int]
    proof: Proof
    transition: Transition


from ..config import KEY_DIR as _KEY_CACHE_DIR

# Bump when circuit semantics change (synthesizer gadgets, Poseidon
# parameterization, variable layout): part of the key-cache digest.
CIRCUIT_FORMAT_VERSION = "r5-arkworks-poseidon-1"


def synthesize_keys(
    registry: Registry,
    program_id: str,
    function: str,
    srs=None,
    inputs: Optional[List] = None,
    cache: bool = True,
) -> FunctionKeys:
    """Deploy-time key synthesis for one function (`Process::synthesize_key`).

    Results are cached on disk per (program source, function) — the role of
    the reference's proving-key files and wasm key cache
    (`/root/reference/wasm/src/programs/manager/mod.rs:97-131`,
    `website/src/workers/keys.js`). Pass cache=False for a fresh synthesis.
    """
    prog = registry.get(program_id)
    cache_path = None
    if cache and srs is None:
        # the digest must pin everything the circuit shape depends on:
        # program source, function, AND the synthesizer/hash parameterization
        # (CIRCUIT_FORMAT_VERSION bumps when gadget semantics change — e.g.
        # the r5 arkworks-exact Poseidon — so stale key caches can never
        # collide with a new circuit layout)
        digest = hashlib.sha256(
            (prog.source + "\x00" + function + "\x00" + CIRCUIT_FORMAT_VERSION)
            .encode()
        ).hexdigest()[:20]
        cache_path = os.path.join(_KEY_CACHE_DIR, f"{prog.name}_{function}_{digest}.pkl")
        if os.path.exists(cache_path):
            try:
                return _load_keys(cache_path)
            except Exception:
                pass  # stale/corrupt cache: resynthesize
    if inputs is None:
        inputs = burner_inputs(prog, function)
    syn = synthesize_execution(
        registry, program_id, function, inputs, caller=1, rng_nonce=lambda: 1
    )
    index = index_r1cs(syn.cs, srs=srs)
    keys = FunctionKeys(
        program_id, function, index, VerifyingKey.from_index(index),
        syn.constraint_counts,
    )
    if cache_path is not None:
        try:
            _save_keys(keys, cache_path)
        except Exception:
            pass
    return keys


def _save_keys(keys: FunctionKeys, path: str) -> None:
    import numpy as np

    os.makedirs(_KEY_CACHE_DIR, exist_ok=True)
    idx = keys.index

    def tab(t):
        return {
            "vals": np.asarray(t.vals), "gather_idx": np.asarray(t.gather_idx),
            "flags": np.asarray(t.flags), "ends": np.asarray(t.ends),
            "out_idx": np.asarray(t.out_idx), "out_size": t.out_size,
        }

    blob = {
        "program_id": keys.program_id, "function": keys.function,
        "counts": keys.constraint_counts,
        "n": idx.n, "m": idx.m, "ell": idx.ell, "num_inputs": idx.num_inputs,
        "var_pos": np.asarray(idx.var_pos),
        "srs_max_degree": idx.srs.max_degree,
        "matrices": [
            {
                "name": mi.name,
                **{
                    f"{p}_poly": np.asarray(getattr(mi, f"{p}_poly"))
                    for p in ("row", "col", "cval", "rcp")
                },
                **{
                    f"{p}_evals": np.asarray(getattr(mi, f"{p}_evals"))
                    for p in ("row", "col", "cval", "rcp")
                },
                "commitments": mi.commitments,
                "by_row": tab(mi.by_row), "by_col": tab(mi.by_col),
            }
            for mi in idx.matrices
        ],
    }
    with open(path, "wb") as f:
        pickle.dump(blob, f)


def _load_keys(path: str) -> FunctionKeys:
    import jax.numpy as jnp

    from ..pcs.srs import Srs
    from ..snark.indexer import MatrixIndex
    from ..snark.sparse import SparseTables

    with open(path, "rb") as f:
        blob = pickle.load(f)
    srs = Srs.load_or_generate(blob["srs_max_degree"])

    def tab(d):
        return SparseTables(
            vals=jnp.asarray(d["vals"]), gather_idx=jnp.asarray(d["gather_idx"]),
            flags=jnp.asarray(d["flags"]), ends=jnp.asarray(d["ends"]),
            out_idx=jnp.asarray(d["out_idx"]), out_size=d["out_size"],
        )

    matrices = [
        MatrixIndex(
            md["name"],
            *[jnp.asarray(md[f"{p}_poly"]) for p in ("row", "col", "cval", "rcp")],
            *[jnp.asarray(md[f"{p}_evals"]) for p in ("row", "col", "cval", "rcp")],
            md["commitments"], tab(md["by_row"]), tab(md["by_col"]),
        )
        for md in blob["matrices"]
    ]
    index = Index(
        srs, blob["n"], blob["m"], blob["ell"], blob["num_inputs"],
        blob["var_pos"], matrices,
    )
    return FunctionKeys(
        blob["program_id"], blob["function"], index,
        VerifyingKey.from_index(index), blob["counts"],
    )


def deploy_keys(registry: Registry, program_id: str, srs=None) -> Dict[str, FunctionKeys]:
    """Key synthesis for every function of a program — the `vm.deploy`
    hot loop (`/root/reference/rust/src/program/deploy.rs:126-143`)."""
    prog = registry.get(program_id)
    return {
        fname: synthesize_keys(registry, program_id, fname, srs=srs)
        for fname in prog.functions
    }


def synthesize_and_check(keys: FunctionKeys, registry: Registry, inputs,
                         caller: int = 0, rng_nonce=None) -> Synthesis:
    syn = synthesize_execution(
        registry, keys.program_id, keys.function, inputs,
        caller=caller, rng_nonce=rng_nonce,
    )
    cs = syn.cs
    idx = keys.index
    ell = 1 << max(0, (cs.num_inputs - 1).bit_length())
    if ell != keys.vk.ell:
        raise ValueError(
            f"circuit shape drift: {cs.num_inputs} public inputs vs key ell={keys.vk.ell}"
        )
    n = 1 << max(
        0,
        (max(cs.num_constraints, cs.num_variables + (ell - cs.num_inputs), 2) - 1)
        .bit_length(),
    )
    if n != idx.n:
        raise ValueError(f"circuit shape drift: |H|={n} vs key n={idx.n}")
    return syn


def prove_execution(
    keys: FunctionKeys,
    registry: Registry,
    inputs: List,
    caller: int = 0,
    rng_nonce=None,
) -> ExecutionProof:
    """Synthesize the concrete circuit and prove it under the function keys —
    the `Trace::prove_execution` stage (SURVEY.md §3.1, HOTTEST)."""
    syn = synthesize_and_check(keys, registry, inputs, caller, rng_nonce)
    proof = prove(keys.index, syn.cs)
    return ExecutionProof(
        keys.program_id, keys.function, syn.public_inputs, proof, syn.transition
    )


def verify_execution(keys_or_vk, ep: ExecutionProof, debug: bool = False) -> bool:
    """Verify a proven transition (`Trace::verify_execution_proof` twin).

    debug=True names the failed verifier check on stdout (snark/verifier.py)."""
    vk = keys_or_vk.vk if isinstance(keys_or_vk, FunctionKeys) else keys_or_vk
    return verify(vk, ep.public_inputs, ep.proof, debug=debug)
