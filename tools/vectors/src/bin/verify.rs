//! End-to-end bit-exactness oracle: verify candidate executions under the
//! UNMODIFIED snarkVM 0.14.5 verifier (SURVEY.md §7 step 1's `verify`
//! binary; the same entry the reference uses at
//! /root/reference/wasm/src/programs/manager/execute.rs:185 and wraps at
//! /root/reference/rust/src/program/helpers/offline.rs:71-78).
//!
//! Usage:
//!   verify <execution.json> [--program <main.aleo>]...
//!
//! The execution JSON is snarkVM's serde `Execution` format (what
//! `Transaction::from_execution` carries on the wire). Programs beyond the
//! built-in credits.aleo are added to the process before verification;
//! their verifying keys must already be embedded in the execution's
//! transitions' proofs via `process.verify_execution`'s key derivation
//! (deployment-synthesized keys are re-derived from the program source).
//!
//! Exit code 0 = the proof verifies bit-exactly under snarkVM; 1 = reject.
//! NOT BUILDABLE IN THE BUILD CONTAINER (no Rust toolchain / no crates.io
//! egress — see ../Cargo.toml); build on any normal machine.

use std::process::exit;

use snarkvm_console::network::Testnet3;
use snarkvm_console::program::ProgramID;
use snarkvm_synthesizer::{Execution, Process, Program};

type N = Testnet3;

fn main() {
    let mut args = std::env::args().skip(1);
    let exec_path = match args.next() {
        Some(p) => p,
        None => {
            eprintln!("usage: verify <execution.json> [--program <main.aleo>]...");
            exit(2);
        }
    };
    let mut programs: Vec<String> = vec![];
    while let Some(flag) = args.next() {
        match flag.as_str() {
            "--program" => programs.push(args.next().expect("--program needs a path")),
            other => {
                eprintln!("unknown argument {other}");
                exit(2);
            }
        }
    }

    let body = std::fs::read_to_string(&exec_path).expect("read execution file");
    let execution: Execution<N> =
        serde_json::from_str(&body).expect("parse snarkVM Execution JSON");

    let mut process = Process::load().expect("load process (credits.aleo)");
    for path in &programs {
        let src = std::fs::read_to_string(path).expect("read program source");
        let program: Program<N> = src.parse().expect("parse Aleo program");
        let id: ProgramID<N> = *program.id();
        process
            .add_program(&program)
            .unwrap_or_else(|e| panic!("add {id}: {e}"));
        // synthesize verifying keys for every function so verification can
        // resolve them (deployment-equivalent key derivation)
        for function_name in program.functions().keys() {
            process
                .synthesize_key::<snarkvm_circuit::AleoV0, _>(
                    &id,
                    function_name,
                    &mut rand::thread_rng(),
                )
                .unwrap_or_else(|e| panic!("synthesize {id}/{function_name}: {e}"));
        }
    }

    match process.verify_execution::<true>(&execution) {
        Ok(()) => {
            println!("OK: execution verifies under snarkVM 0.14.5");
        }
        Err(e) => {
            println!("REJECT: {e}");
            exit(1);
        }
    }
}
