//! Golden-vector dumper against the pinned snarkVM 0.14.5 (the bit-exactness
//! oracle of SURVEY.md §7 step 1). Emits JSON consumed by
//! `tests/test_snarkvm_vectors.py`:
//!
//!   fq_ops.json      — random (a, b, a+b, a*b, a^-1, sqrt(a)) over Fq
//!   fr_ops.json      — same over Fr
//!   poseidon.json    — psd2/4/8 digests of the test inputs under each rate
//!   ntt.json         — 2^k coefficient/evaluation pairs (incl. one coset)
//!   msm.json         — scalar/point/result sets at 2^10 and 2^12
//!
//! Deterministic: seeded ChaCha20 (the reference bench convention,
//! /root/reference/rust/benches/account.rs:30-50).
//!
//! Build on any Rust-equipped machine (no toolchain in the build container,
//! see Cargo.toml header): `cargo run --release -- out/`, then copy the
//! JSON files into tests/vectors/.

use rand::SeedableRng;
use rand_chacha::ChaCha20Rng;
use serde_json::json;
use snarkvm_console::network::Testnet3;
use snarkvm_console::prelude::*;
use snarkvm_curves::bls12_377::{Fq, Fr, G1Affine, G1Projective};
use snarkvm_curves::{AffineCurve, ProjectiveCurve};
use snarkvm_fields::{Field as FieldTrait, PrimeField, SquareRootField};
use snarkvm_algorithms::fft::{DensePolynomial, EvaluationDomain};
use snarkvm_algorithms::msm::VariableBase;
use snarkvm_utilities::{TestRng, Uniform};

type N = Testnet3;

fn main() {
    let out = std::env::args().nth(1).unwrap_or_else(|| "out".into());
    std::fs::create_dir_all(&out).unwrap();
    let mut rng = ChaCha20Rng::seed_from_u64(0xA1E0_7E57);

    // ---- Fr field ops ------------------------------------------------------
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

    // ---- Fq field ops (the G1 base field; decimal strings) -----------------
    let mut fq_rows = vec![];
    for _ in 0..256 {
        let a = Fq::rand(&mut rng);
        let b = Fq::rand(&mut rng);
        fq_rows.push(json!({
            "a": fq_str(&a), "b": fq_str(&b),
            "add": fq_str(&(a + b)), "mul": fq_str(&(a * b)),
            "inv": a.inverse().map(|v| fq_str(&v)),
            "sqrt": a.sqrt().map(|v| fq_str(&v)),
        }));
    }
    std::fs::write(
        format!("{out}/fq_ops.json"),
        serde_json::to_string_pretty(&fq_rows).unwrap(),
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

    // ---- NTT (radix-2 FFT over Fr, incl. one coset) ------------------------
    let mut ntt_cases = vec![];
    for logn in [4usize, 8, 10] {
        let n = 1usize << logn;
        let coeffs: Vec<Fr> = (0..n).map(|_| Fr::rand(&mut rng)).collect();
        let domain = EvaluationDomain::<Fr>::new(n).unwrap();
        let evals = domain.fft(&coeffs);
        let poly = DensePolynomial::from_coefficients_vec(coeffs.clone());
        let coset_evals = domain
            .get_coset(Fr::multiplicative_generator())
            .unwrap()
            .fft(&poly.coeffs);
        ntt_cases.push(json!({
            "n": n,
            "root_of_unity": fr_str(&domain.group_gen),
            "coset_shift": fr_str(&Fr::multiplicative_generator()),
            "coeffs": coeffs.iter().map(fr_str).collect::<Vec<_>>(),
            "evals": evals.iter().map(fr_str).collect::<Vec<_>>(),
            "coset_evals": coset_evals.iter().map(fr_str).collect::<Vec<_>>(),
        }));
    }
    std::fs::write(
        format!("{out}/ntt.json"),
        serde_json::to_string_pretty(&ntt_cases).unwrap(),
    )
    .unwrap();

    // ---- MSM ---------------------------------------------------------------
    let mut test_rng = TestRng::fixed(0xA1E0_7E57);
    let mut msm_cases = vec![];
    for logn in [10usize, 12] {
        let n = 1usize << logn;
        let bases: Vec<G1Affine> = (0..n)
            .map(|_| G1Projective::rand(&mut test_rng).to_affine())
            .collect();
        let scalars: Vec<<Fr as PrimeField>::BigInteger> =
            (0..n).map(|_| Fr::rand(&mut test_rng).to_bigint()).collect();
        let result = VariableBase::msm(&bases, &scalars).to_affine();
        msm_cases.push(json!({
            "n": n,
            "bases": bases
                .iter()
                .map(|p| json!([fq_str(&p.x), fq_str(&p.y)]))
                .collect::<Vec<_>>(),
            "scalars": scalars
                .iter()
                .map(|s| Fr::from_bigint(*s).unwrap())
                .map(|s| fr_str(&s))
                .collect::<Vec<_>>(),
            "result": json!([fq_str(&result.x), fq_str(&result.y)]),
        }));
    }
    std::fs::write(
        format!("{out}/msm.json"),
        serde_json::to_string_pretty(&msm_cases).unwrap(),
    )
    .unwrap();

    eprintln!("vectors written to {out}/ — copy into tests/vectors/");
}

/// Decimal string of an Fq element (canonical integer representative).
fn fq_str(v: &Fq) -> String {
    v.to_bigint().to_string()
}

/// Decimal string of an Fr element.
fn fr_str(v: &Fr) -> String {
    v.to_bigint().to_string()
}
