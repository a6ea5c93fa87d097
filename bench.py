#!/usr/bin/env python
"""Headline benchmark on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: G1 MSM points/sec at 2^16 on the PRODUCTION path
(`msm_fast_host`, the exact routine every KZG commitment uses), tuned window
(auto_c). `vs_baseline` compares against the CPU anchor in BASELINE.md
(arkworks/snarkVM-class multicore CPU Pippenger for BLS12-377, ~5e5 pts/s;
the reference repo publishes no numbers).

Secondary metrics (stderr + BENCH_DETAIL json line on stderr):
  - NTT 2^16 and 2^20 butterflies/s (limbs-first core)
  - coset NTT 2^20 ms
  - simple_token transfer: Varuna prove seconds/proof + proofs/s
    (BASELINE.json config 3; keys/indexing excluded as deploy-time work)
"""

import json
import os
import random
import sys
import time

import jax

# Persistent compilation cache: Mosaic/XLA compiles of the fused group-law
# kernels cost minutes cold through the axon tunnel; cache them across runs.
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/aleo_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import jax.numpy as jnp

CPU_ANCHOR_MSM_PPS = 5.0e5  # see BASELINE.md: CPU anchor for 2^16 MSM

MSM_N = 1 << 16


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_msm(detail):
    from aleo_tpu import params
    from aleo_tpu.curves import g1
    from aleo_tpu.fields.modring import FR_RING, ints_to_limbs
    from aleo_tpu.msm import msm as msm_mod
    from aleo_tpu.reference.curve import G1

    rng = random.Random(0xBE7C)
    log("building MSM inputs...")
    base = G1.generator()
    host_pts = []
    cur = base
    for _ in range(64):
        host_pts.append(cur)
        cur = G1.add(cur, G1.add(cur, base))
    pts = g1.encode_points(host_pts * (MSM_N // len(host_pts)))
    scalars = jnp.asarray(
        ints_to_limbs([rng.randrange(params.R) for _ in range(MSM_N)], FR_RING.L)
    )
    table = msm_mod.make_table(pts)
    c = msm_mod.auto_c(MSM_N)

    log(f"compiling MSM (c={c})...")
    t0 = time.time()
    out = msm_mod.msm_fast_host(scalars, table, c=c)
    compile_s = time.time() - t0
    log(f"MSM compile+first run: {compile_s:.1f}s")
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        out = msm_mod.msm_fast_host(scalars, table, c=c)
    msm_s = (time.time() - t0) / iters
    msm_pps = MSM_N / msm_s
    log(f"MSM 2^16 (production path, c={c}): {msm_s*1e3:.1f} ms -> {msm_pps:,.0f} points/s")
    detail["msm_2e16_ms"] = round(msm_s * 1e3, 2)
    detail["msm_compile_s"] = round(compile_s, 1)
    return msm_pps


def bench_ntt(detail):
    from aleo_tpu import params
    from aleo_tpu.fields.modring import FR_RING
    from aleo_tpu.ntt import ntt as dntt
    import numpy as np

    rng = np.random.default_rng(0xA1E0)
    for logn in (16, 20):
        n = 1 << logn
        data = FR_RING.encode(
            [int.from_bytes(rng.bytes(31), "little") % params.R for _ in range(n)]
        )
        t0 = time.time()
        o = dntt.ntt(data)
        jax.block_until_ready(o)
        log(f"NTT 2^{logn} compile+first: {time.time()-t0:.1f}s")
        # chain iterations and force one full materialization at the end so
        # async-dispatch queues can't underreport (axon block_until_ready
        # returns before tunnel readback completes)
        iters = 10
        t0 = time.time()
        for _ in range(iters):
            o = dntt.ntt(o)
        np.asarray(o)
        dt = (time.time() - t0) / iters
        bf = n // 2 * logn
        log(f"NTT 2^{logn}: {dt*1e3:.2f} ms -> {bf/dt/1e6:,.1f} M butterflies/s")
        detail[f"ntt_2e{logn}_ms"] = round(dt * 1e3, 2)
        detail[f"ntt_2e{logn}_mbfly_s"] = round(bf / dt / 1e6, 1)
        if logn == 20:
            t0 = time.time()
            oc = dntt.coset_ntt(data, params.FR_GENERATOR)
            jax.block_until_ready(oc)
            t0 = time.time()
            for _ in range(iters):
                oc = dntt.coset_ntt(oc, params.FR_GENERATOR)
            np.asarray(oc)
            detail["coset_ntt_2e20_ms"] = round((time.time() - t0) / iters * 1e3, 2)
            log(f"coset NTT 2^20: {detail['coset_ntt_2e20_ms']} ms")


def bench_proof(detail):
    from aleo_tpu.program.examples import load_example
    from aleo_tpu.program.values import Record, Value
    from aleo_tpu.snark import pipeline

    log("synthesizing simple_token transfer keys (deploy-time)...")
    t0 = time.time()
    reg = load_example("simple_token")
    keys = pipeline.synthesize_keys(reg, "token.aleo", "transfer")
    log(f"keys: {time.time()-t0:.1f}s  n={keys.index.n} m={keys.index.m} "
        f"constraints={keys.constraint_counts['total']}")
    sender, receiver = 123456789, 987654321

    def mk_inputs(amount):
        rec = Record("token.aleo", "token", owner=sender, gates=0,
                     entries={"amount": Value("u64", 500)}, nonce=7)
        return [rec, Value("address", receiver), Value("u64", amount)]

    t0 = time.time()
    ep = pipeline.prove_execution(keys, reg, mk_inputs(120), caller=sender)
    first_s = time.time() - t0
    log(f"first proof (incl. compile): {first_s:.1f}s")
    ok = pipeline.verify_execution(keys, ep)
    log(f"verify: {ok}")
    if not ok:
        raise SystemExit("proof did not verify")
    iters = 2
    t0 = time.time()
    for i in range(iters):
        ep = pipeline.prove_execution(keys, reg, mk_inputs(100 + i), caller=sender)
    proof_s = (time.time() - t0) / iters
    log(f"simple_token transfer proof: {proof_s:.2f} s -> {1/proof_s:.3f} proofs/s")
    detail["transfer_proof_s"] = round(proof_s, 2)
    detail["transfer_proofs_per_s"] = round(1 / proof_s, 4)
    detail["transfer_constraints"] = keys.constraint_counts["total"]


class _SectionTimeout(Exception):
    pass


def _with_timeout(fn, seconds, *args):
    """Run a bench section under SIGALRM so a pathological compile cannot
    swallow the headline JSON (axon-tunnel Mosaic compiles have shown
    minutes-scale variance)."""
    import signal

    def handler(signum, frame):
        raise _SectionTimeout()

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    try:
        return fn(*args)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def main():
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    detail = {}
    msm_pps = bench_msm(detail)
    try:
        _with_timeout(bench_ntt, 600, detail)
    except Exception as e:  # secondary metrics must not kill the headline
        log(f"NTT bench failed: {e!r}")
    try:
        _with_timeout(bench_proof, 2400, detail)
    except Exception as e:
        log(f"proof bench failed: {e!r}")
    log("BENCH_DETAIL " + json.dumps(detail))
    print(
        json.dumps(
            {
                "metric": "msm_g1_2e16_points_per_sec",
                "value": round(msm_pps, 1),
                "unit": "points/s",
                "vs_baseline": round(msm_pps / CPU_ANCHOR_MSM_PPS, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
