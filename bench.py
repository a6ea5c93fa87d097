#!/usr/bin/env python
"""Headline benchmark: MSM + NTT throughput on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: G1 MSM points/sec at 2^16 (BASELINE.json config 2 — the
dominant kernel of the Varuna prover; every KZG commitment is one MSM).
`vs_baseline` compares against the CPU anchor recorded in BASELINE.md
(arkworks/snarkVM-class multicore CPU Pippenger for BLS12-377, ~5e5
points/s; the reference repo publishes no numbers — see BASELINE.md §notes).

Runs on whatever backend the ambient environment provides (the driver pins
JAX_PLATFORMS=axon -> one real TPU v5e chip). Also measures NTT 2^16
butterflies/s and Poseidon hashes/s as secondary metrics (stderr).
"""

import json
import random
import sys
import time

import jax
import jax.numpy as jnp

CPU_ANCHOR_MSM_PPS = 5.0e5  # see BASELINE.md: CPU anchor for 2^16 MSM

MSM_N = 1 << 16
NTT_N = 1 << 16
MSM_WINDOW = 8


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    from aleo_tpu import params
    from aleo_tpu.curves import g1
    from aleo_tpu.fields.modring import FR_RING, ints_to_limbs
    from aleo_tpu.msm import msm as msm_mod
    from aleo_tpu.ntt import ntt as dntt
    from aleo_tpu.reference.curve import G1

    rng = random.Random(0xBE7C)

    # ---- MSM 2^16 -----------------------------------------------------------
    # Base points: random multiples of G computed cheaply as doublings chain
    # (content does not affect throughput; correctness is covered in tests/).
    log("building MSM inputs...")
    base = G1.generator()
    host_pts = []
    cur = base
    for _ in range(64):
        host_pts.append(cur)
        cur = G1.add(cur, G1.add(cur, base))
    reps = MSM_N // len(host_pts)
    pts_host = host_pts * reps
    pts = g1.encode_points(pts_host)
    scalars = jnp.asarray(
        ints_to_limbs([rng.randrange(params.R) for _ in range(MSM_N)], FR_RING.L)
    )

    log("compiling MSM...")
    t0 = time.time()
    out = msm_mod.msm(scalars, pts, c=MSM_WINDOW)
    jax.block_until_ready(out)
    log(f"MSM compile+first run: {time.time()-t0:.1f}s")
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        out = msm_mod.msm(scalars, pts, c=MSM_WINDOW)
    jax.block_until_ready(out)
    msm_s = (time.time() - t0) / iters
    msm_pps = MSM_N / msm_s
    log(f"MSM 2^16: {msm_s*1e3:.1f} ms -> {msm_pps:,.0f} points/s")

    # ---- NTT 2^16 -----------------------------------------------------------
    data = FR_RING.encode([rng.randrange(params.R) for _ in range(NTT_N)])
    t0 = time.time()
    o = dntt.ntt(data)
    jax.block_until_ready(o)
    log(f"NTT compile+first run: {time.time()-t0:.1f}s")
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        o = dntt.ntt(o)
    jax.block_until_ready(o)
    ntt_s = (time.time() - t0) / iters
    butterflies = NTT_N // 2 * (NTT_N.bit_length() - 1)
    log(f"NTT 2^16: {ntt_s*1e3:.2f} ms -> {butterflies/ntt_s:,.0f} butterflies/s")

    # ---- headline -----------------------------------------------------------
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
