"""Microbench the new Pippenger MSM at 2^16 on the real chip."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import random

from aleo_tpu import params
from aleo_tpu.curves import g1
from aleo_tpu.fields.modring import FR_RING, ints_to_limbs
from aleo_tpu.msm import msm as mm
from aleo_tpu.reference.curve import G1

print("backend:", jax.default_backend(), file=sys.stderr)
rng = random.Random(0xBE7C)
N = 1 << 16
base = G1.generator()
host_pts = []
cur = base
for _ in range(64):
    host_pts.append(cur)
    cur = G1.add(cur, G1.add(cur, base))
pts = g1.encode_points(host_pts * (N // 64))
table = mm.make_table(pts)
scalars = jnp.asarray(ints_to_limbs([rng.randrange(params.R) for _ in range(N)], FR_RING.L))

for c in [12, 13, 14]:
    t0 = time.time()
    w = mm.msm_windows(scalars, table, c=c)
    jax.block_until_ready(w)
    print(f"c={c} compile+run {time.time()-t0:.1f}s", file=sys.stderr)
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        w = mm.msm_windows(scalars, table, c=c)
    jax.block_until_ready(w)
    dt = (time.time() - t0) / iters
    t0 = time.time()
    res = mm.combine_windows_host(w, c)
    host_t = time.time() - t0
    print(f"c={c}: windows {dt*1e3:.2f} ms -> {N/dt:,.0f} pts/s; host combine {host_t*1e3:.1f} ms; total {(dt+host_t)*1e3:.2f} ms -> {N/(dt+host_t):,.0f} pts/s", file=sys.stderr)
