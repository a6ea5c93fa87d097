"""Component-level MSM profile on the real chip (round-4 lever analysis).

Times, with dependent chaining + scalar readback (tunnel-safe methodology):
  * one fused add_sel round at the bucket-lane width (the round primitive),
  * the gather of point rows from the table,
  * the global sort,
  * the full msm_windows pipeline,
to locate where the 2^16 MSM's wall-clock actually goes.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import os
import jax, jax.numpy as jnp
import numpy as np
import random

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/aleo_tpu_xla"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from aleo_tpu import params
from aleo_tpu.curves import g1, g1_fused as gf
from aleo_tpu.fields.modring import FR_RING, ints_to_limbs
from aleo_tpu.msm import msm as mm
from aleo_tpu.reference.curve import G1

def log(m):
    print(m, file=sys.stderr, flush=True)

log(f"backend: {jax.default_backend()}")
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

C = 13
W = mm._nwin(C)
LANES = W * (1 << (C - 1))
log(f"c={C} windows={W} lanes={LANES}")

# 1. add_sel round cost at lane width, chained
acc0 = gf.identity_lf(LANES)
ptx = jnp.tile(pts.x.T, (1, (LANES + N - 1)//N))[:, :LANES]
pty = jnp.tile(pts.y.T, (1, (LANES + N - 1)//N))[:, :LANES]
sign = jnp.zeros((LANES,), jnp.uint32)
valid = jnp.ones((LANES,), jnp.uint32)
ITERS = 10
@jax.jit
def chain_add(ax, ay, az):
    def body(i, s):
        a = gf.add_sel_lf(gf.G1LF(*s), ptx, pty, sign, valid)
        return (a.x, a.y, a.z)
    o = jax.lax.fori_loop(0, ITERS, body, (ax, ay, az))
    return jnp.sum(o[0])
t0=time.time(); float(chain_add(acc0.x, acc0.y, acc0.z)); log(f"add_sel compile {time.time()-t0:.1f}s")
t0=time.time(); float(chain_add(acc0.x, acc0.y, acc0.z)); dt=(time.time()-t0)/ITERS
log(f"add_sel round ({LANES} lanes): {dt*1e3:.2f} ms -> {LANES/dt/1e6:.1f} M adds/s")

# 2. gather cost: table row gather at lane width
idx = jnp.asarray(np.random.default_rng(0).integers(0, N, LANES), dtype=jnp.int32)
@jax.jit
def chain_gather(i0):
    def body(_, s):
        rows = table[s]
        return (s + rows[:, 0].astype(jnp.int32)) % N
    o = jax.lax.fori_loop(0, ITERS, body, i0)
    return jnp.sum(o)
float(chain_gather(idx))
t0=time.time(); float(chain_gather(idx)); dt=(time.time()-t0)/ITERS
log(f"table gather ({LANES} rows x 288B): {dt*1e3:.2f} ms")

# 3. sort cost
w_total = W
win_ids = jnp.repeat(jnp.arange(w_total, dtype=jnp.uint32), N)
digits_keys = jnp.tile(jnp.arange(N, dtype=jnp.uint32), (w_total,))
@jax.jit
def chain_sort(k):
    def body(_, kk):
        sk, sv = jax.lax.sort_key_val(kk, win_ids)
        return sk ^ sv
    o = jax.lax.fori_loop(0, 4, body, k)
    return jnp.sum(o)
float(chain_sort(digits_keys))
t0=time.time(); float(chain_sort(digits_keys)); dt=(time.time()-t0)/4
log(f"sort {w_total*N} keys: {dt*1e3:.2f} ms")

# 4. full msm_windows (includes everything up to window totals)
f = lambda: mm.msm_windows(scalars, table, c=C)
o = f(); jax.block_until_ready(o)
t0 = time.time()
for _ in range(5):
    o = f()
np.asarray(o.x)
dt = (time.time()-t0)/5
log(f"msm_windows full: {dt*1e3:.1f} ms -> {N/dt:,.0f} pts/s")
