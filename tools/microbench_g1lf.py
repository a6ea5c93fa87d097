"""Microbench: fused Pallas G1 add/double on the real chip, plus gather cost."""
import time, sys
import jax, jax.numpy as jnp
import numpy as np

from aleo_tpu.curves import g1_fused as gf
from aleo_tpu.reference.curve import G1

print("backend:", jax.default_backend(), file=sys.stderr)

N = 1 << 16
base = G1.generator()
pts_host = []
cur = base
for _ in range(64):
    pts_host.append(cur)
    cur = G1.add(cur, base)
p = gf.encode_lf(pts_host * (N // 64))
q = gf.encode_lf(pts_host[::-1] * (N // 64))

def timeit(f, *a, iters=20, label=""):
    t0 = time.time(); o = f(*a); jax.block_until_ready(o)
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        o = f(*a)
    jax.block_until_ready(o)
    dt = (time.time() - t0) / iters
    print(f"{label}: {dt*1e6:.0f} us (compile {compile_t:.1f}s)", file=sys.stderr)
    return dt

addf = jax.jit(gf.add_lf)
dblf = jax.jit(gf.double_lf)
timeit(addf, p, q, label=f"add_lf {N}")
timeit(dblf, p, label=f"double_lf {N}")

# smaller batch (bucket-lane shape)
M = 80 * 1024
pm = gf.G1LF(p.x[:, : M % N] if M < N else jnp.tile(p.x, (1, M // N)),
             jnp.tile(p.y, (1, M // N)) if M >= N else p.y[:, :M],
             jnp.tile(p.z, (1, M // N)) if M >= N else p.z[:, :M])
qm = pm
timeit(addf, pm, qm, label=f"add_lf {M}")

M2 = 8192
ps = gf.G1LF(p.x[:, :M2], p.y[:, :M2], p.z[:, :M2])
timeit(addf, ps, ps, label=f"add_lf {M2}")

# gather cost: gather N points by random index (limbs-first layout)
idx = jnp.asarray(np.random.randint(0, N, size=N), jnp.int32)
@jax.jit
def gath(p, idx):
    return gf.G1LF(p.x[:, idx], p.y[:, idx], p.z[:, idx])
timeit(gath, p, idx, label=f"gather {N} (limbs-first axis1)")

# sort cost
keys = jnp.asarray(np.random.randint(0, 1 << 20, size=20 * N), jnp.uint32)
@jax.jit
def srt(k):
    return jnp.argsort(k)
timeit(srt, keys, label=f"argsort {20*N}")
