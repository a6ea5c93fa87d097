"""Device-mesh parallelism for the proving stack.

The reference's only intra-proof parallelism is rayon across CPU cores
(SURVEY.md §2.9); its distributed backend is nonexistent. This module is the
new first-class design mandated by BASELINE.json: a 2D
`jax.sharding.Mesh` with axes

  "dp"    — data parallel over independent proofs / polynomials (batch
            proving, BASELINE config 5), and
  "field" — intra-kernel parallel over polynomial domains and MSM point
            ranges (configs 4-5): NTT butterfly stages exchange via
            all-to-all (the 4-step transform), MSM partials reduce via
            all-gather + local group-law reduction (field elements are not
            float-summable, so psum does not apply to points; modular adds
            are order-insensitive, so reduction layout is bit-exact).

On real multi-host hardware `init_distributed()` wires jax.distributed; on a
single host the same code runs over the chips of one slice, and tests run it
on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..curves import g1
from ..curves.g1 import G1Points
from ..fields.modring import FR_RING as F
from ..msm import msm as msm_mod
from ..ntt import ntt as dntt


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host runtime bring-up (jax.distributed). No-op on one process."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(dp: int = 1, field: int | None = None, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    field = field or (devices.size // dp)
    assert dp * field == devices.size, "mesh shape must cover all devices"
    return Mesh(devices.reshape(dp, field), ("dp", "field"))


# ---------------------------------------------------------------------------
# Sharded MSM: points and scalars split over the "field" axis; each shard
# runs the full Pippenger pipeline locally, partial results are all-gathered
# and reduced with the (complete) group law.
# ---------------------------------------------------------------------------


def sharded_msm(mesh: Mesh, scalars_raw: jnp.ndarray, points: G1Points, c: int | None = None) -> G1Points:
    """MSM over points sharded along `field`. Returns the (replicated) sum."""

    n_shard = -(-scalars_raw.shape[0] // mesh.shape['field'])
    c_eff = c if c is not None else msm_mod.auto_c(n_shard)

    def local(scalars_shard, px, py, pz):
        part = msm_mod.msm(scalars_shard, G1Points(px, py, pz), c=c_eff)
        gx = jax.lax.all_gather(part.x, "field")   # (n_shards, L)
        gy = jax.lax.all_gather(part.y, "field")
        gz = jax.lax.all_gather(part.z, "field")
        acc = G1Points(gx, gy, gz)
        while acc.x.shape[0] > 1:
            half = acc.x.shape[0] // 2
            top = G1Points(acc.x[half : 2 * half], acc.y[half : 2 * half], acc.z[half : 2 * half])
            low = G1Points(acc.x[:half], acc.y[:half], acc.z[:half])
            rest = G1Points(acc.x[2 * half :], acc.y[2 * half :], acc.z[2 * half :])
            s = g1.add(low, top)
            acc = G1Points(
                jnp.concatenate([s.x, rest.x]),
                jnp.concatenate([s.y, rest.y]),
                jnp.concatenate([s.z, rest.z]),
            )
        return acc.x[0], acc.y[0], acc.z[0]

    spec_in = P("field", None)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_in, spec_in, spec_in, spec_in),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    x, y, z = fn(scalars_raw, points.x, points.y, points.z)
    return G1Points(x, y, z)


# ---------------------------------------------------------------------------
# Sharded NTT (4-step): N = n1 * n2 viewed as a (n1, n2) matrix.
#   1) size-n1 NTTs along columns (local: shard along n2),
#   2) twiddle by W_N^{i*j},
#   3) all-to-all transpose,
#   4) size-n2 NTTs along rows (local).
# Output is the full NTT in (j, i)-transposed layout — the canonical 4-step
# data layout; `sharded_ntt` returns natural order by a final reshape.
# ---------------------------------------------------------------------------


def _batched_ntt(x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, n, L) -> per-row NTT, via vmap over the single-vector kernel.

    Trace-safe: uses the numpy copies of the domain tables so this can run
    inside shard_map/jit traces.
    """
    n = x.shape[1]
    d = dntt.domain(n)
    return jax.vmap(lambda v: dntt._transform(v, d.wpow_np, d.bitrev_np))(x)


def sharded_ntt(mesh: Mesh, x: jnp.ndarray, n1: int, n2: int) -> jnp.ndarray:
    """NTT of length n1*n2 sharded over the `field` axis.

    x: (n1*n2, L) natural order (row-major (i, j) -> i*n2 + j).
    Returns evaluations in natural index order (k = j*n1 + i reshuffled).
    """
    n = n1 * n2
    nshards = mesh.shape["field"]
    assert n2 % nshards == 0 and n1 % nshards == 0
    big = dntt.domain(n)
    # W_N^{i*j} table, laid out as (n1, n2)
    tw_host = np.empty((n1, n2), dtype=object)
    w = big.w
    from .. import params

    R = params.R
    for i in range(n1):
        wi = pow(w, i, R)
        acc = 1
        for j in range(n2):
            tw_host[i, j] = acc
            acc = acc * wi % R
    tw = F.encode(list(tw_host.reshape(-1))).reshape(n1, n2, F.L)

    def local(xs, tws):
        # xs: (n1, n2/s, L) — columns of our shard
        cols = jnp.moveaxis(xs, 0, 1)                  # (n2/s, n1, L)
        cols = _batched_ntt(cols)                      # size-n1 NTTs
        cols = F.mul(cols, jnp.moveaxis(tws, 0, 1))    # twiddles
        # transpose: exchange so each shard gets full rows of the (n1, n2)
        # intermediate, i.e. shard along n1.
        blocks = cols.reshape(xs.shape[1], nshards, n1 // nshards, F.L)
        blocks = jax.lax.all_to_all(blocks, "field", split_axis=1, concat_axis=0)
        # untiled all_to_all INSERTS the source-shard axis at concat_axis:
        # (s, n2/s, n1/s, L); merging (source_shard, local_col) restores the
        # full n2 axis in natural order.
        blocks = blocks.reshape(n2, n1 // nshards, F.L)
        rows = jnp.moveaxis(blocks, 0, 1)              # (n1/s, n2, L)
        rows = _batched_ntt(rows)                      # size-n2 NTTs
        return jnp.moveaxis(rows, 0, 0)                # (n1/s, n2, L)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, "field", None), P(None, "field", None)),
        out_specs=P("field", None, None),
        check_rep=False,
    )
    out = fn(x.reshape(n1, n2, F.L), tw)               # (n1, n2, L): out[i, j] = X[j*n1 + i]
    # natural order: X[k] with k = j*n1 + i  ->  transpose to (n2, n1)
    return jnp.moveaxis(out, 0, 1).reshape(n, F.L)
