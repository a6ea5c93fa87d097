"""Device MSM vs host oracle. All cases share one (n, c) shape so the
compiled kernel is reused across tests."""

import random

import pytest

pytestmark = pytest.mark.slow  # full-size device proofs/kernels; see pytest.ini tiers

from aleo_tpu import params
from aleo_tpu.msm.msm import msm_host
from aleo_tpu.reference.curve import G1
from aleo_tpu.reference.msm import msm_naive

N = 17
C = 8


def _pad(scalars, pts):
    scalars = scalars + [0] * (N - len(scalars))
    pts = pts + [None] * (N - len(pts))
    return scalars, pts


def test_msm_random_matches_oracle():
    rng = random.Random(300)
    G = G1.generator()
    pts = [G1.mul(rng.randrange(1, 10_000), G) for _ in range(N)]
    scalars = [rng.randrange(params.R) for _ in range(N)]
    scalars[3] = 0          # zero scalar
    pts[5] = None           # identity point
    assert msm_host(scalars, pts, c=C) == msm_naive(scalars, pts)


def test_msm_duplicate_digits_and_edge_scalars():
    G = G1.generator()
    scalars, pts = _pad([1, 1, 1, 2, 2, 3, 255, 256, params.R - 1], [G] * 9)
    assert msm_host(scalars, pts, c=C) == msm_naive(scalars, pts)


@pytest.mark.slow
def test_msm_other_window_size():
    rng = random.Random(302)
    G = G1.generator()
    pts = [G1.mul(rng.randrange(1, 1000), G) for _ in range(N)]
    scalars = [rng.randrange(params.R) for _ in range(N)]
    assert msm_host(scalars, pts, c=4) == msm_naive(scalars, pts)


def test_msm_batch_affine_forced_cpu(monkeypatch):
    """Batch-affine accumulation (curves/g1_affine.py) forced on the CPU
    backend: covers the complete-law cases — duplicate points in one bucket
    (tangent law), identity sentinel, zero scalar, sign cancellation — that
    the TPU default path exercises on hardware."""
    from aleo_tpu import config
    from aleo_tpu.msm import msm as msm_mod

    monkeypatch.setattr(config, "MSM_AFFINE_MODE", "1")
    msm_mod.msm_windows.clear_cache()
    try:
        G = G1.generator()
        scalars, pts = _pad(
            [1, 1, 1, 2, params.R - 1, 7, 255, 256], [G] * 5 + [None, G, G]
        )
        assert msm_host(scalars, pts, c=C) == msm_naive(scalars, pts)
    finally:
        msm_mod.msm_windows.clear_cache()


def test_msm_fixed_base_matches_oracle(rng):
    """Fixed-base single-window pipeline (msm/fixed_base.py) vs host oracle:
    table build (device doublings + batched to-affine), zero-padding
    freeness, identity points, batch variant."""
    import jax.numpy as jnp

    from aleo_tpu.curves import g1
    from aleo_tpu.fields.modring import FR_RING, ints_to_limbs
    from aleo_tpu.msm import fixed_base

    n = 32
    G = G1.generator()
    pts = [G1.mul(rng.randrange(1, 5000), G) for _ in range(n)]
    pts[3] = None                                   # identity base
    scalars = [rng.randrange(params.R) for _ in range(n)]
    scalars[1] = 0
    scalars[7] = params.R - 1
    ft = fixed_base.build_table(g1.encode_points(pts), c=6)
    raw = jnp.asarray(ints_to_limbs(scalars, FR_RING.L))
    assert fixed_base.msm_fixed_host(raw, ft) == msm_naive(scalars, pts)

    k = 2
    scal_b = [[rng.randrange(params.R) for _ in range(n)] for _ in range(k)]
    raw_b = jnp.stack([jnp.asarray(ints_to_limbs(s, FR_RING.L)) for s in scal_b])
    got = fixed_base.msm_fixed_batch_host(raw_b, ft)
    for p in range(k):
        assert got[p] == msm_naive(scal_b[p], pts)


def test_msm_batch_matches_single(rng):
    """Shared-table multi-MSM (batch.py's commitment path) vs per-proof MSM."""
    import jax.numpy as jnp

    from aleo_tpu import params
    from aleo_tpu.curves import g1
    from aleo_tpu.fields.modring import FR_RING, ints_to_limbs
    from aleo_tpu.msm import msm as msm_mod
    from aleo_tpu.reference.curve import G1
    from aleo_tpu.reference.msm import msm_pippenger_jac

    n, k = 64, 3
    base = G1.generator()
    pts, cur = [], base
    for _ in range(n):
        pts.append(cur)
        cur = G1.add(cur, base)
    table = msm_mod.make_table(g1.encode_points(pts))
    scal = [[rng.randrange(params.R) for _ in range(n)] for _ in range(k)]
    raw = jnp.stack(
        [jnp.asarray(ints_to_limbs(s, FR_RING.L)) for s in scal]
    )
    got = msm_mod.msm_batch_host(raw, table, c=6)
    for p in range(k):
        want = msm_pippenger_jac(scal[p], pts, c=8)
        assert got[p] == want
