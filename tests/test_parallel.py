"""Sharded MSM and 4-step NTT on a virtual 8-device CPU mesh."""

import random

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # full-size device proofs/kernels; see pytest.ini tiers

from aleo_tpu import params
from aleo_tpu.curves import g1
from aleo_tpu.fields.modring import FR_RING as F, ints_to_limbs
from aleo_tpu.parallel import mesh as pmesh
from aleo_tpu.reference import polynomial as rpoly
from aleo_tpu.reference.curve import G1
from aleo_tpu.reference.msm import msm_naive

R = params.R


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8
    return pmesh.make_mesh(dp=1, field=8)


def test_sharded_ntt_matches_host(mesh8):
    rng = random.Random(700)
    n1, n2 = 16, 32
    a = [rng.randrange(R) for _ in range(n1 * n2)]
    out = pmesh.sharded_ntt(mesh8, F.encode(a), n1, n2)
    assert list(F.decode(out)) == rpoly.ntt(a)


def test_sharded_msm_matches_host(mesh8):
    rng = random.Random(701)
    n = 32
    G = G1.generator()
    pts = [G1.mul(rng.randrange(1, 5000), G) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    sc = jnp.asarray(ints_to_limbs(scalars, F.L))
    out = pmesh.sharded_msm(mesh8, sc, g1.encode_points(pts))
    got = g1.decode_points(
        g1.G1Points(out.x[None], out.y[None], out.z[None])
    )[0]
    assert got == msm_naive(scalars, pts)
