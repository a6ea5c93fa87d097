"""Marlin-family (Varuna-equivalent) AHP prover over KZG, on TPU.

TPU-native replacement for snarkVM's Varuna prover — the compute-dominant
stage of the reference's execution pipeline (`Trace::prove_execution`,
SURVEY.md §3.1 "HOTTEST"). The protocol is the Marlin AHP for R1CS
(lincheck + rowcheck over H, rational sumcheck over K) compiled with KZG;
every round is NTTs + elementwise field kernels + one MSM per commitment,
orchestrated from the host with jitted device primitives.

Round structure (all challenges by Poseidon Fiat-Shamir, transcript.py):

  R1: commit  z, z_A, z_B, z_C, h0 (rowcheck quotient), q_x (public-input
      quotient: (z - xhat) / v_{H_in})
      -> alpha, eta_A, eta_B, eta_C
  R2: commit  t (lincheck target), g1, h1 with
      r_alpha(X) * sum_M eta_M z_M(X) - t(X) z(X) = h1 v_H + X g1,
      r_alpha(X) = u_H(alpha, X) = (v_H(alpha) - v_H(X)) / (alpha - X)
      -> beta
  R3: per M: sigma_M = sum_K f_M, commit g2_M, h2_M with
      f_M = X g2_M + sigma_M/|K|   and   b_M f_M - a_M = h2_M v_K,
      a_M = v_H(alpha) v_H(beta) cval_M,
      b_M = (alpha - row_M)(beta - col_M)
      -> gamma (K-side query point)
  Openings: batched KZG proofs at beta (H-side polys) and gamma (K-side).

Degree-bound openings for g1/g2 and zero-knowledge masking are tracked as
future work (documented in README; they do not affect completeness or the
performance shape).
"""

from __future__ import annotations

import functools

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import params
from ..fields.modring import FR_RING as F
from ..ntt import ntt as dntt
from ..pcs import kzg, poly_device as pd
from .indexer import Index, z_evaluations
from .r1cs import ConstraintSystem
from .sparse import spmv
from .transcript import Transcript

R = params.R
SHIFT = params.FR_GENERATOR  # coset shift for quotient computations

BETA_POLYS = ["z", "z_a", "z_b", "z_c", "h0", "q_x", "t", "g1", "h1"]
GAMMA_POLYS = [
    f"{p}_{mname}" for mname in "abc" for p in ("row", "col", "cval", "rcp", "g2", "h2")
]


@dataclass
class Proof:
    commitments: Dict[str, object]      # name -> host affine G1 point
    sigmas: Tuple[int, int, int]
    evals_beta: Dict[str, int]
    evals_gamma: Dict[str, int]
    w_beta: object
    w_gamma: object

    def size_bytes(self) -> int:
        n_points = len(self.commitments) + 2
        n_scalars = 3 + len(self.evals_beta) + len(self.evals_gamma)
        return n_points * 48 + n_scalars * 32


@functools.lru_cache(maxsize=None)
def _coset_vh_inv(n_domain: int, n_vanish: int) -> jnp.ndarray:
    """1 / v(x) for v(X) = X^n_vanish - 1 on the coset SHIFT * H_{n_domain}.

    Device computation (geometric powers + batch inverse): the host loop
    this replaces was O(n_domain) bigint modinvs — minutes at 2^20.
    """
    w = dntt.domain(n_domain).w
    x_pow = F.encode([pow(SHIFT, n_vanish, R)])[0]
    w_pow = F.encode([pow(w, n_vanish, R)])[0]

    @jax.jit
    def build(x_pow, w_pow):
        pows = pd.powers(w_pow, n_domain)           # (n, L)
        vals = F.sub(F.mul(pows, x_pow[None, :]), F.const(1))
        return F.batch_inv(vals)

    return build(x_pow, w_pow)


def _fr(x: jnp.ndarray) -> int:
    """Decode a single (L,) Montgomery element to a host int."""
    return int(F.decode(x[None])[0])


def prove(index: Index, cs: ConstraintSystem) -> Proof:
    n, m, ell = index.n, index.m, index.ell
    srs = index.srs
    mul, add, sub = pd.mul_j, pd.add_j, pd.sub_j

    # ---- witness layout -----------------------------------------------------
    z_host = z_evaluations(index, cs)
    z_evals = F.encode(list(z_host))
    zm_evals = {mi.name: spmv(mi.by_row, z_evals) for mi in index.matrices}

    z_poly = dntt.intt(z_evals)
    zm_polys = {k: dntt.intt(v) for k, v in zm_evals.items()}

    # ---- rowcheck quotient h0 ----------------------------------------------
    za_c = dntt.coset_ntt(pd.pad_to(zm_polys["A"], 2 * n), SHIFT)
    zb_c = dntt.coset_ntt(pd.pad_to(zm_polys["B"], 2 * n), SHIFT)
    zc_c = dntt.coset_ntt(pd.pad_to(zm_polys["C"], 2 * n), SHIFT)
    vh_inv = _coset_vh_inv(2 * n, n)
    h0_evals = mul(sub(mul(za_c, zb_c), zc_c), vh_inv)
    h0_poly = dntt.coset_intt(h0_evals, SHIFT)[: n - 1]

    # ---- public input quotient q_x -----------------------------------------
    x_pub = cs.public_inputs() + [0] * (ell - cs.num_inputs)
    xhat_poly = dntt.intt(F.encode(x_pub)) if ell > 1 else F.encode(x_pub)
    if ell < n:
        z_c = dntt.coset_ntt(z_poly, SHIFT)
        xhat_c = dntt.coset_ntt(pd.pad_to(xhat_poly, n), SHIFT)
        vin_inv = _coset_vh_inv(n, ell)
        qx_evals = mul(sub(z_c, xhat_c), vin_inv)
        qx_poly = dntt.coset_intt(qx_evals, SHIFT)[: n - ell]
    else:
        qx_poly = jnp.zeros((1, F.L), dtype=jnp.uint32)

    commitments: Dict[str, object] = {}
    commitments["z"] = kzg.commit_host(srs, z_poly)
    commitments["z_a"] = kzg.commit_host(srs, zm_polys["A"])
    commitments["z_b"] = kzg.commit_host(srs, zm_polys["B"])
    commitments["z_c"] = kzg.commit_host(srs, zm_polys["C"])
    commitments["h0"] = kzg.commit_host(srs, h0_poly)
    commitments["q_x"] = kzg.commit_host(srs, qx_poly)

    # ---- transcript / round 1 ----------------------------------------------
    tr = Transcript("varuna")
    tr.absorb_fr(n, m, ell)
    tr.absorb_points(index.index_commitments())
    tr.absorb_fr(*cs.public_inputs())
    for name in ("z", "z_a", "z_b", "z_c", "h0", "q_x"):
        tr.absorb_point(commitments[name])
    alpha, eta_a, eta_b, eta_c = tr.challenges(4)
    etas = {"A": eta_a, "B": eta_b, "C": eta_c}

    # ---- round 2: lincheck sumcheck ----------------------------------------
    dH = dntt.domain(n)
    vh_alpha = (pow(alpha, n, R) - 1) % R
    alpha_e = F.encode([alpha])[0]
    # u_H(alpha, h) = v_H(alpha) / (alpha - h) for h in H
    denom = sub(jnp.broadcast_to(alpha_e, (n, F.L)), dH.wpow)
    u_alpha = mul(F.batch_inv(denom), F.const(vh_alpha))
    # t over H: sum_M eta_M * (M^T u_alpha)
    t_vec = None
    for mi in index.matrices:
        contrib = mul(spmv(mi.by_col, u_alpha), F.const(etas[mi.name]))
        t_vec = contrib if t_vec is None else add(t_vec, contrib)
    t_poly = dntt.intt(t_vec)

    # r_alpha(X) = sum_i alpha^{n-1-i} X^i  (degree n-1)
    r_alpha_poly = pd.powers(alpha_e, n)[::-1]

    # s(X) = sum_M eta_M z_M(X)
    s_poly = None
    for mname, key in (("A", "z_a"), ("B", "z_b"), ("C", "z_c")):
        term = mul(zm_polys[mname], F.const(etas[mname]))
        s_poly = term if s_poly is None else add(s_poly, term)

    r_c = dntt.coset_ntt(pd.pad_to(r_alpha_poly, 2 * n), SHIFT)
    s_c = dntt.coset_ntt(pd.pad_to(s_poly, 2 * n), SHIFT)
    t_c = dntt.coset_ntt(pd.pad_to(t_poly, 2 * n), SHIFT)
    zf_c = dntt.coset_ntt(pd.pad_to(z_poly, 2 * n), SHIFT)
    q1_evals = sub(mul(r_c, s_c), mul(t_c, zf_c))
    q1_poly = dntt.coset_intt(q1_evals, SHIFT)
    h1_poly, rem = pd.divide_by_vanishing(q1_poly, n)
    g1_poly = rem[1:]  # rem = X g1 (constant term zero by the sum identity)

    commitments["t"] = kzg.commit_host(srs, t_poly)
    commitments["g1"] = kzg.commit_host(srs, g1_poly)
    commitments["h1"] = kzg.commit_host(srs, h1_poly)
    for nm in ("t", "g1", "h1"):
        tr.absorb_point(commitments[nm])
    beta = tr.challenge()

    # ---- round 3: rational sumchecks over K --------------------------------
    vh_beta = (pow(beta, n, R) - 1) % R
    ab_scale = F.const(vh_alpha * vh_beta % R)
    alpha_beta = F.const(alpha * beta % R)
    beta_e = F.encode([beta])[0]
    sigmas = {}
    g2_polys, h2_polys = {}, {}
    vk_inv_4m = _coset_vh_inv(4 * m, m)
    for mi in index.matrices:
        mn = mi.name.lower()
        b_e = add(
            sub(
                jnp.broadcast_to(alpha_beta, (m, F.L)),
                add(
                    mul(mi.col_evals, F.const(alpha)),
                    mul(mi.row_evals, F.const(beta)),
                ),
            ),
            mi.rcp_evals,
        )
        a_e = mul(mi.cval_evals, ab_scale)
        f_e = mul(a_e, F.batch_inv(b_e))
        sigma = _fr(pd.tree_sum(f_e))
        sigmas[mi.name] = sigma
        f_poly = dntt.intt(f_e)
        g2_polys[mn] = f_poly[1:]
        # h2 = (b f - a) / v_K on a 4m coset
        row_c = dntt.coset_ntt(pd.pad_to(mi.row_poly, 4 * m), SHIFT)
        col_c = dntt.coset_ntt(pd.pad_to(mi.col_poly, 4 * m), SHIFT)
        rcp_c = dntt.coset_ntt(pd.pad_to(mi.rcp_poly, 4 * m), SHIFT)
        cval_c = dntt.coset_ntt(pd.pad_to(mi.cval_poly, 4 * m), SHIFT)
        f_c = dntt.coset_ntt(pd.pad_to(f_poly, 4 * m), SHIFT)
        b_c = add(
            sub(
                jnp.broadcast_to(alpha_beta, (4 * m, F.L)),
                add(mul(col_c, F.const(alpha)), mul(row_c, F.const(beta))),
            ),
            rcp_c,
        )
        a_c = mul(cval_c, ab_scale)
        num = sub(mul(b_c, f_c), a_c)
        h2_evals = mul(num, vk_inv_4m)
        h2_polys[mn] = dntt.coset_intt(h2_evals, SHIFT)[: 3 * m - 2]

        commitments[f"g2_{mn}"] = kzg.commit_host(srs, g2_polys[mn])
        commitments[f"h2_{mn}"] = kzg.commit_host(srs, h2_polys[mn])

    tr.absorb_fr(sigmas["A"], sigmas["B"], sigmas["C"])
    for mn in "abc":
        tr.absorb_point(commitments[f"g2_{mn}"])
        tr.absorb_point(commitments[f"h2_{mn}"])
    gamma = tr.challenge()

    # ---- openings -----------------------------------------------------------
    beta_polys = {
        "z": z_poly, "z_a": zm_polys["A"], "z_b": zm_polys["B"], "z_c": zm_polys["C"],
        "h0": h0_poly, "q_x": qx_poly, "t": t_poly, "g1": g1_poly, "h1": h1_poly,
    }
    gamma_polys = {}
    for mi in index.matrices:
        mn = mi.name.lower()
        gamma_polys[f"row_{mn}"] = mi.row_poly
        gamma_polys[f"col_{mn}"] = mi.col_poly
        gamma_polys[f"cval_{mn}"] = mi.cval_poly
        gamma_polys[f"rcp_{mn}"] = mi.rcp_poly
        gamma_polys[f"g2_{mn}"] = g2_polys[mn]
        gamma_polys[f"h2_{mn}"] = h2_polys[mn]

    evals_beta = {k: _fr(pd.eval_coeffs(p, beta_e)) for k, p in beta_polys.items()}
    gamma_e = F.encode([gamma])[0]
    evals_gamma = {k: _fr(pd.eval_coeffs(p, gamma_e)) for k, p in gamma_polys.items()}

    tr.absorb_fr(*[evals_beta[k] for k in BETA_POLYS])
    tr.absorb_fr(*[evals_gamma[k] for k in GAMMA_POLYS])
    xi1 = tr.challenge()
    xi2 = tr.challenge()

    w_beta, _ = kzg.batch_open_at(
        srs, [beta_polys[k] for k in BETA_POLYS], beta_e, F.encode([xi1])[0]
    )
    w_gamma, _ = kzg.batch_open_at(
        srs, [gamma_polys[k] for k in GAMMA_POLYS], gamma_e, F.encode([xi2])[0]
    )

    return Proof(
        commitments=commitments,
        sigmas=(sigmas["A"], sigmas["B"], sigmas["C"]),
        evals_beta=evals_beta,
        evals_gamma=evals_gamma,
        w_beta=w_beta,
        w_gamma=w_gamma,
    )
