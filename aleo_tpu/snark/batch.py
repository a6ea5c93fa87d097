"""Batched Varuna prover: k same-circuit transitions in one device pipeline.

BASELINE.json config 5 (batch-prove token multi-record transactions): all k
proofs share one `Index` (same function circuit), so every device stage —
spmv, NTTs, elementwise rounds, batched inversions — runs vmapped over a
leading batch axis (one dispatch for the whole batch), and every KZG
commitment round uses the shared-table multi-MSM
(`msm.msm_windows_batch`: the k MSMs ride one sort + one fused-add bucket
pipeline, amortizing the Pippenger tail rounds across the batch).

Host work (Fiat-Shamir transcripts, window combines) stays per-proof — each
proof has its own independent transcript, exactly as k separate
`Trace::prove_execution` calls would (SURVEY.md §3.1).

On a multi-chip mesh the batch axis is the dp axis: shard the leading k
dimension of every batched array with jax.sharding and this pipeline
becomes data-parallel batch proving (the dryrun's dp mesh shape,
__graft_entry__.py).
"""

from __future__ import annotations

import random as _random
from typing import List

import jax
import jax.numpy as jnp

from .. import params
from ..fields import fr_lf as lf
from ..msm import msm as msm_mod
from ..ntt import ntt as dntt
from ..pcs import kzg, poly_lf as pl
from .indexer import Index, z_evaluations
from .prover import (
    BETA_POLYS, GAMMA_POLYS, Proof, _mask_vh,
    _f_sigma_block, _h0_block, _h2_block, _q1_block, _qx_block,
    _u_alpha_block, _weighted_sum3,
)
from .r1cs import ConstraintSystem
from .sparse import spmv_lf
from .transcript import Transcript

R = params.R
SHIFT = params.FR_GENERATOR

# vmapped device stages (batch axis leading)
_mul_b = jax.vmap(lf.mul)
_add_b = jax.vmap(lf.add)
_sub_b = jax.vmap(lf.sub)
_binv_b = jax.vmap(lf.batch_inv)
_tsum_b = jax.vmap(lf.tree_sum)
_eval_b = jax.vmap(pl.eval_coeffs)


# Jitted vmapped round blocks (the single prover's elementwise blocks lifted
# over the proof axis): outside jit every vmapped lf op dispatches its limb
# primitives eagerly — the r3 batch prover's dominant untracked cost.
_h0_block_b = jax.jit(jax.vmap(_h0_block, in_axes=(0, 0, 0, None)))
_qx_block_b = jax.jit(jax.vmap(_qx_block, in_axes=(0, 0, None)))
_q1_block_b = jax.jit(jax.vmap(_q1_block))
_u_alpha_block_b = jax.jit(jax.vmap(_u_alpha_block, in_axes=(0, None, 0)))
_f_sigma_block_b = jax.jit(
    jax.vmap(_f_sigma_block, in_axes=(None, None, None, None, 0, 0, 0, 0))
)
_h2_block_b = jax.jit(
    jax.vmap(_h2_block, in_axes=(None, None, None, None, 0, 0, 0, 0, 0, None))
)
_weighted_sum3_b = jax.jit(jax.vmap(_weighted_sum3, in_axes=(1, 0)))


# Batched NTTs: MatNTT has NATIVE batch support (the k axis rides as extra
# matmul lanes, ntt/matntt.py); below the MatNTT threshold the VPU butterfly
# network vmaps directly (the per-slice dispatch inside ntt_lf picks the
# same VPU path, so no suspension is needed — the r4 `matntt_suspended`
# context manager is gone, VERDICT r4 ask #5).


def _ntt_b(x):
    if dntt._use_matntt(x.shape[2]):
        from ..ntt import matntt

        return matntt.ntt_batch_lf16(x)
    return jax.vmap(dntt.ntt_lf)(x)


def _intt_b(x):
    if dntt._use_matntt(x.shape[2]):
        from ..ntt import matntt

        return matntt.intt_batch_lf16(x)
    return jax.vmap(dntt.intt_lf)(x)


def _coset_ntt_b(x, shift):
    if dntt._use_matntt(x.shape[2]):
        from ..ntt import matntt

        return matntt.coset_ntt_batch_lf16(x, shift)
    return jax.vmap(lambda a: dntt.coset_ntt_lf(a, shift))(x)


def _coset_intt_b(x, shift):
    if dntt._use_matntt(x.shape[2]):
        from ..ntt import matntt

        return matntt.coset_intt_batch_lf16(x, shift)
    return jax.vmap(lambda a: dntt.coset_intt_lf(a, shift))(x)


def _divide_by_linear_b(coeffs_b: jnp.ndarray, z_b: jnp.ndarray):
    """Batched (q, y) with p - y = q (X - z): the evaluation-domain division
    of pl.divide_by_linear_via_domain lifted over the proof axis, with the
    NTT pair riding MatNTT's native batch path on TPU."""
    k, _, n = coeffs_b.shape
    npow2 = 1 << max(1, (n - 1).bit_length())
    c = _pad_b(coeffs_b, npow2)
    y_b = _eval_b(coeffs_b, z_b)                       # (k, L, 1)
    evals = _ntt_b(c)
    d = dntt.domain(npow2)
    q_evals = jax.vmap(
        lambda e, z, y: pl._linear_quotient_evals(
            e, jnp.asarray(d.wpow_np), z, y
        )
    )(evals, z_b, y_b)
    q = _intt_b(q_evals)
    return q[:, :, : max(1, n - 1)], y_b


def _pad_b(x, n):
    k = x.shape[2]
    if k == n:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((x.shape[0], x.shape[1], n - k), x.dtype)], axis=2
    )


def _const_b(vals: List[int], n: int = 1) -> jnp.ndarray:
    """Per-proof host scalars -> (k, L, n) Montgomery limbs."""
    enc = lf.encode(vals)                   # (L, k)
    return jnp.broadcast_to(enc.T[:, :, None], (len(vals), lf.L, n))


def _commit_batch(srs, stack, c=None, shift=0):
    """stack (k, L, n) -> k host affine points (kzg.commit_many_lf: shared
    gather table per size group, one readback per group)."""
    return kzg.commit_many_lf(
        srs, [stack[i] for i in range(stack.shape[0])], c=c, shift=shift
    )


def prove_batch(index: Index, cs_list: List[ConstraintSystem], rng=None,
                mesh=None) -> List[Proof]:
    """k proofs under one index; returns one Proof per constraint system
    (vmapped device stages; NTTs ride MatNTT's native batch path on TPU)."""
    return _prove_batch_impl(index, cs_list, rng, mesh)


def _prove_batch_impl(index: Index, cs_list: List[ConstraintSystem], rng=None,
                      mesh=None) -> List[Proof]:
    """k proofs under one index; returns one Proof per constraint system.

    `mesh` (a jax.sharding.Mesh with a "dp" axis) shards the leading k axis
    of every batched device array across devices — the data-parallel batch
    prover of BASELINE config 5. GSPMD propagates the dp sharding through
    the vmapped stages; the shared-table multi-MSM's global sort gathers
    across shards (its keys carry the proof index, so results are
    bit-identical to the unsharded run).
    """
    k = len(cs_list)
    assert k >= 1
    n, m, ell = index.n, index.m, index.ell
    srs = index.srs
    if rng is None:
        rng = _random.SystemRandom()
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as _P

        assert k % mesh.shape["dp"] == 0, "k must divide over the dp axis"

        def _shard(a):
            spec = _P(*(("dp",) + (None,) * (a.ndim - 1)))
            return jax.device_put(a, NamedSharding(mesh, spec))
    else:
        def _shard(a):
            return a

    # ---- batched witness layout --------------------------------------------
    z_evals = _shard(jnp.stack(
        [lf.encode(list(z_evaluations(index, cs))) for cs in cs_list]
    ))                                                  # (k, L, n)
    spmv_b = {
        mi.name: jax.vmap(lambda x, t=mi.by_row: spmv_lf(t, x))(z_evals)
        for mi in index.matrices
    }
    mask = lambda pb: jnp.stack(
        [
            _mask_vh(pb[p], n, rng.randrange(R), rng.randrange(R))
            for p in range(k)
        ]
    )
    z_poly = mask(_intt_b(z_evals))                     # (k, L, n+2)
    zm_polys = {key: mask(_intt_b(v)) for key, v in spmv_b.items()}

    s_coeff_list = [[rng.randrange(R) for _ in range(2 * n + 2)] for _ in range(k)]
    sigma_s = [
        n * (sc[0] + sc[n] + sc[2 * n]) % R for sc in s_coeff_list
    ]
    s_mask = _shard(jnp.stack([lf.encode(sc) for sc in s_coeff_list]))

    # ---- rowcheck + input quotients ----------------------------------------
    za_c = _coset_ntt_b(_pad_b(zm_polys["A"], 4 * n), SHIFT)
    zb_c = _coset_ntt_b(_pad_b(zm_polys["B"], 4 * n), SHIFT)
    zc_c = _coset_ntt_b(_pad_b(zm_polys["C"], 4 * n), SHIFT)
    vh_inv = pl._coset_vh_inv(4 * n, n, SHIFT)
    h0_evals = _h0_block_b(za_c, zb_c, zc_c, vh_inv)
    h0_poly = _coset_intt_b(h0_evals, SHIFT)[:, :, : n + 3]

    x_pubs = [cs.public_inputs() + [0] * (ell - cs.num_inputs) for cs in cs_list]
    xhat = _shard(jnp.stack([lf.encode(x) for x in x_pubs]))
    xhat_poly = _intt_b(xhat) if ell > 1 else xhat
    z_c = _coset_ntt_b(_pad_b(z_poly, 2 * n), SHIFT)
    xhat_c = _coset_ntt_b(_pad_b(xhat_poly, 2 * n), SHIFT)
    vin_inv = pl._coset_vh_inv(2 * n, ell, SHIFT)
    qx_evals = _qx_block_b(z_c, xhat_c, vin_inv)
    qx_poly = _coset_intt_b(qx_evals, SHIFT)[:, :, : n + 2 - ell]

    cms = {}
    for name, stack in (
        ("z", z_poly), ("z_a", zm_polys["A"]), ("z_b", zm_polys["B"]),
        ("z_c", zm_polys["C"]), ("h0", h0_poly), ("q_x", qx_poly),
        ("s", s_mask),
    ):
        cms[name] = _commit_batch(srs, stack)

    # ---- transcripts / round 1 ---------------------------------------------
    trs = [Transcript("varuna") for _ in range(k)]
    for p, tr in enumerate(trs):
        tr.absorb_fr(n, m, ell)
        tr.absorb_points(index.index_commitments())
        tr.absorb_fr(*cs_list[p].public_inputs())
        for name in ("z", "z_a", "z_b", "z_c", "h0", "q_x", "s"):
            tr.absorb_point(cms[name][p])
        tr.absorb_fr(sigma_s[p])
    chals = [tr.challenges(4) for tr in trs]
    alphas = [ch[0] for ch in chals]
    etas = {"A": [ch[1] for ch in chals], "B": [ch[2] for ch in chals],
            "C": [ch[3] for ch in chals]}

    # ---- round 2 ------------------------------------------------------------
    dH = dntt.domain(n)
    vh_alphas = [(pow(a, n, R) - 1) % R for a in alphas]
    u_alpha = _u_alpha_block_b(
        _const_b(alphas, n), jnp.asarray(dH.wpow_np).T, _const_b(vh_alphas, n)
    )
    spmvs = jnp.stack([
        jax.vmap(lambda x, t=mi.by_col: spmv_lf(t, x))(u_alpha)
        for mi in index.matrices
    ])                                              # (3, k, L, n)
    eta_ws = jnp.stack([_const_b(etas[mi.name]) for mi in index.matrices])
    t_vec = _weighted_sum3_b(spmvs, jnp.swapaxes(eta_ws, 0, 1))
    t_poly = _intt_b(t_vec)

    r_alpha = jax.vmap(lambda z: lf.powers(z, n))(_const_b(alphas))[:, :, ::-1]
    s_eta = _weighted_sum3_b(
        jnp.stack([zm_polys[mname] for mname in ("A", "B", "C")]),
        jnp.swapaxes(
            jnp.stack([_const_b(etas[mname]) for mname in ("A", "B", "C")]),
            0, 1,
        ),
    )

    r_c = _coset_ntt_b(_pad_b(r_alpha, 4 * n), SHIFT)
    s_c = _coset_ntt_b(_pad_b(s_eta, 4 * n), SHIFT)
    t_c = _coset_ntt_b(_pad_b(t_poly, 4 * n), SHIFT)
    zf_c = _coset_ntt_b(_pad_b(z_poly, 4 * n), SHIFT)
    sm_c = _coset_ntt_b(_pad_b(s_mask, 4 * n), SHIFT)
    q1_evals = _q1_block_b(sm_c, r_c, s_c, t_c, zf_c)
    q1_poly = _coset_intt_b(q1_evals, SHIFT)[:, :, : 2 * n + 2]
    # chunked X^n = 1 reduction — pure adds, vmaps cleanly
    h1_poly, rem = jax.vmap(lambda a: pl.divide_by_vanishing(a, n))(q1_poly)
    g1_poly = rem[:, :, 1:]

    D = srs.max_degree
    for name, stack in (("t", t_poly), ("g1", g1_poly), ("h1", h1_poly)):
        cms[name] = _commit_batch(srs, stack)
    cms["g1_shift"] = _commit_batch(srs, g1_poly, shift=D - (n - 2))
    for p, tr in enumerate(trs):
        for nm in ("t", "g1", "h1", "g1_shift"):
            tr.absorb_point(cms[nm][p])
    betas = [tr.challenge() for tr in trs]

    # ---- round 3 ------------------------------------------------------------
    vh_betas = [(pow(b, n, R) - 1) % R for b in betas]
    ab_list = [a * b % R for a, b in zip(alphas, betas)]
    abs_list = [va * vb % R for va, vb in zip(vh_alphas, vh_betas)]
    sigmas = {}
    g2_polys, h2_polys = {}, {}
    vk_inv = pl._coset_vh_inv(4 * m, m, SHIFT)
    for mi in index.matrices:
        mn = mi.name.lower()
        # index evaluations/polys are SHARED across the batch: the coset
        # lifts run unbatched, and the jitted vmapped blocks broadcast them
        f_e, sigma_dev = _f_sigma_block_b(
            mi.col_evals.T, mi.row_evals.T, mi.rcp_evals.T, mi.cval_evals.T,
            _const_b(alphas, m), _const_b(betas, m),
            _const_b(ab_list, m), _const_b(abs_list, m),
        )
        sig = [int(v) for v in lf.decode(
            jnp.swapaxes(sigma_dev, 0, 2).reshape(lf.L, k)
        )]
        sigmas[mi.name] = sig
        f_poly = _intt_b(f_e)
        g2_polys[mn] = f_poly[:, :, 1:]
        row_c = dntt.coset_ntt_lf(pl.pad_to(mi.row_poly.T, 4 * m), SHIFT)
        col_c = dntt.coset_ntt_lf(pl.pad_to(mi.col_poly.T, 4 * m), SHIFT)
        rcp_c = dntt.coset_ntt_lf(pl.pad_to(mi.rcp_poly.T, 4 * m), SHIFT)
        cval_c = dntt.coset_ntt_lf(pl.pad_to(mi.cval_poly.T, 4 * m), SHIFT)
        f_c = _coset_ntt_b(_pad_b(f_poly, 4 * m), SHIFT)
        h2_evals = _h2_block_b(
            row_c, col_c, rcp_c, cval_c, f_c,
            _const_b(alphas, 4 * m), _const_b(betas, 4 * m),
            _const_b(ab_list, 4 * m), _const_b(abs_list, 4 * m), vk_inv,
        )
        h2_polys[mn] = _coset_intt_b(h2_evals, SHIFT)[:, :, : m - 1]
        cms[f"g2_{mn}"] = _commit_batch(srs, g2_polys[mn])
        cms[f"h2_{mn}"] = _commit_batch(srs, h2_polys[mn])
        cms[f"g2_shift_{mn}"] = _commit_batch(srs, g2_polys[mn], shift=D - (m - 2))

    for p, tr in enumerate(trs):
        tr.absorb_fr(sigmas["A"][p], sigmas["B"][p], sigmas["C"][p])
        for mn in "abc":
            tr.absorb_point(cms[f"g2_{mn}"][p])
            tr.absorb_point(cms[f"h2_{mn}"][p])
            tr.absorb_point(cms[f"g2_shift_{mn}"][p])
    gammas = [tr.challenge() for tr in trs]

    # ---- openings -----------------------------------------------------------
    beta_stacks = {
        "z": z_poly, "z_a": zm_polys["A"], "z_b": zm_polys["B"],
        "z_c": zm_polys["C"], "h0": h0_poly, "q_x": qx_poly, "s": s_mask,
        "t": t_poly, "g1": g1_poly, "h1": h1_poly,
    }
    gamma_stacks = {}
    for mi in index.matrices:
        mn = mi.name.lower()
        for pname in ("row", "col", "cval", "rcp"):
            gamma_stacks[f"{pname}_{mn}"] = jnp.broadcast_to(
                getattr(mi, f"{pname}_poly").T[None], (k, lf.L, m)
            )
        gamma_stacks[f"g2_{mn}"] = g2_polys[mn]
        gamma_stacks[f"h2_{mn}"] = h2_polys[mn]

    beta_b = _const_b(betas)
    gamma_b = _const_b(gammas)

    def evals_of(stacks, z_b):
        out = {}
        for name, stack in stacks.items():
            y = _eval_b(stack, z_b)                     # (k, L, 1)
            out[name] = [int(v) for v in lf.decode(
                jnp.swapaxes(y, 0, 2).reshape(lf.L, k))]
        return out

    evals_beta = evals_of(beta_stacks, beta_b)
    evals_gamma = evals_of(gamma_stacks, gamma_b)

    for p, tr in enumerate(trs):
        tr.absorb_fr(*[evals_beta[kk][p] for kk in BETA_POLYS])
        tr.absorb_fr(*[evals_gamma[kk][p] for kk in GAMMA_POLYS])
    xi1s = [tr.challenge() for tr in trs]
    xi2s = [tr.challenge() for tr in trs]

    def batch_open(stacks, names, z_b, xi_list):
        max_len = max(stacks[nm].shape[2] for nm in names)
        stacked = jnp.stack([_pad_b(stacks[nm], max_len) for nm in names], axis=2)
        gpows = jax.vmap(lambda z: lf.powers(z, len(names)))(_const_b(xi_list))
        acc = jax.vmap(pl.fold_stack)(stacked, gpows)
        q_b, _ = _divide_by_linear_b(acc, z_b)
        return _commit_batch(srs, q_b)

    w_betas = batch_open(beta_stacks, BETA_POLYS, beta_b, xi1s)
    w_gammas = batch_open(gamma_stacks, GAMMA_POLYS, gamma_b, xi2s)

    proofs = []
    for p in range(k):
        proofs.append(
            Proof(
                commitments={name: pts[p] for name, pts in cms.items()},
                sigmas=(sigmas["A"][p], sigmas["B"][p], sigmas["C"][p]),
                sigma_s=sigma_s[p],
                evals_beta={kk: v[p] for kk, v in evals_beta.items()},
                evals_gamma={kk: v[p] for kk, v in evals_gamma.items()},
                w_beta=w_betas[p],
                w_gamma=w_gammas[p],
            )
        )
    return proofs
