"""KZG polynomial commitments on TPU (commit/open/batch-open) + host verify.

TPU-native counterpart of the polynomial-commitment layer underneath
snarkVM's Varuna (`snarkvm-algorithms` snark/kzg modules; surfaced in the
reference as `ProvingKey`/`VerifyingKey` bytes —
`/root/reference/wasm/src/programs/proving_key.rs:34-42`). Commitments and
opening proofs are MSMs over the SRS (the prover hot path, on device);
verification is host-side pairing algebra (not hot; mirrors the reference
verifying on CPU).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .. import params
from ..curves import g1
from ..curves.g1 import G1Points
from ..fields.modring import FR_RING as F
from ..msm.msm import make_table, msm, msm_fast_host
from ..reference.curve import G1, G2, pairing_check
from . import poly_device as pd
from . import poly_lf as pl_lf
from .srs import Srs

R = params.R

_from_mont_j = jax.jit(F.from_mont)


@jax.jit
def _from_mont_lf_j(a):
    from ..fields import fr_lf as flf

    return flf.from_mont(a)


@jax.jit
def _fold_stack(stack: jnp.ndarray, gpows: jnp.ndarray) -> jnp.ndarray:
    """sum_k gpows[k] * stack[k]: (k, n, L), (k, L) -> (n, L)."""
    weighted = F.mul(stack, gpows[:, None, :])
    return pd.tree_sum(weighted, axis=0)


def _slice_powers(srs: Srs, n: int) -> G1Points:
    return G1Points(srs.powers.x[:n], srs.powers.y[:n], srs.powers.z[:n])


def commit(srs: Srs, coeffs: jnp.ndarray, c: int | None = None) -> G1Points:
    """Commit to a coefficient vector (n, L) Montgomery limbs: C = sum c_i [tau^i]G.

    The length is padded up to a power of two so MSM kernels are compiled
    once per size class rather than once per polynomial degree.
    """
    n = coeffs.shape[0]
    assert n <= srs.max_degree + 1, "polynomial exceeds SRS degree"
    n_pad = min(1 << max(2, (n - 1).bit_length()), srs.max_degree + 1)
    coeffs = pd.pad_to(coeffs, max(n, n_pad))
    raw = _from_mont_j(coeffs)
    return msm(raw, _slice_powers(srs, coeffs.shape[0]), c=c)


def commit_host(srs: Srs, coeffs: jnp.ndarray, c: int | None = None):
    """Commit and decode: device bucket pipeline + host window combine.

    Skips the sequential on-device Horner window-combine (cheaper as host
    bigint math; the prover absorbs commitments into the host Fiat-Shamir
    transcript anyway — see msm.msm_fast_host).

    Off-TPU the whole MSM runs on host bigints (jacobian Pippenger): XLA:CPU
    loses to python on the bigint group law by >10x, and the CPU backend only
    serves tests/dev anyway.
    """
    n = coeffs.shape[0]
    assert n <= srs.max_degree + 1, "polynomial exceeds SRS degree"
    if jax.default_backend() != "tpu":
        from ..reference.msm import msm_pippenger_jac

        ints = [int(v) for v in F.decode(coeffs)]
        pts = srs.host_affine()[:n]
        return msm_pippenger_jac(ints, pts, c=8)
    n_pad = min(1 << max(2, (n - 1).bit_length()), srs.max_degree + 1)
    coeffs = pd.pad_to(coeffs, max(n, n_pad))
    raw = _from_mont_j(coeffs)
    table = make_table(_slice_powers(srs, coeffs.shape[0]))
    return msm_fast_host(raw, table, c=c)


def open_at(srs: Srs, coeffs: jnp.ndarray, z: jnp.ndarray, c: int | None = None):
    """Opening proof W = [q(tau)]G with q = (p - p(z))/(X - z).

    Returns (W: host affine point, y: (L,) Montgomery evaluation).
    """
    q, y = pd.divide_by_linear_via_domain(coeffs, z)
    w = commit_host(srs, q, c=c)
    return w, y


def verify(srs: Srs, commitment, z: int, y: int, proof_w) -> bool:
    """Host pairing check: e(C - yG, H) == e(W, [tau]H - zH), i.e.
    e(C - yG, H) * e(-W, tauH - zH) == 1."""
    c_minus_y = G1.add(commitment, G1.neg(G1.mul(y, G1.generator())))
    tau_minus_z = G2.add(srs.g2_tau, G2.neg(G2.mul(z, srs.g2_gen)))
    return pairing_check(
        [(c_minus_y, srs.g2_gen), (G1.neg(proof_w), tau_minus_z)]
    )


def batch_open_at(
    srs: Srs,
    polys: Sequence[jnp.ndarray],
    z: jnp.ndarray,
    gamma: jnp.ndarray,
    c: int | None = None,
):
    """Single opening proof for many polynomials at one point via a random
    linear combination sum gamma^i p_i. Returns (W host point, [y_i] Mont).

    gamma comes from the Fiat-Shamir transcript AFTER the evaluations are
    absorbed (standard batching).
    """
    ys = [pd.eval_coeffs(p, z) for p in polys]
    # fold polynomials: sum gamma^i p_i — stacked mul + one scan-reduction
    max_len = max(p.shape[0] for p in polys)
    stack = jnp.stack([pd.pad_to(p, max_len) for p in polys])  # (k, n, L)
    gpows = pd.powers(gamma, len(polys))                        # (k, L)
    acc = _fold_stack(stack, gpows)
    w, _ = open_at(srs, acc, z, c=c)
    return w, ys


# -- limbs-first API (prover pipeline; (L, n) coefficient arrays) ------------


def commit_lf(srs: Srs, coeffs_lf: jnp.ndarray, c: int | None = None):
    """Commit a limbs-first (L, n) coefficient array -> host affine point.

    TPU: from_mont (lazy ok — group order r absorbs the +r ambiguity, and
    digits cover 254 bits) -> device bucket MSM -> host window combine.
    CPU: host bigint jacobian Pippenger (beats XLA:CPU >10x on the group law).
    """
    from ..fields import fr_lf as flf
    from ..utils import profiling as prof

    n = coeffs_lf.shape[1]
    assert n <= srs.max_degree + 1, "polynomial exceeds SRS degree"
    prof.counter("kzg/commit_points", n)
    if jax.default_backend() != "tpu":
        ints = [int(v) for v in flf.decode(coeffs_lf)]
        pts = srs.host_affine()[:n]
        from ..reference.msm import msm_pippenger_jac

        return msm_pippenger_jac(ints, pts, c=8)
    with prof.stage("kzg/commit"):
        n_pad = min(1 << max(2, (n - 1).bit_length()), srs.max_degree + 1)
        coeffs_lf = pl_lf.pad_to(coeffs_lf, max(n, n_pad))
        raw = _from_mont_lf_j(coeffs_lf).T
        if _use_fixed_base(coeffs_lf.shape[1]):
            from ..msm import fixed_base

            ft = fixed_base.srs_table(srs, coeffs_lf.shape[1], 0)
            return fixed_base.msm_fixed_host(raw, ft)
        table = make_table(_slice_powers(srs, coeffs_lf.shape[1]))
        return msm_fast_host(raw, table, c=c)


def commit_shifted_lf(srs: Srs, coeffs_lf: jnp.ndarray, shift: int,
                      c: int | None = None):
    """Commit to X^shift * p(X) without materializing the zero prefix:
    an MSM of p's coefficients against SRS points [shift, shift+n).

    The degree-bound commitments (Marlin shifted trick, snark/prover.py)
    are X^(D-d) * g with D the SRS degree — committing the dense vector
    costs a degree-D MSM; this is the same group element from an n-point
    MSM.
    """
    from ..fields import fr_lf as flf

    n = coeffs_lf.shape[1]
    assert shift + n <= srs.max_degree + 1, "shifted polynomial exceeds SRS"
    if jax.default_backend() != "tpu":
        from ..reference.msm import msm_pippenger_jac

        ints = [int(v) for v in flf.decode(coeffs_lf)]
        pts = srs.host_affine()[shift : shift + n]
        return msm_pippenger_jac(ints, pts, c=8)
    n_pad = min(1 << max(2, (n - 1).bit_length()), srs.max_degree + 1 - shift)
    coeffs_lf = pl_lf.pad_to(coeffs_lf, max(n, n_pad))
    raw = _from_mont_lf_j(coeffs_lf).T
    m = coeffs_lf.shape[1]
    if _use_fixed_base(m):
        from ..msm import fixed_base

        ft = fixed_base.srs_table(srs, m, shift)
        return fixed_base.msm_fixed_host(raw, ft)
    table = make_table(G1Points(
        srs.powers.x[shift : shift + m],
        srs.powers.y[shift : shift + m],
        srs.powers.z[shift : shift + m],
    ))
    return msm_fast_host(raw, table, c=c)


def _use_fixed_base(n: int) -> bool:
    from .. import config

    if config.FIXED_BASE_MODE in ("0", "false"):
        return False
    if config.FIXED_BASE_MODE == "1":
        return True
    return jax.default_backend() == "tpu" and n >= config.FIXED_BASE_MIN_N


def commit_many_lf(srs: Srs, polys_lf, c: int | None = None, shift: int = 0):
    """Commit a list of limbs-first polynomials, grouped by padded size.

    Each size group rides ONE fixed-base multi-MSM over a precomputed
    per-window shifted SRS table (msm/fixed_base.py) — shared sort, shared
    bucket rounds, no window combine, and zero-padding up to the size class
    is free (zero digits sort out of the queried bucket range). Groups below
    the fixed-base threshold share a variable-base gather table and read
    every window total back in a single host transfer. shift > 0 commits
    X^shift * p_i against the sliced SRS (shared-offset degree-bound
    commitments).
    """
    if jax.default_backend() != "tpu" and not _use_fixed_base(0):
        if shift:
            return [commit_shifted_lf(srs, p, shift, c=c) for p in polys_lf]
        return [commit_lf(srs, p, c=c) for p in polys_lf]

    def pad_size(n):
        np_ = min(1 << max(2, (n - 1).bit_length()), srs.max_degree + 1 - shift)
        return max(n, np_)

    from ..msm.msm import auto_c, combine_windows_host, msm_windows
    from ..msm import fixed_base
    from ..curves import g1_fused as gf
    from ..utils import profiling as prof

    groups = {}
    for i, p in enumerate(polys_lf):
        groups.setdefault(pad_size(p.shape[1]), []).append(i)
    out = [None] * len(polys_lf)
    for n_pad, idxs in groups.items():
        assert shift + n_pad <= srs.max_degree + 1
        if _use_fixed_base(n_pad):
            ft = fixed_base.srs_table(srs, n_pad, shift)
            k = len(idxs)
            # pad the group to a power-of-two batch: zero-scalar members add
            # no digit entries (only sort width), and the (size, k) compile
            # space collapses to a few shapes per class
            k_pad = 1 << max(0, (k - 1).bit_length())
            raws = [
                _from_mont_lf_j(pl_lf.pad_to(polys_lf[i], n_pad)).T
                for i in idxs
            ]
            raws += [jnp.zeros_like(raws[0])] * (k_pad - k)
            prof.counter("kzg/fixed_base_points", n_pad * k)
            pts = fixed_base.msm_fixed_batch_host(jnp.stack(raws), ft)
            for j, i in enumerate(idxs):
                out[i] = pts[j]
            continue
        table = make_table(G1Points(
            srs.powers.x[shift : shift + n_pad],
            srs.powers.y[shift : shift + n_pad],
            srs.powers.z[shift : shift + n_pad],
        ))
        # Sequential single MSMs over the shared table: the fused-add bucket
        # work scales linearly with the batch size, so the k-way multi-MSM
        # pipeline has no per-point advantage (measured 2737 ms for k=6 at
        # 2^15 vs 6 x 256 ms sequential on v5e) — but the per-window device
        # outputs of the whole group are read back in ONE transfer (each
        # readback costs a full tunnel round trip).
        cg = c if c is not None else auto_c(n_pad)
        wins = []
        for i in idxs:
            p = pl_lf.pad_to(polys_lf[i], n_pad)
            raw = _from_mont_lf_j(p).T
            wins.append(msm_windows(raw, table, c=cg))
        allw = gf.G1LF(
            jnp.concatenate([w.x for w in wins], axis=1),
            jnp.concatenate([w.y for w in wins], axis=1),
            jnp.concatenate([w.z for w in wins], axis=1),
        )
        W = wins[0].x.shape[1]
        import numpy as np

        # one device->host transfer for all three coordinate planes
        L3 = allw.x.shape[0]
        stacked = np.asarray(jnp.concatenate([allw.x, allw.y, allw.z], axis=0))
        host = (stacked[:L3], stacked[L3 : 2 * L3], stacked[2 * L3 :])
        for j, i in enumerate(idxs):
            out[i] = combine_windows_host(
                gf.G1LF(
                    host[0][:, j * W : (j + 1) * W],
                    host[1][:, j * W : (j + 1) * W],
                    host[2][:, j * W : (j + 1) * W],
                ),
                cg,
            )
    return out


def open_at_lf(srs: Srs, coeffs_lf: jnp.ndarray, z_lf: jnp.ndarray, c: int | None = None):
    """Opening proof W = [q(tau)]G, limbs-first. Returns (W host point,
    y (L, 1) Montgomery evaluation)."""
    q, y = pl_lf.divide_by_linear_via_domain(coeffs_lf, z_lf)
    w = commit_lf(srs, q, c=c)
    return w, y


def batch_open_at_lf(
    srs: Srs,
    polys_lf: Sequence[jnp.ndarray],
    z_lf: jnp.ndarray,
    gamma_lf: jnp.ndarray,
    c: int | None = None,
    compute_evals: bool = True,
):
    """Single opening proof for many limbs-first polynomials at one point via
    the random linear combination sum gamma^i p_i. Returns (W, [y_i]).

    compute_evals=False skips the per-polynomial evaluations (one device
    dispatch each) when the caller already holds them — the prover batches
    all evaluations in one dispatch before the transcript absorbs them."""
    from ..fields import fr_lf as flf

    ys = [pl_lf.eval_coeffs(p, z_lf) for p in polys_lf] if compute_evals else None
    max_len = max(p.shape[1] for p in polys_lf)
    stack = jnp.stack([pl_lf.pad_to(p, max_len) for p in polys_lf], axis=1)
    gpows = flf.powers(gamma_lf, len(polys_lf))          # (L, k)
    acc = pl_lf.fold_stack(stack, gpows)
    w, _ = open_at_lf(srs, acc, z_lf, c=c)
    return w, ys


def batch_verify(
    srs: Srs,
    commitments: Sequence,
    z: int,
    ys: Sequence[int],
    gamma: int,
    proof_w,
) -> bool:
    """Host verification of a batched opening."""
    acc_c = None
    acc_y = 0
    gp = 1
    for cm, y in zip(commitments, ys):
        acc_c = G1.add(acc_c, G1.mul(gp, cm))
        acc_y = (acc_y + gp * y) % R
        gp = gp * gamma % R
    return verify(srs, acc_c, z, acc_y, proof_w)
