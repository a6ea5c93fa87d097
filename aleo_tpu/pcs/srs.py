"""Structured reference string (powers-of-tau) generation and caching.

The reference downloads Aleo's universal SRS from
`https://testnet3.parameters.aleo.org/` (SURVEY.md §2.8 item 8;
`/root/reference/website/src/workers/keys.js:1-28`). This container has zero
egress, so the framework generates its own SRS deterministically from a seed
(simulated trusted setup) and persists it under ~/.aleo_tpu/srs — the same
role as the reference's parameter cache. A byte-format loader hook
(`Srs.from_file` / `Srs.save`) covers the "bring your own ceremony output"
path.

Generation runs on the host (jacobian fixed-base windows): compile-free,
backend-independent, and cached on disk; it also produces the host-affine
copies that the CPU-backend MSM fallback and verifier-side algebra use.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .. import params
from ..curves import g1
from ..curves.g1 import G1Points
from ..fields.modring import FR_RING, ints_to_limbs
from ..reference.curve import G1, G2
from ..reference.tower import Fq2

R = params.R

from ..config import SRS_DIR as _CACHE_DIR

WINDOW_C = 8
NWIN = -(-params.R.bit_length() // WINDOW_C)  # 32


def _fixed_base_table(base):
    """Host window table T[w][d] = d * 2^(8w) * base, shape (NWIN, 256)."""
    table = []
    cur = base  # 2^(8w) * G
    for _ in range(NWIN):
        row = [None]
        acc = None
        for _ in range(255):
            acc = G1.add(acc, cur)
            row.append(acc)
        table.append(row)
        for _ in range(WINDOW_C):
            cur = G1.add(cur, cur)
    return table


def _batch_fixed_base_host(scalars, base):
    """Host windowed fixed-base: [k_i * base] as affine host points.

    The CPU-backend path (XLA:CPU loses to python bigints on the group law);
    jacobian accumulation, one batched affine conversion at the end.
    """
    from ..reference.msm import _jac_to_affine, _jadd_affine

    table = _fixed_base_table(base)
    out = []
    for k in scalars:
        kk = k % R
        acc = None
        for w in range(NWIN):
            d = (kk >> (WINDOW_C * w)) & 0xFF
            if d:
                acc = _jadd_affine(acc, table[w][d])
        out.append(_jac_to_affine(acc))
    return out


@dataclass
class Srs:
    """Universal KZG SRS: [tau^i]G in G1 (device), [tau]H in G2 (host)."""

    powers: G1Points            # (max_degree+1,) affine device points
    g2_gen: tuple               # host G2 affine
    g2_tau: tuple               # host G2 affine
    max_degree: int
    _host_pts: list | None = None   # lazy host affine [(x, y) | None]
    seed: bytes = b"aleo-tpu-srs"   # simulated-setup seed (tau derivation)

    def g2_power(self, s: int):
        """[tau^s]H in G2 — the degree-bound pairing check's right side.

        A real ceremony ships these per circuit (one per degree bound);
        this simulated setup re-derives tau from its seed on demand and
        caches per exponent.
        """
        cache = getattr(self, "_g2_pow_cache", None)
        if cache is None:
            cache = {}
            object.__setattr__(self, "_g2_pow_cache", cache)
        if s not in cache:
            tau = int.from_bytes(hashlib.sha512(self.seed).digest(), "little") % R
            cache[s] = G2.mul(pow(tau, s, R), self.g2_gen)
        return cache[s]

    def host_affine(self) -> list:
        """Host affine copies of the powers (cached; feeds the host MSM
        fallback used off-TPU)."""
        if self._host_pts is None:
            from ..curves.g1_fused import decode_lf, from_points

            self._host_pts = decode_lf(from_points(self.powers))
        return self._host_pts

    @staticmethod
    def generate(max_degree: int, seed: bytes = b"aleo-tpu-srs") -> "Srs":
        tau = int.from_bytes(hashlib.sha512(seed).digest(), "little") % R
        taus = []
        acc = 1
        for _ in range(max_degree + 1):
            taus.append(acc)
            acc = acc * tau % R
        # Host fixed-base generation on every backend: compile-free (the
        # device einsum tree costs minutes of XLA compile per SRS size),
        # deterministic, and it populates the host-affine cache that the
        # CPU-backend MSM fallback and the verifier-side algebra use.
        host_pts = _batch_fixed_base_host(taus, G1.generator())
        from ..curves import g1 as g1mod

        powers = g1mod.encode_points(host_pts)
        h = G2.generator()
        return Srs(powers, h, G2.mul(tau, h), max_degree, host_pts, seed)

    @staticmethod
    def load_or_generate(max_degree: int, seed: bytes = b"aleo-tpu-srs") -> "Srs":
        os.makedirs(_CACHE_DIR, exist_ok=True)
        key = hashlib.sha256(seed + max_degree.to_bytes(8, "little")).hexdigest()[:16]
        path = os.path.join(_CACHE_DIR, f"srs_{max_degree}_{key}.pkl")
        if os.path.exists(path):
            return Srs.from_file(path)
        srs = Srs.generate(max_degree, seed)
        srs.save(path)
        return srs

    def save(self, path: str) -> None:
        blob = {
            "x": np.asarray(self.powers.x),
            "y": np.asarray(self.powers.y),
            "z": np.asarray(self.powers.z),
            "g2_gen": _fq2_pt_to_ints(self.g2_gen),
            "g2_tau": _fq2_pt_to_ints(self.g2_tau),
            "max_degree": self.max_degree,
            "host_pts": self._host_pts,
            "seed": self.seed,
        }
        with open(path, "wb") as f:
            pickle.dump(blob, f)

    @staticmethod
    def from_file(path: str) -> "Srs":
        with open(path, "rb") as f:
            blob = pickle.load(f)
        powers = G1Points(
            jnp.asarray(blob["x"]), jnp.asarray(blob["y"]), jnp.asarray(blob["z"])
        )
        return Srs(
            powers,
            _ints_to_fq2_pt(blob["g2_gen"]),
            _ints_to_fq2_pt(blob["g2_tau"]),
            blob["max_degree"],
            blob.get("host_pts"),
            blob.get("seed", b"aleo-tpu-srs"),
        )


def _fq2_pt_to_ints(p):
    (x, y) = p
    return (x.c0, x.c1, y.c0, y.c1)


def _ints_to_fq2_pt(t):
    return (Fq2(t[0], t[1]), Fq2(t[2], t[3]))
