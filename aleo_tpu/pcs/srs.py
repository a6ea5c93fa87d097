"""Structured reference string (powers-of-tau) generation and caching.

The reference downloads Aleo's universal SRS from
`https://testnet3.parameters.aleo.org/` (SURVEY.md §2.8 item 8;
`/root/reference/website/src/workers/keys.js:1-28`). This container has zero
egress, so the framework generates its own SRS deterministically from a seed
(simulated trusted setup) and persists it under ~/.aleo_tpu/srs — the same
role as the reference's parameter cache. A byte-format loader hook
(`Srs.from_file` / `Srs.save`) covers the "bring your own ceremony output"
path.

Generation is device-accelerated: tau powers are host scalars (cheap), the
point powers [tau^i]G come from a fixed-base window table (host, one-time)
combined on device with gathers + a log-tree of point additions.
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

_CACHE_DIR = os.path.expanduser("~/.aleo_tpu/srs")

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


@jax.jit
def _combine_windows(table: G1Points, digits: jnp.ndarray) -> G1Points:
    """table: (NWIN, 256) points; digits: (N, NWIN) uint32.
    Returns (N,) points sum_w T[w][digits[i, w]] via log-tree addition."""
    tx = table.x[jnp.arange(NWIN)[None, :], digits]  # (N, NWIN, L)
    ty = table.y[jnp.arange(NWIN)[None, :], digits]
    tz = table.z[jnp.arange(NWIN)[None, :], digits]
    p = G1Points(tx, ty, tz)
    w = NWIN
    while w > 1:
        half = w // 2
        p = g1.add(
            G1Points(p.x[:, :half], p.y[:, :half], p.z[:, :half]),
            G1Points(p.x[:, half : 2 * half], p.y[:, half : 2 * half], p.z[:, half : 2 * half]),
        )
        w = half
    return G1Points(p.x[:, 0], p.y[:, 0], p.z[:, 0])


def _batch_fixed_base(scalars, base):
    """[k_i * base] for host scalars, computed on device. Returns affine
    G1Points batch (z==1; identity encoded as z==0)."""
    table_host = _fixed_base_table(base)
    flat = [pt for row in table_host for pt in row]
    table = g1.encode_points(flat)
    table = G1Points(
        table.x.reshape(NWIN, 256, -1),
        table.y.reshape(NWIN, 256, -1),
        table.z.reshape(NWIN, 256, -1),
    )
    digits = np.zeros((len(scalars), NWIN), dtype=np.uint32)
    for i, k in enumerate(scalars):
        kk = k % R
        for w in range(NWIN):
            digits[i, w] = (kk >> (WINDOW_C * w)) & 0xFF
    proj = _combine_windows(table, jnp.asarray(digits))
    return jax.jit(g1.to_affine)(proj)


@dataclass
class Srs:
    """Universal KZG SRS: [tau^i]G in G1 (device), [tau]H in G2 (host)."""

    powers: G1Points            # (max_degree+1,) affine device points
    g2_gen: tuple               # host G2 affine
    g2_tau: tuple               # host G2 affine
    max_degree: int

    @staticmethod
    def generate(max_degree: int, seed: bytes = b"aleo-tpu-srs") -> "Srs":
        tau = int.from_bytes(hashlib.sha512(seed).digest(), "little") % R
        taus = []
        acc = 1
        for _ in range(max_degree + 1):
            taus.append(acc)
            acc = acc * tau % R
        powers = _batch_fixed_base(taus, G1.generator())
        h = G2.generator()
        return Srs(powers, h, G2.mul(tau, h), max_degree)

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
        )


def _fq2_pt_to_ints(p):
    (x, y) = p
    return (x.c0, x.c1, y.c0, y.c1)


def _ints_to_fq2_pt(t):
    return (Fq2(t[0], t[1]), Fq2(t[2], t[3]))
