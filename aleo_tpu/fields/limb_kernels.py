"""Limbs-first modular arithmetic primitives for Pallas TPU kernels.

TPU-native core of the prover's hot path, replacing the reference's
snarkvm-fields 64-bit-limb Montgomery arithmetic (SURVEY.md §2.8 item 1;
the snarkVM crate is pinned at /root/reference/Cargo.lock:2652-2668).

Layout: a field element batch is a (L, N) uint32 array of 16-bit limbs,
little-endian along axis 0, with the batch on the 128-wide TPU lane axis.
This keeps every vector op fully lane-utilized (the limbs-last layout of
`modring.py` wastes >80% of each vreg) and lets whole group-law formulas
fuse into one Pallas kernel with all intermediates in VMEM.

Numeric discipline ("lazy reduction"):
  * canonical inputs are < p; all kernel-internal values are kept < 2p,
  * Montgomery mul accepts operands < 2p and returns < 2p
    (valid because 4*p^2 <= R*p for both BLS12-377 Fq (R=2^384) and
    Fr (R=2^256)),
  * add/sub renormalize to < 2p with one conditional subtract of 2p,
  * `normalize` produces canonical < p values at batch boundaries.

Every function here is pure jnp on (rows, T) arrays and traces both inside
`pl.pallas_call` kernels (Mosaic) and as plain XLA (interpret/CPU paths).
All shifts are expressed as concatenations with zero blocks: Mosaic has no
lowering for dynamic_slice/scatter on kernel values.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

MASK = 0xFFFF
LIMB_BITS = 16


def _int_to_limbs_np(x: int, n: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.uint32)
    for i in range(n):
        out[i] = x & MASK
        x >>= LIMB_BITS
    assert x == 0
    return out


@dataclasses.dataclass(frozen=True)
class LimbRing:
    """Host-side constants for one prime, in limbs-first kernel form."""

    p: int
    L: int
    name: str

    def __post_init__(self):
        L, p = self.L, self.p
        R = 1 << (LIMB_BITS * L)
        assert 4 * p <= R, "lazy-reduction bound needs 4p <= R"
        object.__setattr__(self, "R", R)
        object.__setattr__(self, "nprime", (-pow(p, -1, R)) % R)
        rows = {
            "p": _int_to_limbs_np(p, L),
            "np": _int_to_limbs_np(self.nprime, L),
            # borrow-free complement rows: adding `comp2p - b` limbwise
            # computes  2p - b + R  (the +R exits as the dropped carry).
            "comp2p": _int_to_limbs_np(2 * p, L) + MASK + (np.arange(L) == 0),
            # v + compR2p = v - 2p + R: carry-out at the top <=> v >= 2p.
            "compR2p": (MASK - _int_to_limbs_np(2 * p, L)) + (np.arange(L) == 0),
            "compRp": (MASK - _int_to_limbs_np(p, L)) + (np.arange(L) == 0),
        }
        object.__setattr__(self, "rows", rows)
        object.__setattr__(
            self, "ROW_ORDER", ("p", "np", "comp2p", "compR2p", "compRp")
        )

    @property
    def n_const_rows(self) -> int:
        return self.L * len(self.ROW_ORDER)

    def const_block(self, tile: int) -> np.ndarray:
        """(5L, tile) uint32 constant block to feed a kernel as one input."""
        stack = np.concatenate([self.rows[k] for k in self.ROW_ORDER])
        return np.broadcast_to(stack[:, None], (stack.shape[0], tile)).copy()

    def unpack_consts(self, cref):
        """Slice a (5L, T) consts array back into named rows dict."""
        L = self.L
        out = {}
        for idx, k in enumerate(self.ROW_ORDER):
            out[k] = cref[idx * L : (idx + 1) * L]
        return out


FQ_LIMB = None  # initialized lazily below (params import cycle safety)
FR_LIMB = None


def _init_rings():
    global FQ_LIMB, FR_LIMB
    if FQ_LIMB is None:
        from .. import params

        FQ_LIMB = LimbRing(params.Q, params.FQ_LIMBS, "Fq")
        FR_LIMB = LimbRing(params.R, params.FR_LIMBS, "Fr")
    return FQ_LIMB, FR_LIMB


def get_fq() -> LimbRing:
    return _init_rings()[0]


def get_fr() -> LimbRing:
    return _init_rings()[1]


# ---------------------------------------------------------------------------
# carry machinery (all along axis 0)
# ---------------------------------------------------------------------------


def _zrows(x, r):
    return jnp.zeros((r,) + x.shape[1:], x.dtype)


def _align(row, like):
    """Broadcast a (K, T) constant row against a (K, ...) operand with extra
    trailing dims (the batched 3D shapes of the 4-step NTT / vmapped
    pipelines). No-op when ranks already match (the Pallas kernel case)."""
    if row.ndim < like.ndim:
        row = row.reshape(row.shape[:1] + (1,) * (like.ndim - 1))
    return row


def shift_rows(x, r, K):
    """Place x (Lx, T) at row offset r in a (K, T) zero background."""
    Lx = x.shape[0]
    parts = []
    if r > 0:
        parts.append(_zrows(x, r))
    take = min(Lx, K - r)
    parts.append(x[:take])
    tail = K - r - take
    if tail > 0:
        parts.append(_zrows(x, tail))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def ks_carry(cols, with_carry_out=False):
    """Normalize column values (each < 2^23) to 16-bit limbs.

    cols: (K, T) uint32. Kogge-Stone carry propagation along axis 0,
    unrolled (log2 K steps). Carry out of the top row is dropped (callers
    rely on this for mod-R semantics) unless with_carry_out, in which case
    (limbs, carry_out (1, T) uint32 in {0,1}) is returned.
    """
    K = cols.shape[0]
    lo = cols & MASK
    hi = cols >> LIMB_BITS
    s = lo + jnp.concatenate([_zrows(hi, 1), hi[: K - 1]], axis=0)
    d = s & MASK
    g = s >> LIMB_BITS  # in {0, 1}
    pr = (d == MASK).astype(jnp.uint32)
    sh = 1
    while sh < K:
        gs = jnp.concatenate([_zrows(g, sh), g[: K - sh]], axis=0)
        ps = jnp.concatenate([_zrows(pr, sh), pr[: K - sh]], axis=0)
        g = g | (pr & gs)
        pr = pr & ps
        sh *= 2
    c_in = jnp.concatenate([_zrows(g, 1), g[: K - 1]], axis=0)
    out = (d + c_in) & MASK
    if with_carry_out:
        top = g[K - 1 : K]
        # carry out of the top row also needs hi of the top column
        top = top | hi[K - 1 : K]  # hi top contributes directly (s drops it)
        return out, top
    return out


def conv_cols(a, b, K):
    """Raw schoolbook convolution columns of a*b.

    a: (La, T), b: (Lb, T) 16-bit limbs -> (K, T) uint32 column values,
    each < (La+Lb) * 2^16 (callers keep La+Lb <= 64 so values < 2^22).
    Offsets are grouped by residue mod 8 so intra-group shifts are
    sublane-tile aligned; only 8 arbitrary row shifts occur per call.
    """
    La = a.shape[0]
    acc = None
    for r in range(min(8, La)):
        grp = None
        for i in range(r, La, 8):
            p = a[i][None, :] * b
            lo = shift_rows(p & MASK, i - r, K)
            hi = shift_rows(p >> LIMB_BITS, i - r + 1, K)
            term = lo + hi
            grp = term if grp is None else grp + term
        shifted = shift_rows(grp, r, K) if r else grp
        if shifted.shape[0] > K:
            shifted = shifted[:K]
        acc = shifted if acc is None else acc + shifted
    return acc


# ---------------------------------------------------------------------------
# ring ops over kernel values; `c` is the dict from LimbRing.unpack_consts
# ---------------------------------------------------------------------------


def mont_mul(c, a, b):
    """Montgomery product a*b*R^-1. Operands < 4p, result < 2p.

    Full-radix formulation (one vv-convolution plus two constant
    convolutions); only t's low half is carried before the m step, the
    high half flows into u as raw columns.
    """
    L = a.shape[0]
    t_cols = conv_cols(a, b, 2 * L)  # < 2^22
    t_lo = ks_carry(t_cols[:L])  # digits of t mod R
    m = ks_carry(conv_cols(t_lo, _align(c["np"], a), L))  # (t*N') mod R
    u_cols = conv_cols(m, _align(c["p"], a), 2 * L) + t_cols  # < 2^23
    u = ks_carry(u_cols)
    return u[L:]


def mont_sq(c, a):
    return mont_mul(c, a, a)


def cond_sub_2p(c, v):
    """v < 4p -> v mod'2p' (subtract 2p once if v >= 2p)."""
    d, carry = ks_carry(v + _align(c["compR2p"], v), with_carry_out=True)
    return jnp.where(carry != 0, d, v)


def cond_sub_p(c, v):
    """v < 2p -> canonical v mod p."""
    d, carry = ks_carry(v + _align(c["compRp"], v), with_carry_out=True)
    return jnp.where(carry != 0, d, v)


def add(c, a, b):
    """a, b < 2p -> a+b mod'2p' (< 2p)."""
    return cond_sub_2p(c, ks_carry(a + b))


def sub(c, a, b):
    """a, b < 2p -> a-b mod'2p' (< 2p). Borrow-free complement form."""
    return cond_sub_2p(c, ks_carry((a + _align(c["comp2p"], a)) - b))


def neg(c, a):
    """a < 2p -> 2p - a (< 2p; == -a mod p)."""
    return ks_carry(_align(c["comp2p"], a) - a)


def mul3(c, a):
    """3a mod'2p' for the b3 constant of BLS12-377 (b = 1)."""
    return cond_sub_2p(c, cond_sub_2p(c, ks_carry(a + a + a)))


def normalize(c, v):
    """v < 2p -> canonical < p (for kernel outputs at batch boundaries)."""
    return cond_sub_p(c, cond_sub_2p(c, v))
