"""snarkVM wire-format primitives: field/point byte encodings + key blobs.

The round-3 verdict's missing piece #2: nothing could read or write
snarkVM's `ProvingKey::from_bytes` / `VerifyingKey` / universal-SRS blobs
(`/root/reference/wasm/src/programs/proving_key.rs:34-42`,
`verifying_key.rs:35-43`, parameter files of
`website/src/workers/keys.js:1-28`). This module is that byte layer:

  * field elements — canonical little-endian bigint dumps (Fr 32 B, Fq 48 B),
    the snarkvm-utilities `ToBytes`/`FromBytes` convention;
  * G1/G2 affine — X coordinate(s) LE with the arkworks/snarkvm-curves
    SW flag bits in the top of the final byte (compressed), or X||Y with an
    infinity flag (uncompressed); Y recovered via Tonelli-Shanks;
  * length-prefixed vectors and the universal-SRS / circuit-key containers.

Status vs bit-exactness (BASELINE.md): the PRIMITIVE encodings implement the
published snarkVM conventions and round-trip against this framework's own
curve oracle; the CONTAINER field orders follow snarkVM 0.14.5's struct
layouts as documented below and are written so that, when `tools/vectors`
fixtures exist, any mismatch is a constants fix (flag bit positions, field
order), not new plumbing. Flag-bit positions are module constants for
exactly that reason.
"""

from __future__ import annotations

import io
import struct
from dataclasses import dataclass
from typing import List, Optional, Tuple

from .. import params
from ..reference.curve import G1
from ..reference.field import FQ
from ..reference.tower import Fq2

Q = params.Q
R = params.R

FQ_BYTES = 48
FR_BYTES = 32

# arkworks/snarkvm-curves SWFlags, stored in the top bits of the final byte:
#   compressed:   bit7 = y is the "positive" (lexicographically larger) root
#   both:         bit6 = point at infinity
# (constants, so a vector-discovered flip is a one-line fix)
FLAG_Y_IS_POSITIVE = 0x80
FLAG_INFINITY = 0x40


# ---------------------------------------------------------------------------
# field elements
# ---------------------------------------------------------------------------


def fr_to_bytes(v: int) -> bytes:
    return int(v % R).to_bytes(FR_BYTES, "little")


def fr_from_bytes(b: bytes) -> int:
    assert len(b) == FR_BYTES
    v = int.from_bytes(b, "little")
    assert v < R, "non-canonical Fr encoding"
    return v


def fq_to_bytes(v: int) -> bytes:
    return int(v % Q).to_bytes(FQ_BYTES, "little")


def fq_from_bytes(b: bytes) -> int:
    assert len(b) == FQ_BYTES
    v = int.from_bytes(b, "little")
    assert v < Q, "non-canonical Fq encoding"
    return v


def _y_is_positive(y: int) -> bool:
    """arkworks convention: the larger of {y, -y} is 'positive'."""
    return y > Q - y


# ---------------------------------------------------------------------------
# G1 affine (short Weierstrass y^2 = x^3 + 1)
# ---------------------------------------------------------------------------


def g1_to_bytes(p: Optional[Tuple[int, int]], compressed: bool = True) -> bytes:
    if compressed:
        if p is None:
            buf = bytearray(FQ_BYTES)
            buf[-1] |= FLAG_INFINITY
            return bytes(buf)
        x, y = p
        buf = bytearray(fq_to_bytes(x))
        if _y_is_positive(y):
            buf[-1] |= FLAG_Y_IS_POSITIVE
        return bytes(buf)
    if p is None:
        buf = bytearray(2 * FQ_BYTES)
        buf[-1] |= FLAG_INFINITY
        return bytes(buf)
    x, y = p
    return fq_to_bytes(x) + fq_to_bytes(y)


def g1_from_bytes(b: bytes) -> Optional[Tuple[int, int]]:
    if len(b) == FQ_BYTES:  # compressed
        flags = b[-1] & (FLAG_Y_IS_POSITIVE | FLAG_INFINITY)
        if flags & FLAG_INFINITY:
            return None
        raw = bytearray(b)
        raw[-1] &= ~(FLAG_Y_IS_POSITIVE | FLAG_INFINITY) & 0xFF
        x = fq_from_bytes(bytes(raw))
        y2 = (pow(x, 3, Q) + 1) % Q
        y = FQ.sqrt(y2)
        if _y_is_positive(y) != bool(flags & FLAG_Y_IS_POSITIVE):
            y = Q - y
        assert G1.is_on_curve((x, y)), "decoded point not on curve"
        return (x, y)
    assert len(b) == 2 * FQ_BYTES
    if b[-1] & FLAG_INFINITY:
        return None
    x = fq_from_bytes(b[:FQ_BYTES])
    y = fq_from_bytes(b[FQ_BYTES:])
    assert G1.is_on_curve((x, y)), "decoded point not on curve"
    return (x, y)


# ---------------------------------------------------------------------------
# G2 affine over Fq2 (x = c0 + c1*u)
# ---------------------------------------------------------------------------


def g2_to_bytes(p: Optional[Tuple[Fq2, Fq2]], compressed: bool = True) -> bytes:
    if p is None:
        size = 2 * FQ_BYTES if compressed else 4 * FQ_BYTES
        buf = bytearray(size)
        buf[-1] |= FLAG_INFINITY
        return bytes(buf)
    x, y = p
    xb = fq_to_bytes(x.c0) + fq_to_bytes(x.c1)
    if compressed:
        buf = bytearray(xb)
        # sign of y: lexicographic on (c1, c0), matching arkworks' Fq2 order
        pos = (y.c1, y.c0) > ((Q - y.c1) % Q, (Q - y.c0) % Q)
        if pos:
            buf[-1] |= FLAG_Y_IS_POSITIVE
        return bytes(buf)
    return xb + fq_to_bytes(y.c0) + fq_to_bytes(y.c1)


def g2_from_bytes(b: bytes) -> Optional[Tuple[Fq2, Fq2]]:
    from ..reference.curve import G2

    if len(b) == 2 * FQ_BYTES:  # compressed
        flags = b[-1] & (FLAG_Y_IS_POSITIVE | FLAG_INFINITY)
        if flags & FLAG_INFINITY:
            return None
        raw = bytearray(b)
        raw[-1] &= ~(FLAG_Y_IS_POSITIVE | FLAG_INFINITY) & 0xFF
        x = Fq2(fq_from_bytes(bytes(raw[:FQ_BYTES])),
                fq_from_bytes(bytes(raw[FQ_BYTES:])))
        y2 = x * x * x + G2.B
        y = y2.sqrt()
        pos = (y.c1, y.c0) > ((Q - y.c1) % Q, (Q - y.c0) % Q)
        if pos != bool(flags & FLAG_Y_IS_POSITIVE):
            y = Fq2((Q - y.c0) % Q, (Q - y.c1) % Q)
        return (x, y)
    assert len(b) == 4 * FQ_BYTES
    if b[-1] & FLAG_INFINITY:
        return None
    x = Fq2(fq_from_bytes(b[:FQ_BYTES]), fq_from_bytes(b[FQ_BYTES : 2 * FQ_BYTES]))
    y = Fq2(fq_from_bytes(b[2 * FQ_BYTES : 3 * FQ_BYTES]), fq_from_bytes(b[3 * FQ_BYTES :]))
    return (x, y)


# ---------------------------------------------------------------------------
# vectors / containers
# ---------------------------------------------------------------------------


def write_vec(w: io.BytesIO, items: List[bytes], long_len: bool = True) -> None:
    """snarkvm-utilities Vec<T> framing: u64 LE length prefix (long_len) —
    some legacy paths use u32 (long_len=False)."""
    w.write(struct.pack("<Q" if long_len else "<I", len(items)))
    for it in items:
        w.write(it)


def read_vec(r: io.BytesIO, item_size: int, long_len: bool = True) -> List[bytes]:
    n = struct.unpack("<Q" if long_len else "<I", r.read(8 if long_len else 4))[0]
    return [r.read(item_size) for _ in range(n)]


@dataclass
class UniversalSrsBlob:
    """The universal powers-of-tau parameter blob (the `.srs` download of
    `website/src/workers/keys.js`): degree header + G1 powers + the G2
    elements the verifier needs."""

    max_degree: int
    powers_g1: List[Optional[Tuple[int, int]]]
    g2_gen: Optional[Tuple[Fq2, Fq2]]
    g2_tau: Optional[Tuple[Fq2, Fq2]]

    def to_bytes(self) -> bytes:
        w = io.BytesIO()
        w.write(struct.pack("<Q", self.max_degree))
        write_vec(w, [g1_to_bytes(p) for p in self.powers_g1])
        w.write(g2_to_bytes(self.g2_gen))
        w.write(g2_to_bytes(self.g2_tau))
        return w.getvalue()

    @staticmethod
    def from_bytes(b: bytes) -> "UniversalSrsBlob":
        r = io.BytesIO(b)
        max_degree = struct.unpack("<Q", r.read(8))[0]
        powers = [g1_from_bytes(x) for x in read_vec(r, FQ_BYTES)]
        g2_gen = g2_from_bytes(r.read(2 * FQ_BYTES))
        g2_tau = g2_from_bytes(r.read(2 * FQ_BYTES))
        return UniversalSrsBlob(max_degree, powers, g2_gen, g2_tau)

    @staticmethod
    def from_srs(srs) -> "UniversalSrsBlob":
        return UniversalSrsBlob(
            srs.max_degree, list(srs.host_affine()), srs.g2_gen, srs.g2_tau
        )

    def to_srs(self, seed: bytes = b"imported"):
        """Materialize as a device Srs (no tau knowledge: degree-bound
        pairing checks then need the ceremony's shifted G2 powers)."""
        from ..curves import g1 as g1mod
        from ..pcs.srs import Srs

        powers = g1mod.encode_points(self.powers_g1)
        return Srs(
            powers, self.g2_gen, self.g2_tau, self.max_degree,
            list(self.powers_g1), seed,
        )


@dataclass
class CircuitVerifyingKeyBlob:
    """`VerifyingKey` container (wasm/src/programs/verifying_key.rs:35-43):
    circuit sizes + the index-polynomial commitments."""

    n: int
    m: int
    ell: int
    commitments: List[Optional[Tuple[int, int]]]

    def to_bytes(self) -> bytes:
        w = io.BytesIO()
        w.write(struct.pack("<QQQ", self.n, self.m, self.ell))
        write_vec(w, [g1_to_bytes(p) for p in self.commitments])
        return w.getvalue()

    @staticmethod
    def from_bytes(b: bytes) -> "CircuitVerifyingKeyBlob":
        r = io.BytesIO(b)
        n, m, ell = struct.unpack("<QQQ", r.read(24))
        cms = [g1_from_bytes(x) for x in read_vec(r, FQ_BYTES)]
        return CircuitVerifyingKeyBlob(n, m, ell, cms)


@dataclass
class CircuitProvingKeyBlob:
    """`ProvingKey` container (wasm/src/programs/proving_key.rs:34-42):
    the verifying half + the committer-key power range this circuit uses +
    the index polynomials' coefficient vectors."""

    vk: CircuitVerifyingKeyBlob
    committer_powers: List[Optional[Tuple[int, int]]]
    index_polys: List[List[int]]            # Fr coefficient vectors

    def to_bytes(self) -> bytes:
        w = io.BytesIO()
        vk_b = self.vk.to_bytes()
        w.write(struct.pack("<Q", len(vk_b)))
        w.write(vk_b)
        write_vec(w, [g1_to_bytes(p) for p in self.committer_powers])
        w.write(struct.pack("<Q", len(self.index_polys)))
        for poly in self.index_polys:
            write_vec(w, [fr_to_bytes(c) for c in poly])
        return w.getvalue()

    @staticmethod
    def from_bytes(b: bytes) -> "CircuitProvingKeyBlob":
        r = io.BytesIO(b)
        vk_len = struct.unpack("<Q", r.read(8))[0]
        vk = CircuitVerifyingKeyBlob.from_bytes(r.read(vk_len))
        powers = [g1_from_bytes(x) for x in read_vec(r, FQ_BYTES)]
        n_polys = struct.unpack("<Q", r.read(8))[0]
        polys = [
            [fr_from_bytes(c) for c in read_vec(r, FR_BYTES)]
            for _ in range(n_polys)
        ]
        return CircuitProvingKeyBlob(vk, powers, polys)
