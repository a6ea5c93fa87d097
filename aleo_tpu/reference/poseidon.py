"""Poseidon permutation/sponge over Fr — host oracle + parameter generation.

The reference uses snarkVM's Poseidon (`hash_psd2/4/8`) for password-based key
encryption (`/root/reference/rust/src/account/encryptor.rs:47,66`), record
commitments/encryption, and Fiat-Shamir inside the Varuna prover
(SURVEY.md §2.8 item 5). snarkVM's concrete round constants are not vendored
in the reference repo (the crates are pinned from crates.io, Cargo.lock only),
so this framework generates its Poseidon parameters with the standard Grain
LFSR procedure from the Poseidon reference design (Grassi et al.,
"generate_parameters_grain" algorithm), which is the same family of
instantiation snarkVM uses. The parameter set is pluggable: drop-in constants
can be loaded via `PoseidonParams.from_constants` if byte-compat with a
specific deployment is required.

Instantiation (matching snarkVM's shape): alpha = 17 (gcd(17, r-1) = 1),
R_F = 8 full rounds, R_P = 31 partial rounds, capacity 1, rates 2/4/8.
"""

from __future__ import annotations

import functools
from typing import List

from .. import params

R = params.R

ALPHA = 17
FULL_ROUNDS = 8
PARTIAL_ROUNDS = 31


class _GrainLFSR:
    """80-bit Grain LFSR from the Poseidon reference parameter generation."""

    def __init__(self, field_bits: int, t: int, r_f: int, r_p: int):
        bits = []

        def push(value: int, width: int):
            for i in range(width - 1, -1, -1):
                bits.append((value >> i) & 1)

        push(1, 2)          # field type: GF(p)
        push(0, 4)          # sbox: x^alpha
        push(field_bits, 12)
        push(t, 12)
        push(r_f, 10)
        push(r_p, 10)
        push((1 << 30) - 1, 30)
        assert len(bits) == 80
        self.state = bits
        for _ in range(160):
            self._next_bit_raw()

    def _next_bit_raw(self) -> int:
        s = self.state
        b = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        self.state = s[1:] + [b]
        return b

    def next_bit(self) -> int:
        # von Neumann-style filtering: emit second bit of a pair iff first is 1
        while True:
            b1 = self._next_bit_raw()
            b2 = self._next_bit_raw()
            if b1 == 1:
                return b2

    def field_element(self, modulus: int, nbits: int) -> int:
        while True:
            v = 0
            for _ in range(nbits):
                v = (v << 1) | self.next_bit()
            if v < modulus:
                return v


class PoseidonParams:
    def __init__(self, rate: int, ark: List[List[int]], mds: List[List[int]]):
        self.rate = rate
        self.t = rate + 1
        self.alpha = ALPHA
        self.full_rounds = FULL_ROUNDS
        self.partial_rounds = PARTIAL_ROUNDS
        self.ark = ark  # (R_F + R_P) x t round constants
        self.mds = mds  # t x t MDS matrix

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def standard(rate: int) -> "PoseidonParams":
        t = rate + 1
        nbits = R.bit_length()  # 253
        lfsr = _GrainLFSR(nbits, t, FULL_ROUNDS, PARTIAL_ROUNDS)
        n_rounds = FULL_ROUNDS + PARTIAL_ROUNDS
        ark = [[lfsr.field_element(R, nbits) for _ in range(t)] for _ in range(n_rounds)]
        # Cauchy MDS: M[i][j] = 1 / (x_i + y_j), x_i = i, y_j = t + j.
        mds = [[pow((i + t + j) % R, -1, R) for j in range(t)] for i in range(t)]
        return PoseidonParams(rate, ark, mds)

    @staticmethod
    def from_constants(rate: int, ark, mds) -> "PoseidonParams":
        return PoseidonParams(rate, ark, mds)


def permute(state: List[int], p: PoseidonParams) -> List[int]:
    t = p.t
    assert len(state) == t
    s = [x % R for x in state]
    half = p.full_rounds // 2
    total = p.full_rounds + p.partial_rounds
    for rnd in range(total):
        s = [(s[i] + p.ark[rnd][i]) % R for i in range(t)]
        if rnd < half or rnd >= half + p.partial_rounds:
            s = [pow(x, ALPHA, R) for x in s]
        else:
            s[0] = pow(s[0], ALPHA, R)
        s = [sum(p.mds[i][j] * s[j] for j in range(t)) % R for i in range(t)]
    return s


def domain_fe(domain: str) -> int:
    """Map a domain-separator string to an Fr element (little-endian bytes)."""
    return int.from_bytes(domain.encode()[:31], "little") % R


class PoseidonSponge:
    """Duplex sponge, capacity 1 (capacity slot carries the domain)."""

    def __init__(self, rate: int, domain: str = ""):
        self.p = PoseidonParams.standard(rate)
        self.rate = rate
        self.state = [0] * self.p.t
        self.state[0] = domain_fe(domain)
        self.pos = 0          # next absorb slot within the rate section
        self.squeeze_pos = rate  # force permutation on first squeeze

    def absorb(self, elements) -> None:
        for e in elements:
            if self.pos == self.rate:
                self.state = permute(self.state, self.p)
                self.pos = 0
            self.state[1 + self.pos] = (self.state[1 + self.pos] + e) % R
            self.pos += 1
        self.squeeze_pos = self.rate  # invalidate pending squeeze output

    def squeeze(self, n: int) -> List[int]:
        out = []
        for _ in range(n):
            if self.squeeze_pos == self.rate:
                self.state = permute(self.state, self.p)
                self.pos = 0
                self.squeeze_pos = 0
            out.append(self.state[1 + self.squeeze_pos])
            self.squeeze_pos += 1
        return out


def hash_psd(rate: int, inputs: List[int], domain: str = "AleoPoseidon") -> int:
    """hash_psd{2,4,8} analogue: absorb inputs, squeeze one element.

    Reference behavior: `N::hash_psd2(&[domain, ...])` at
    `/root/reference/rust/src/account/encryptor.rs:47`.
    """
    sp = PoseidonSponge(rate, domain=f"{domain}{rate}")
    sp.absorb([len(inputs)])  # length padding
    sp.absorb(inputs)
    return sp.squeeze(1)[0]
