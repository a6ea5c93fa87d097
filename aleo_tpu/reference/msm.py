"""Host-side multi-scalar multiplication oracle (naive + Pippenger).

Oracle for `aleo_tpu/msm` TPU kernels (SURVEY.md §2.8 item 3 — the
`snarkvm-algorithms` MSM the reference delegates to).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from .curve import G1


def msm_naive(scalars: List[int], points: List) -> Optional[Tuple[int, int]]:
    acc = None
    for k, P in zip(scalars, points):
        if k and P is not None:
            acc = G1.add(acc, G1.mul(k, P))
    return acc


def msm_pippenger(scalars: List[int], points: List, c: int = 8):
    """Windowed bucket method — structurally mirrors the TPU formulation."""
    from .. import params

    nbits = params.R.bit_length()
    windows = (nbits + c - 1) // c
    result = None
    for w in range(windows - 1, -1, -1):
        if result is not None:
            for _ in range(c):
                result = G1.add(result, result)
        buckets = [None] * (1 << c)
        for k, P in zip(scalars, points):
            digit = (k >> (w * c)) & ((1 << c) - 1)
            if digit and P is not None:
                buckets[digit] = G1.add(buckets[digit], P)
        running, acc = None, None
        for b in range(len(buckets) - 1, 0, -1):
            running = G1.add(running, buckets[b])
            acc = G1.add(acc, running)
        result = G1.add(result, acc)
    return result
