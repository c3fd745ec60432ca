"""Consensus sequence construction for insertion clusters.

Fills the reference's consensus gap: abPOA is declared as a submodule and
built by its Makefile but never referenced by any reference code
(SURVEY.md §2.14), and the disc-mode MSA step is a TODO
(discover.c:401).  There is therefore no reference behavior to match —
this module defines it:

  star-MSA consensus: pick the medoid sequence (by length), align every
  member to it with an affine-free banded edit DP, project member bases
  onto medoid columns, and take the per-column majority (gap majority
  deletes the column).

The scalar/host implementation below is the semantic anchor; the batched
TPU DP kernel (wavefront scan over anti-diagonals; see poa_dp_kernel) is
the performance path benchmarked as "POA DP cells/sec" (BASELINE.md).
"""
from __future__ import annotations

import numpy as np

_BASES = "ACGTN-"
_ENC = {c: i for i, c in enumerate("ACGTN")}

MATCH = 2
MISMATCH = -4
GAP = -2


def encode(seq: str) -> np.ndarray:
    return np.fromiter(
        (_ENC.get(c, 4) for c in seq.upper()), np.int8, len(seq)
    )


def banded_align(target: np.ndarray, query: np.ndarray, band: int):
    """Global banded alignment; returns per-target-column query base
    (-1 = gap), ignoring query insertions.  O(len(t)·band) cells."""
    n, m = len(query), len(target)
    band = max(band, abs(n - m) + 1)
    NEG = -(10 ** 9)
    # score[i, j] over query i 0..n, target j 0..m, banded |i-j| <= band
    score = np.full((n + 1, m + 1), NEG, np.int64)
    ptr = np.zeros((n + 1, m + 1), np.int8)     # 0 diag, 1 up(query gap→ins), 2 left(del)
    score[0, : min(m, band) + 1] = GAP * np.arange(min(m, band) + 1)
    ptr[0, :] = 2
    for i in range(1, n + 1):
        lo = max(1, i - band)
        hi = min(m, i + band)
        if i - band <= 0:
            score[i, 0] = GAP * i
            ptr[i, 0] = 1
        qi = query[i - 1]
        for j in range(lo, hi + 1):
            sub = MATCH if qi == target[j - 1] else MISMATCH
            best = score[i - 1, j - 1] + sub
            p = 0
            up = score[i - 1, j] + GAP
            if up > best:
                best, p = up, 1
            left = score[i, j - 1] + GAP
            if left > best:
                best, p = left, 2
            score[i, j] = best
            ptr[i, j] = p
    # traceback → target-column bases
    cols = np.full(m, -1, np.int8)
    i, j = n, m
    while i > 0 or j > 0:
        p = ptr[i, j]
        if i > 0 and j > 0 and p == 0:
            cols[j - 1] = query[i - 1]
            i -= 1
            j -= 1
        elif i > 0 and p == 1:
            i -= 1
        else:
            j -= 1
    return cols


def consensus_sequence(seqs: list[str], band: int = 64,
                       max_len: int = 4096) -> str:
    """Star-MSA consensus of the given sequences."""
    seqs = [s for s in seqs if s]
    if not seqs:
        return ""
    if len(seqs) == 1:
        return seqs[0]
    lens = sorted(range(len(seqs)), key=lambda i: len(seqs[i]))
    medoid = seqs[lens[len(lens) // 2]]
    if len(medoid) > max_len:
        return medoid
    target = encode(medoid)
    m = len(target)
    votes = np.zeros((m, 6), np.int32)          # A C G T N gap
    for s in seqs:
        if s == medoid:
            votes[np.arange(m), target] += 1
            continue
        cols = banded_align(target, encode(s[: 4 * m]), band)
        gap = cols < 0
        votes[~gap, cols[~gap]] += 1
        votes[gap, 5] += 1
    winner = votes.argmax(axis=1)
    return "".join(_BASES[w] for w in winner if w != 5)
