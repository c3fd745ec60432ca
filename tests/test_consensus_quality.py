"""Consensus-sequence quality (VERDICT round-1 item 6): noisy copies of
a planted insert must recover the truth within a small edit distance,
including on bimodal (two-allele) clusters where a global length-medoid
would sit between the modes.

The reference leaves this behavior undefined (MSA TODO at
discover.c:401; abPOA unused) — these tests pin down the framework's
defined behavior with measured bounds.
"""
from __future__ import annotations

import numpy as np
import pytest

from svtrek_tpu.ops.poa import consensus_sequence, majority_length_mode

BASES = "ACGT"


def rand_seq(rng, n: int) -> str:
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def mutate(rng, seq: str, sub=0.05, ins=0.02, dele=0.02) -> str:
    out = []
    for c in seq:
        r = rng.random()
        if r < dele:
            continue
        out.append(BASES[rng.integers(4)] if r < dele + sub else c)
        if rng.random() < ins:
            out.append(BASES[rng.integers(4)])
    return "".join(out)


def edit_distance(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("length,depth", [(300, 8), (600, 12)])
def test_noisy_copies_recover_truth(seed, length, depth):
    """5% sub / 2% ins / 2% del copies → consensus within 2% of truth."""
    rng = np.random.default_rng(seed)
    truth = rand_seq(rng, length)
    copies = [mutate(rng, truth) for _ in range(depth)]
    cons = consensus_sequence(copies)
    d = edit_distance(cons, truth)
    assert d <= max(2, length * 2 // 100), (
        f"consensus {d} edits from truth (len {length}, depth {depth})")


def test_bimodal_cluster_recovers_majority_allele():
    """6 copies of allele A + 3 of allele B (A plus a 60 bp block):
    consensus must be close to A, not a hybrid."""
    rng = np.random.default_rng(5)
    allele_a = rand_seq(rng, 300)
    allele_b = allele_a[:150] + rand_seq(rng, 60) + allele_a[150:]
    copies = [mutate(rng, allele_a) for _ in range(6)] + \
             [mutate(rng, allele_b) for _ in range(3)]
    cons = consensus_sequence(copies)
    da = edit_distance(cons, allele_a)
    db = edit_distance(cons, allele_b)
    assert da <= 6, f"consensus {da} edits from majority allele"
    assert db >= 40, "consensus collapsed toward the minority allele"


def test_bimodal_minority_majority_flip():
    """Same alleles, flipped counts: the consensus follows the majority."""
    rng = np.random.default_rng(6)
    allele_a = rand_seq(rng, 300)
    allele_b = allele_a[:150] + rand_seq(rng, 60) + allele_a[150:]
    copies = [mutate(rng, allele_a) for _ in range(3)] + \
             [mutate(rng, allele_b) for _ in range(6)]
    cons = consensus_sequence(copies)
    assert edit_distance(cons, allele_b) <= 8


def test_majority_length_mode():
    seqs = ["A" * 100, "A" * 104, "A" * 98, "A" * 205, "A" * 210]
    mode = majority_length_mode(seqs)
    assert sorted(len(s) for s in mode) == [98, 100, 104]
    # unimodal: everything stays
    seqs = ["A" * n for n in (100, 103, 108, 96)]
    assert len(majority_length_mode(seqs)) == 4


def test_identical_copies_exact():
    truth = rand_seq(np.random.default_rng(9), 200)
    assert consensus_sequence([truth] * 5) == truth


def test_medoid_deletion_recovered():
    """A base every member has but the medoid lacks must come back via
    the boundary-insert vote (round-2 refinement)."""
    rng = np.random.default_rng(10)
    truth = rand_seq(rng, 250)
    # copies: exact truth except one (the length-medoid candidate) that
    # lost 3 scattered bases
    damaged = truth[:50] + truth[51:120] + truth[121:200] + truth[201:]
    copies = [truth, truth, damaged, truth + "A", truth[1:]]
    cons = consensus_sequence(copies)
    assert edit_distance(cons, truth) <= 1
