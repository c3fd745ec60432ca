"""Property tests: vectorized CIGAR evidence extraction vs the oracle.

Random reads with adversarial CIGARs (big deletions/insertions, soft/hard
clips, early-break boundary cases) must yield exactly the candidate
multisets and refined positions the reference walk produces
(refinement.c:103-325).
"""
import numpy as np
import pytest

from svtrek_tpu import constants as C
from svtrek_tpu.constants import (
    CIGAR_D, CIGAR_H, CIGAR_I, CIGAR_M, CIGAR_N, CIGAR_P, CIGAR_S,
    KIND_DEL_END, KIND_DEL_START, KIND_INS, KIND_POINT,
)
from svtrek_tpu.oracle import extract_candidates, refine_task
from svtrek_tpu.ops.audit_step import audit_refine_step
from svtrek_tpu.ops.cigar import extract_read_candidates

PAD = C.I32_MAX


def random_read(rng, base):
    """A read with a realistic-ish random CIGAR near `base`."""
    pos = base + int(rng.integers(-3000, 3000))
    ops = []
    if rng.random() < 0.4:
        ops.append((CIGAR_S if rng.random() < 0.8 else CIGAR_H,
                    int(rng.integers(1, 400))))
    n_mid = int(rng.integers(1, 8))
    for _ in range(n_mid):
        kind = rng.integers(0, 6)
        if kind == 0:
            ops.append((CIGAR_M, int(rng.integers(1, 2000))))
        elif kind == 1:
            ops.append((CIGAR_D, int(rng.integers(40, 70))))  # straddles 50
        elif kind == 2:
            ops.append((CIGAR_I, int(rng.integers(40, 70))))
        elif kind == 3:
            ops.append((CIGAR_N, int(rng.integers(1, 500))))
        elif kind == 4:
            ops.append((CIGAR_P, int(rng.integers(1, 5))))
        else:
            ops.append((CIGAR_M, int(rng.integers(1, 300))))
    if rng.random() < 0.4:
        ops.append((CIGAR_S if rng.random() < 0.8 else CIGAR_H,
                    int(rng.integers(1, 400))))
    return pos, ops


def pack_reads(tasks, O, pad_n=None):
    """tasks: list of (kind, reads, istart, iend, ipos) → device arrays.

    pad_n pads the read axis to a fixed size so XLA compiles are shared
    across random seeds."""
    N = sum(len(t[1]) for t in tasks)
    if pad_n:
        N = max(N, pad_n)
    B = len(tasks)
    ops = np.full((max(N, 1), O), 9, np.int8)
    lens = np.zeros((max(N, 1), O), np.int32)
    pos = np.zeros(max(N, 1), np.int32)
    n_ops = np.zeros(max(N, 1), np.int32)
    wid = np.full(max(N, 1), B, np.int32)
    kind = np.zeros(B, np.int32)
    istart = np.zeros(B, np.int32)
    iend = np.zeros(B, np.int32)
    ipos = np.zeros(B, np.int32)
    r = 0
    for b, (k, reads, s, e, p) in enumerate(tasks):
        kind[b], istart[b], iend[b], ipos[b] = k, s, e, p
        for rp, cig in reads:
            cig = cig[:O]
            ops[r, : len(cig)] = [o for o, _ in cig]
            lens[r, : len(cig)] = [l for _, l in cig]
            pos[r] = rp
            n_ops[r] = len(cig)
            wid[r] = b
            r += 1
    return ops, lens, pos, n_ops, wid, kind, istart, iend, ipos


@pytest.mark.parametrize("seed", range(6))
def test_extraction_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    O = 32
    tasks = []
    for _ in range(24):
        base = int(rng.integers(20000, 200000))
        reads = [random_read(rng, base) for _ in range(int(rng.integers(0, 12)))]
        k = int(rng.integers(0, 4))
        istart = base - int(rng.integers(500, 4000))
        iend = base + int(rng.integers(500, 4000))
        tasks.append((k, reads, istart, iend, base))

    ops, lens, pos, n_ops, wid, kind, istart, iend, ipos = pack_reads(
        tasks, O, pad_n=256
    )
    kind_r = kind[np.clip(wid, 0, len(tasks) - 1)]
    istart_r = istart[np.clip(wid, 0, len(tasks) - 1)]
    iend_r = iend[np.clip(wid, 0, len(tasks) - 1)]
    cand, count = extract_read_candidates(
        ops, lens, pos, n_ops, kind_r, istart_r, iend_r
    )
    cand = np.asarray(cand)

    r = 0
    for k, reads, s, e, p in tasks:
        for read in reads:
            want = sorted(extract_candidates(k, [read], s, e))
            got = sorted(v for v in cand[r] if v < PAD)
            assert got == want, (k, read, s, e, got, want)
            r += 1


@pytest.mark.parametrize("seed", range(6))
def test_full_audit_step_matches_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    O, K = 32, 128
    tasks = []
    for _ in range(32):
        base = int(rng.integers(20000, 200000))
        # Pile several reads on the same breakpoint so consensus can fire.
        bp = base + int(rng.integers(-200, 200))
        reads = []
        for _ in range(int(rng.integers(0, 20))):
            jitter = int(rng.integers(-3, 4))
            start = bp - int(rng.integers(100, 1500))
            reads.append(
                (start, [(CIGAR_M, bp + jitter - start),
                         (CIGAR_D, int(rng.integers(45, 80))),
                         (CIGAR_M, 500)])
            )
        for _ in range(int(rng.integers(0, 6))):
            reads.append(random_read(rng, base))
        k = int(rng.integers(0, 4))
        tasks.append((k, reads, base - 2000, base + 2000, base))

    packed = pack_reads(tasks, O, pad_n=512)
    ops, lens, pos, n_ops, wid, kind, istart, iend, ipos = packed
    refined, counts, overflow = audit_refine_step(
        ops, lens, pos, n_ops, wid, kind, istart, iend, ipos,
        num_windows=len(tasks), K=K,
    )
    refined = np.asarray(refined)
    for b, (k, reads, s, e, p) in enumerate(tasks):
        want = refine_task(k, reads, s, e, p)
        assert int(refined[b]) == want, (b, k, s, e, p, int(refined[b]), want)


def test_break_and_softclip_edge_cases():
    """Hand-built boundary cases around the early break and clip rules."""
    # Read whose D op sits exactly at the interval end boundary.
    iend = 10_000
    read_a = (9_800, [(CIGAR_M, 150), (CIGAR_D, 60), (CIGAR_M, 100)])
    # D begins at 9950, ends 10010 > iend → later ops not evaluated, but D
    # itself was evaluated before the break.
    assert extract_candidates(KIND_DEL_START, [read_a], 9_000, iend) == [9_950]

    # Trailing soft clip lands exactly on the interval end (kept).
    read_b = (9_900, [(CIGAR_M, 100), (CIGAR_S, 50)])
    assert extract_candidates(KIND_DEL_START, [read_b], 9_000, iend) == [10_000]
    # One past the end: the post-loop check fires the break-clear first.
    read_c = (9_901, [(CIGAR_M, 100), (CIGAR_S, 50)])
    assert extract_candidates(KIND_DEL_START, [read_c], 9_000, iend) == []

    # Leading soft clip (refine_end): records post-walk position + 1.
    read_d = (9_950, [(CIGAR_S, 30), (CIGAR_M, 20)])
    assert extract_candidates(KIND_DEL_END, [read_d], 9_000, iend) == [9_971]
    # Leading soft clip with walk broken early: value is the break position+1.
    read_e = (9_990, [(CIGAR_S, 30), (CIGAR_M, 100), (CIGAR_M, 500)])
    assert extract_candidates(KIND_DEL_END, [read_e], 9_000, iend) == [10_091]

    # HARD clip advances reference_pos (reference quirk, refinement.c:137).
    read_f = (9_000, [(CIGAR_H, 500), (CIGAR_D, 60), (CIGAR_M, 10)])
    assert extract_candidates(KIND_DEL_START, [read_f], 9_000, iend) == [9_500]

    # KIND_POINT (INV) collects nothing.
    assert extract_candidates(KIND_POINT, [read_a], 9_000, iend) == []

    # D exactly 50 bp is NOT evidence; I exactly 50 bp IS.
    read_g = (9_500, [(CIGAR_M, 10), (CIGAR_D, 50), (CIGAR_M, 10)])
    assert extract_candidates(KIND_DEL_START, [read_g], 9_000, iend) == []
    read_h = (9_500, [(CIGAR_M, 10), (CIGAR_I, 50), (CIGAR_M, 10)])
    assert extract_candidates(KIND_INS, [read_h], 9_000, iend) == [9_510]

    # Device kernel agrees on all of the above.
    tasks = [
        (KIND_DEL_START, [read_a, read_b, read_c, read_f, read_g], 9_000, iend, 9_950),
        (KIND_DEL_END, [read_d, read_e], 9_000, iend, 9_970),
        (KIND_INS, [read_h], 9_000, iend, 9_510),
        (KIND_POINT, [read_a], 9_000, iend, 9_950),
    ]
    ops, lens, pos, n_ops, wid, kind, istart, iend_a, ipos = pack_reads(tasks, 8)
    kind_r = kind[np.clip(wid, 0, 3)]
    cand, _ = extract_read_candidates(
        ops, lens, pos, n_ops, kind_r,
        istart[np.clip(wid, 0, 3)], iend_a[np.clip(wid, 0, 3)],
    )
    cand = np.asarray(cand)
    r = 0
    for k, reads, s, e, p in tasks:
        for read in reads:
            want = sorted(extract_candidates(k, [read], s, e))
            got = sorted(v for v in cand[r] if v < PAD)
            assert got == want, (k, read)
            r += 1
