"""Golden parity: the Python oracle vs the reference's OWN compiled C.

tests/refshim builds /root/reference/{refinement,utils,sliding_window}.c
unmodified (stub htslib headers + in-memory fake BAM store) into
librefshim.so.  These tests property-test the oracle
(svtrek_tpu/oracle/refine.py) against that .so over randomized cases —
converting "we believe the oracle's reading of refinement.c" into "the
oracle is proven against the actual reference code" (VERDICT round-1
item 1).

Case counts multiply by SVTREK_REFSHIM_SCALE (default 1) for soak runs.

Reference semantics exercised:
  lower_bound / upper_bound    refinement.c:3-19
  consensus                    refinement.c:21-39
  consensus_pos                refinement.c:41-101 (both sweeps, the
                               early-return, tie handling, mean rounding)
  refine_start/end/point/ins   refinement.c:103-325 (evidence walks,
                               soft-clip rules, early-break, region query)
  sliding_window_ins           sliding_window.c:8-97 (tiling + strided
                               cluster scan + support argmax)
"""
from __future__ import annotations

import os

import numpy as np
import pytest

from svtrek_tpu import constants as C
from svtrek_tpu.constants import (
    KIND_DEL_END,
    KIND_DEL_START,
    KIND_INS,
    KIND_POINT,
)
from svtrek_tpu.oracle import refine as oracle

try:
    import refshim
except ImportError:  # run from repo root
    from tests import refshim

try:
    refshim.load()
    _SKIP = None
except Exception as e:  # pragma: no cover - no gcc / no reference tree
    _SKIP = str(e)

pytestmark = pytest.mark.skipif(
    _SKIP is not None, reason=f"refshim unavailable: {_SKIP}")

SCALE = float(os.environ.get("SVTREK_REFSHIM_SCALE", "1"))


def n_cases(n: int) -> int:
    return max(1, int(n * SCALE))


# ------------------------- case generators ---------------------------


def gen_locations(rng: np.random.Generator, pos: int) -> list[int]:
    """Evidence arrays biased toward the consensus decision boundaries."""
    size = int(rng.choice([0, 1, 2, 3, 4, 5, 8, 12, 20, 40, 60],
                          p=[.04, .06, .08, .10, .10, .12, .12, .12,
                             .12, .08, .06]))
    vals: list[int] = []
    n_clusters = int(rng.integers(1, 5))
    centers = pos + rng.integers(-700, 701, size=n_clusters)
    while len(vals) < size:
        r = rng.random()
        if r < 0.55:  # clustered evidence
            c = int(centers[rng.integers(0, n_clusters)])
            vals.append(c + int(rng.integers(-8, 9)))
        elif r < 0.8:  # uniform spread
            vals.append(pos + int(rng.integers(-650, 651)))
        elif r < 0.95:  # exact boundary magic values
            half = C.SV_MIN_LENGTH // 2
            vals.append(pos + int(rng.choice(
                [-half, half, -half + 1, half - 1, 0, 1, -1, 5, -5,
                 499, -499, 500, -500, 25, -25])))
        else:  # duplicates of something already present
            vals.append(vals[rng.integers(0, len(vals))] if vals else pos)
    return vals


def gen_cigar(rng: np.random.Generator) -> list[tuple[int, int]]:
    n_ops = int(rng.integers(1, 13))
    ops = []
    for _ in range(n_ops):
        op = int(rng.choice([0, 1, 2, 4, 3, 5, 6, 7, 8],
                            p=[.38, .14, .14, .14, .05, .05, .02, .04, .04]))
        r = rng.random()
        if r < 0.45:
            ln = int(rng.integers(1, 61))
        elif r < 0.75:  # straddle the >50 / >=50 evidence boundary
            ln = int(rng.choice([49, 50, 51]))
        else:
            ln = int(rng.integers(61, 5001))
        ops.append((op, ln))
    return ops


def gen_reads(rng: np.random.Generator, lo: int, hi: int,
              max_reads: int = 25) -> list[tuple[int, list[tuple[int, int]]]]:
    n = int(rng.integers(0, max_reads + 1))
    return [(int(rng.integers(max(0, lo - 3000), hi + 3000)),
             gen_cigar(rng)) for _ in range(n)]


def htslib_filter(reads, beg: int, end: int):
    """htslib region semantics for [beg, end): yield if pos < end and
    alignment end (ref-consuming span) > beg.  Matches the fake iterator
    in tests/refshim/shim.c and htslib's own overlap rule."""
    out = []
    for pos, cigar in reads:
        endpos = pos + sum(ln for op, ln in cigar if op in (0, 2, 3, 7, 8))
        if pos < end and endpos > beg:
            out.append((pos, cigar))
    return out


# ----------------------------- bounds ---------------------------------


def test_bounds_golden():
    rng = np.random.default_rng(11)
    for _ in range(n_cases(40_000)):
        size = int(rng.integers(1, 40))
        arr = np.sort(rng.integers(-1000, 1000, size=size)).astype(np.int32)
        loc = int(rng.integers(-1100, 1100))
        assert oracle.lower_bound(arr.tolist(), loc) == \
            refshim.ref_lower_bound(arr, loc)
        assert oracle.upper_bound(arr.tolist(), loc) == \
            refshim.ref_upper_bound(arr, loc)


# --------------------------- consensus --------------------------------


def test_consensus_lengths_golden():
    rng = np.random.default_rng(12)
    for _ in range(n_cases(15_000)):
        size = int(rng.integers(1, 50))
        vals = rng.integers(0, 400, size=size).tolist()
        mc = int(rng.integers(1, 6))
        ci = int(rng.choice([1, 2, 5, 10, 25]))
        assert oracle.consensus_lengths(vals, mc, ci) == \
            refshim.ref_consensus(vals, mc, ci), (vals, mc, ci)


def test_consensus_pos_golden():
    rng = np.random.default_rng(13)
    for case in range(n_cases(60_000)):
        pos = int(rng.integers(1_000, 2_000_000))
        vals = gen_locations(rng, pos)
        mc = int(rng.integers(1, 7))
        ci = int(rng.choice([1, 2, 5, 10, 25]))
        cir = int(rng.choice([50, 100, 500, 1000]))
        got = oracle.consensus_pos(vals, pos, mc, ci, cir)
        want = refshim.ref_consensus_pos(vals, pos, mc, ci, cir)
        assert got == want, (
            f"case {case}: oracle {got} != reference {want} for "
            f"pos={pos} mc={mc} ci={ci} cir={cir} vals={sorted(vals)}")


def test_consensus_pos_golden_negative_values():
    """i32-wrapped (negative) evidence must agree too — u32 positions are
    reinterpreted as int in the reference's int arrays."""
    rng = np.random.default_rng(14)
    for _ in range(n_cases(5_000)):
        pos = int(rng.integers(-50_000, 50_000))
        size = int(rng.integers(0, 30))
        vals = (pos + rng.integers(-600, 601, size=size)).tolist()
        got = oracle.consensus_pos(vals, pos, 3, 5, 500)
        want = refshim.ref_consensus_pos(vals, pos, 3, 5, 500)
        assert got == want


# ------------------------- refine_* kernels ---------------------------

_WHICH_TO_KIND = {
    refshim.REFINE_DEL_START: KIND_DEL_START,
    refshim.REFINE_DEL_END: KIND_DEL_END,
    refshim.REFINE_POINT_INV: KIND_POINT,
    refshim.REFINE_INS: KIND_INS,
}


def oracle_refine(which: int, reads, inter_start: int, inter_end: int,
                  pos: int, mc: int, ci: int, cir: int) -> int:
    """Python model of one refine_* call (refinement.c:103-325): htslib
    region query on [u32(start-1), u32(end-1)) then evidence walk +
    consensus_pos — expressed purely in oracle functions."""
    beg = C.u32(inter_start - 1)
    end = C.u32(inter_end - 1)
    sel = htslib_filter(reads, beg, end)
    return oracle.refine_task(_WHICH_TO_KIND[which], sel, inter_start,
                              inter_end, pos, mc, ci, cir)


def test_refine_golden():
    rng = np.random.default_rng(15)
    for case in range(n_cases(3_000)):
        start = int(rng.integers(1_000, 1_000_000))
        width = int(rng.choice([120, 2_000, 10_000, 40_000]))
        end = start + width
        reads = gen_reads(rng, start, end)
        refshim.set_reads(reads)
        pos = int(rng.integers(start - 500, end + 500))
        mc = int(rng.integers(1, 5))
        ci = int(rng.choice([2, 5, 10]))
        cir = int(rng.choice([100, 500, 1000]))
        for which in range(4):
            got = oracle_refine(which, reads, start, end, pos, mc, ci, cir)
            want = refshim.ref_refine(which, start, end, pos, mc, ci, cir)
            assert got == want, (
                f"case {case} which={which}: oracle {got} != reference "
                f"{want} inter=[{start},{end}] pos={pos} mc={mc} ci={ci} "
                f"cir={cir} reads={reads}")


def test_refine_point_inv_always_na():
    """refine_point(SV_INV) collects nothing (refinement.c:250) — golden
    confirmation of the documented quirk."""
    reads = [(100, [(2, 100), (0, 50)]), (120, [(0, 30), (2, 200), (0, 5)]),
             (140, [(2, 80), (0, 10)])]
    refshim.set_reads(reads)
    assert refshim.ref_refine(refshim.REFINE_POINT_INV, 50, 1000, 150,
                              1, 5, 500) == -1


# ------------------------ sliding_window_ins --------------------------


def oracle_sliding_window(reads, inter_start: int, inter_end: int, mc: int,
                          window_size: int, slide_size: int) -> int:
    """Python model of sliding_window_ins (sliding_window.c:8-97) in terms
    of oracle.extract_candidates + oracle.window_scan: tile [start, end)
    by window_size; per tile, htslib-query [u32(s-1), u32(e-1)), collect
    INS>=50 evidence with early break past the *untranslated* tile end,
    strided-cluster-scan; keep the best strictly-greater support."""
    best_overall, max_sup = -1, 0
    sub_start = inter_start
    while sub_start < inter_end:
        sub_end = min(sub_start + window_size, inter_end)
        sel = htslib_filter(reads, C.u32(sub_start - 1), C.u32(sub_end - 1))
        locs = oracle.extract_candidates(KIND_INS, sel, sub_start, sub_end)
        if locs:
            best, sup = oracle.window_scan(locs, mc, window_size, slide_size)
            if best != -1 and sup > max_sup:
                max_sup, best_overall = sup, best
        sub_start += window_size
    return best_overall


def test_sliding_window_golden():
    rng = np.random.default_rng(16)
    for case in range(n_cases(2_000)):
        start = int(rng.integers(1_000, 500_000))
        width = int(rng.choice([500, 3_000, 12_000]))
        end = start + width
        reads = gen_reads(rng, start, end, max_reads=18)
        refshim.set_reads(reads)
        mc = int(rng.integers(1, 5))
        wsize = int(rng.choice([250, 1000, 5000]))
        slide = int(rng.choice([1, 2, 5]))
        got = oracle_sliding_window(reads, start, end, mc, wsize, slide)
        want = refshim.ref_sliding_window(start, end, mc, wsize, slide)
        assert got == want, (
            f"case {case}: oracle {got} != reference {want} "
            f"inter=[{start},{end}] mc={mc} w={wsize} s={slide} "
            f"reads={reads}")
