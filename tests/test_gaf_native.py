"""Golden tests: the C GAF tokenizer+projector (io/gaf_native.py) must
agree read-for-read and run-for-run with the Python path (io/gaf.py)
— including rc normalization, multi-node projection, alt-segment
insertion rewriting, deletion gaps, dedupe, and error reporting
(the completed discover.c:46-246 semantics, one implementation each)."""
from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svtrek_tpu.io.gaf import iter_gaf
from svtrek_tpu.io.gfa import parse_gfa
from tests.fixtures_disc import gaf_line, make_backbone_gfa


def _native_reader(gaf, gfa):
    from svtrek_tpu.native.bamlib import load_library

    if load_library() is None:
        pytest.skip("native library unavailable")
    from svtrek_tpu.io.gaf_native import NativeGafReader

    return NativeGafReader(gaf, gfa)


def _drain_native(gaf, gfa, batch=7):
    """All native reads as (name, rc, ref_start, runs, rlen, rs, re)."""
    r = _native_reader(gaf, gfa)
    out = []
    while (b := r.next_batch(batch)) is not None:
        for i in range(b.n):
            out.append((
                b.name(i), bool(b.rc[i]), int(b.ref_start[i]), b.runs(i),
                int(b.read_len[i]), int(b.read_start[i]), int(b.read_end[i]),
            ))
    errs = list(r.errors)
    r.close()
    return out, errs


def _drain_python(gaf, gfa):
    errs: list[str] = []
    out = [
        (p.read_name, p.rc, p.reference_start, [tuple(t) for t in p.runs],
         p.read_len, p.read_start, p.read_end)
        for p in iter_gaf(gaf, gfa, errs)
    ]
    return out, errs


def _assert_match(gaf, gfa_path):
    gfa = parse_gfa(gfa_path)
    py, py_err = _drain_python(gaf, gfa)
    nat, nat_err = _drain_native(gaf, gfa)
    assert nat_err == py_err
    assert len(nat) == len(py)
    for a, b in zip(nat, py):
        assert a == b, f"native {a} != python {b}"


def test_tricky_cases_match(tmp_path):
    gfa_path = str(tmp_path / "g.gfa")
    make_backbone_gfa(gfa_path, [100, 80, 120], alt={(1, 2): (10, 30)})
    lines = [
        # plain single-node forward
        gaf_line("r1", 60, 0, 60, ">1", 100, 10, 70, "60M"),
        # duplicate name: first wins
        gaf_line("r1", 60, 0, 60, ">1", 100, 20, 80, "60M"),
        # rc single-node (path starts '<'): coords + cigar reversed
        gaf_line("r2", 50, 5, 45, "<2", 80, 10, 50, "20M5I15M"),
        # multi-node across backbone segments
        gaf_line("r3", 150, 0, 150, ">1>2", 180, 60, 130, "70M80D"),
        # path through the alt segment: query ops there become I
        gaf_line("r4", 120, 0, 120, ">1>10>2", 210, 70, 140,
                 "30M30M60M"),
        # qual 0: discarded silently
        gaf_line("r5", 60, 0, 60, ">1", 100, 10, 70, "60M", qual=0),
        # unknown node: error recorded
        gaf_line("r6", 60, 0, 60, ">99", 100, 10, 70, "60M"),
        # mixed strands: error recorded
        gaf_line("r7", 60, 0, 60, ">1<2", 180, 10, 70, "60M"),
        # no cg tag: skipped, NOT marked seen...
        "r8\t60\t0\t60\t+\t>1\t100\t10\t70\t60\t60\t60",
        # ...so this later alignment of r8 IS accepted
        gaf_line("r8", 60, 0, 60, ">1", 100, 12, 72, "60M"),
        # trailing I at the exact segment end (fast-path edge)
        gaf_line("r9", 95, 0, 95, ">1", 100, 10, 100, "90M5I"),
        # overhanging alignment (general loop drops past-the-end ops)
        gaf_line("ra", 120, 0, 120, ">1", 100, 50, 100, "50M70I"),
        # rc multi-node
        gaf_line("rb", 100, 10, 90, "<2<1", 180, 40, 120, "40M10D40M"),
        # big INS / DEL signals
        gaf_line("rc", 200, 0, 200, ">1", 100, 5, 85, "40M60I80M20S"),
        gaf_line("rd", 100, 0, 100, ">1>2", 180, 5, 175, "50M70D50M"),
        # leading/trailing clips via read_start / read_len-read_end
        gaf_line("re", 150, 55, 130, ">2", 80, 0, 75, "75M"),
    ]
    gaf_path = str(tmp_path / "g.gaf")
    with open(gaf_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    _assert_match(gaf_path, gfa_path)


def test_bench_fixture_matches(tmp_path):
    """3k reads of the bench generator (noisy CIGARs, planted INS/DEL/
    clip mix) project identically through both paths."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    from bench_disc import build_fixture

    build_fixture(str(tmp_path), 3000, seed=7)
    _assert_match(str(tmp_path / "bench.gaf"), str(tmp_path / "bench.gfa"))


def test_batch_boundaries_are_invisible(tmp_path):
    gfa_path = str(tmp_path / "g.gfa")
    make_backbone_gfa(gfa_path, [500])
    lines = [gaf_line(f"x{i}", 60, 0, 60, ">1", 500, i, i + 60, "60M")
             for i in range(25)]
    gaf_path = str(tmp_path / "g.gaf")
    with open(gaf_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    gfa = parse_gfa(gfa_path)
    for bsz in (1, 3, 25, 100):
        r = _native_reader(gaf_path, gfa)
        names = []
        while (b := r.next_batch(bsz)) is not None:
            names.extend(b.name(i) for i in range(b.n))
        r.close()
        assert names == [f"x{i}" for i in range(25)]
