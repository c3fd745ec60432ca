"""Golden parity for the disc-mode parsers: the reference's OWN
parse_gfa / parse_gaf (discover.c, compiled unmodified into
tests/refshim/libdiscshim.so) vs svtrek_tpu/io/gfa.py and gaf.py.

The reference's disc mode is WIP (empty scan bodies, placeholder
breakpoints, a driver that errors out on success, discover.c:425-428),
so its OBSERVABLE parser outputs are: the segment table after all three
GFA passes, and the accepted-read list (readStart/readEnd/rc after
reverse-complement normalization) from the GAF pass — both compared
here.  The one deliberate divergence (alt-chain cumulative coordinates;
the reference's final pass skips multi-node chain heads because it
requires next == NULL, discover.c:361) is asserted explicitly in both
directions.
"""
from __future__ import annotations

import numpy as np
import pytest

from svtrek_tpu.io.gaf import iter_gaf
from svtrek_tpu.io.gfa import parse_gfa
from tests.fixtures_disc import gaf_line, make_backbone_gfa, write_fastq  # noqa: F401

try:
    from tests import refshim
except ImportError:
    import refshim

try:
    refshim.load_disc()
    _SKIP = None
except Exception as e:  # pragma: no cover
    _SKIP = str(e)

pytestmark = pytest.mark.skipif(
    _SKIP is not None, reason=f"disc shim unavailable: {_SKIP}")


def our_segments(path):
    g = parse_gfa(path)
    return [dict(id=s.id, rank=s.rank, start=s.start, end=s.end,
                 next_id=s.next_id) for s in g.segments], g


def test_gfa_golden_single_node_alts(tmp_path):
    p = str(tmp_path / "g.gfa")
    make_backbone_gfa(p, [1000, 500, 800, 1200],
                      alt={(1, 2): (10, 120), (3, 4): (11, 75)})
    want = refshim.ref_parse_gfa(p)
    got, _ = our_segments(p)
    assert got == want


def test_gfa_golden_backbone_coords(tmp_path):
    p = str(tmp_path / "plain.gfa")
    make_backbone_gfa(p, [100, 200, 300, 50, 75])
    want = refshim.ref_parse_gfa(p)
    got, _ = our_segments(p)
    assert got == want
    # rank-0 cumulative coordinates
    assert [w["start"] for w in want] == [0, 100, 300, 600, 650]


def test_gfa_multi_node_chain_documented_divergence(tmp_path):
    """Reference: the chain-coordinate pass requires next == NULL
    (discover.c:361) so a 2-node alt chain's coordinates never get the
    cumulative walk (head stays 0..len from the L rank0→rank1 link; the
    tail keeps its S-line defaults start=-1, end=len).  Ours walks
    chains from their heads (documented fix, io/gfa.py) — asserted in
    both directions so any change to either side fails loudly."""
    p = str(tmp_path / "chain.gfa")
    seg1, seg10, seg11, seg2 = "A" * 100, "C" * 40, "G" * 60, "T" * 100
    with open(p, "w") as fh:
        fh.write(f"S\t1\t{seg1}\nS\t10\t{seg10}\nS\t11\t{seg11}\n"
                 f"S\t2\t{seg2}\n")
        fh.write("P\tref\t1+,2+\t*\n")
        fh.write("L\t1\t+\t10\t+\t0M\nL\t10\t+\t11\t+\t0M\n"
                 "L\t11\t+\t2\t+\t0M\n")
    want = {w["id"]: w for w in refshim.ref_parse_gfa(p)}
    got_list, _ = our_segments(p)
    got = {s["id"]: s for s in got_list}

    # identical: ids, ranks, chains, rank-0 coordinates
    for sid in (1, 2, 10, 11):
        assert got[sid]["rank"] == want[sid]["rank"]
        assert got[sid]["next_id"] == want[sid]["next_id"]
    for sid in (1, 2):
        assert got[sid] == want[sid]
    # reference: ineffective pass leaves head at 0..40, tail at -1..60
    assert (want[10]["start"], want[10]["end"]) == (0, 40)
    assert (want[11]["start"], want[11]["end"]) == (-1, 60)
    # ours: cumulative chain coordinates
    assert (got[10]["start"], got[10]["end"]) == (0, 40)
    assert (got[11]["start"], got[11]["end"]) == (40, 100)


def test_gaf_golden_acceptance(tmp_path):
    """Accepted reads + normalized read coords + rc flag must match the
    reference exactly: qual-0 discard, first-alignment-wins dedupe,
    reverse-complement index fixup, unknown-segment rejection."""
    p = str(tmp_path / "g.gfa")
    seqs = make_backbone_gfa(p, [1000, 1000, 1000], alt={(1, 2): (10, 120)})
    want_gfa = refshim.ref_parse_gfa(p)
    assert want_gfa is not None
    g = parse_gfa(p)

    gaf = str(tmp_path / "a.gaf")
    lines = [
        # forward through the alt
        gaf_line("r1", 1520, 0, 1520, ">1>10>2", 2120, 300, 1820,
                 "700=120=700="),
        # reverse-complement path (leading '<': node order + indices flip)
        gaf_line("r2", 1400, 100, 1300, "<2<1", 2000, 400, 1600, "1200="),
        # qual 0 → discarded
        gaf_line("junk", 100, 0, 100, ">1", 1000, 0, 100, "100=", qual=0),
        # duplicate read name → first wins
        gaf_line("r1", 900, 0, 900, ">3", 1000, 50, 950, "900="),
        # unknown segment in path → rejected by parse_nodes
        gaf_line("r3", 500, 0, 500, ">1>99", 2000, 100, 600, "500="),
        # plain backbone read
        gaf_line("r4", 800, 10, 790, ">2", 1000, 100, 880, "780="),
    ]
    with open(gaf, "w") as fh:
        fh.write("\n".join(lines) + "\n")

    want = refshim.ref_parse_gaf(gaf)
    got = [(pr.read_start, pr.read_end) for pr in iter_gaf(gaf, g)]
    assert got == [(rs, re_) for rs, re_, _rc in want], (got, want)
    assert len(got) == 3  # r1(first), r2, r4
    # Reference quirk: gaf_breakpoint.rc = (strand == '>' ? 1 : -1) but
    # the GAF strand column is '+'/'-', so the stored flag is always -1
    # (discover.c:231) — a WIP placeholder; the real rc signal is the
    # leading '<' of the path, which both sides use for normalization.
    assert [rc for _, _, rc in want] == [-1, -1, -1]