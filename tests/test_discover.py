"""disc-mode tests: GFA parsing, GAF projection, detection (host vs
device kernel parity), clustering, and the end-to-end driver."""
import io

import numpy as np
import pytest

from fixtures_disc import gaf_line, make_backbone_gfa, write_fastq
from svtrek_tpu.config import DiscConfig
from svtrek_tpu.constants import CIGAR_D, CIGAR_I, CIGAR_M, CIGAR_S, CIGAR_EQ
from svtrek_tpu.io.gaf import (
    Breakpoint, ProjectedRead, iter_gaf, parse_gaf_line, project_alignment,
    parse_nodes, scan_breakpoints,
)
from svtrek_tpu.io.gfa import parse_gfa, GfaError
from svtrek_tpu.ops.discover import scan_projected_runs, BP_INS, BP_DEL, BP_CLIP
from svtrek_tpu.pipeline.discover import (
    cluster_breakpoints, detect_breakpoints, run_discover,
)


def test_parse_gfa_backbone(tmp_path):
    p = str(tmp_path / "g.gfa")
    make_backbone_gfa(p, [100, 200, 300], alt={(1, 2): (10, 80)})
    g = parse_gfa(p)
    s1, s2, s3 = g.seg(1), g.seg(2), g.seg(3)
    assert (s1.rank, s1.start, s1.end) == (0, 0, 100)
    assert (s2.rank, s2.start, s2.end) == (0, 100, 300)
    assert (s3.rank, s3.start, s3.end) == (0, 300, 600)
    a = g.seg(10)
    assert a.rank == 1 and a.start == 0 and a.end == 80


def test_parse_gfa_rejects_overlap(tmp_path):
    p = str(tmp_path / "g.gfa")
    with open(p, "w") as fh:
        fh.write("S\t1\tACGT\nS\t2\tACGT\nL\t1\t+\t2\t+\t3M\n")
    with pytest.raises(GfaError):
        parse_gfa(p)


def _simple_graph(tmp_path):
    p = str(tmp_path / "g.gfa")
    seqs = make_backbone_gfa(p, [1000, 1000, 1000], alt={(1, 2): (10, 200)})
    return p, parse_gfa(p), seqs


def test_projection_backbone_match(tmp_path):
    _, g, _ = _simple_graph(tmp_path)
    # Read aligns across segs 1→2, pure matches, starting at offset 500.
    aln = parse_gaf_line(gaf_line("r1", 1000, 0, 1000, ">1>2", 2000, 500, 1500,
                                  "1000="))
    nodes = parse_nodes(aln, g)
    pr = project_alignment(aln, nodes, g)
    assert pr.reference_start == 500
    assert pr.runs == [(CIGAR_EQ, 1000)]
    assert scan_breakpoints(pr) == []


def test_projection_alt_segment_becomes_insertion(tmp_path):
    _, g, _ = _simple_graph(tmp_path)
    # Path detours through alt seg 10 (len 200) between segs 1 and 2:
    # query consumes 200 bases on the alt segment → INS; segs 1,2 are
    # adjacent on the backbone → no deletion.
    aln = parse_gaf_line(gaf_line(
        "r2", 1400, 0, 1400, ">1>10>2", 2200, 400, 1800,
        "600=200=600="))
    nodes = parse_nodes(aln, g)
    pr = project_alignment(aln, nodes, g)
    assert pr.reference_start == 400
    assert pr.runs == [(CIGAR_EQ, 600), (CIGAR_I, 200), (CIGAR_EQ, 600)]
    bps = scan_breakpoints(pr)
    assert len(bps) == 1
    bp = bps[0]
    assert (bp.type, bp.ref_pos, bp.read_pos, bp.length) == ("INS", 1000, 600, 200)


def test_projection_skipped_backbone_becomes_deletion(tmp_path):
    p = str(tmp_path / "g2.gfa")
    # backbone 1,2,3 but read jumps 1→3 (seg 2 absent from path):
    make_backbone_gfa(p, [1000, 300, 1000])
    g = parse_gfa(p)
    aln = parse_gaf_line(gaf_line("r3", 1200, 0, 1200, ">1>3", 2000, 400, 1600,
                                  "1200="))
    nodes = parse_nodes(aln, g)
    pr = project_alignment(aln, nodes, g)
    assert pr.reference_start == 400
    assert pr.runs == [(CIGAR_EQ, 600), (CIGAR_D, 300), (CIGAR_EQ, 600)]
    bps = scan_breakpoints(pr)
    assert len(bps) == 1
    assert (bps[0].type, bps[0].ref_pos, bps[0].length) == ("DEL", 1000, 300)


def test_projection_clips_and_rc(tmp_path):
    _, g, _ = _simple_graph(tmp_path)
    # 100bp prefix + 80bp suffix soft clips.
    aln = parse_gaf_line(gaf_line("r4", 1180, 100, 1100, ">2", 1000, 0, 1000,
                                  "1000="))
    nodes = parse_nodes(aln, g)
    pr = project_alignment(aln, nodes, g)
    assert pr.runs == [(CIGAR_S, 100), (CIGAR_EQ, 1000), (CIGAR_S, 80)]
    bps = scan_breakpoints(pr)
    assert [b.type for b in bps] == ["CLIP", "CLIP"]
    assert bps[0].ref_pos == 1000 and bps[1].ref_pos == 2000

    # Reverse-complement path: indices flip.
    aln_rc = parse_gaf_line(gaf_line("r5", 1000, 50, 950, "<2<1", 2000, 200, 1100,
                                     "900="))
    nodes = parse_nodes(aln_rc, g)
    pr = project_alignment(aln_rc, nodes, g)
    assert pr.rc
    # path flipped: start = 2000-1100=900 on >1>2 → ref start 900
    assert pr.reference_start == 900
    assert pr.runs[0] == (CIGAR_S, 50)


def test_device_scan_matches_host(tmp_path):
    rng = np.random.default_rng(0)
    from svtrek_tpu.io.gaf import ProjectedRead

    prs = []
    for i in range(64):
        runs = []
        for _ in range(int(rng.integers(1, 20))):
            op = int(rng.choice([CIGAR_M, CIGAR_EQ, CIGAR_I, CIGAR_D, CIGAR_S]))
            runs.append((op, int(rng.integers(1, 120))))
        prs.append(ProjectedRead(
            read_name=f"r{i}", read_len=0, read_start=0, read_end=0,
            rc=bool(rng.integers(0, 2)),
            reference_start=int(rng.integers(0, 10000)), runs=runs,
        ))
    got = detect_breakpoints(iter(prs), 50, batch_reads=16)
    want = [b for p in prs for b in scan_breakpoints(p, 50)]
    key = lambda b: (b.read_name, b.type, b.ref_pos, b.read_pos, b.length)
    assert sorted(got, key=key) == sorted(want, key=key)


def test_clustering():
    bps = [
        Breakpoint("a", "INS", 1000, 0, 100, False),
        Breakpoint("b", "INS", 1003, 0, 104, False),
        Breakpoint("c", "INS", 998, 0, 96, False),
        Breakpoint("d", "INS", 5000, 0, 60, False),          # lone → dropped
        Breakpoint("e", "DEL", 2000, 0, 300, False),
        Breakpoint("f", "DEL", 2004, 0, 305, False),
        Breakpoint("g", "DEL", 2010, 0, 295, False),
    ]
    cl = cluster_breakpoints(bps, min_count=3)
    assert len(cl) == 2
    del_c = [c for c in cl if c.type == "DEL"][0]
    ins_c = [c for c in cl if c.type == "INS"][0]
    assert del_c.support == 3 and abs(del_c.ref_pos - 2005) <= 1
    assert ins_c.support == 3 and ins_c.ref_pos == 1000 and ins_c.length == 100


def test_discover_end_to_end(tmp_path):
    gfa_path = str(tmp_path / "g.gfa")
    seqs = make_backbone_gfa(gfa_path, [1000, 1000, 1000],
                             alt={(1, 2): (10, 120)})
    g = parse_gfa(gfa_path)
    alt_seq = seqs[10]

    gaf_path = str(tmp_path / "a.gaf")
    fq_path = str(tmp_path / "r.fq")
    reads = {}
    lines = []
    # 4 reads through the alt segment (→ INS of 120 at backbone 1000).
    for i in range(4):
        off = 300 + i * 17
        pre = 1000 - off
        name = f"ins{i}"
        lines.append(gaf_line(name, pre + 120 + 400, 0, pre + 120 + 400,
                              ">1>10>2", 2120, off, off + pre + 120 + 400,
                              f"{pre}=120={400}="))
        reads[name] = seqs[1][off:] + alt_seq + seqs[2][:400]
    # 3 reads skipping segment 2 entirely (DEL 1000 at backbone 1000)...
    # plus one mapq-0 read that must be ignored.
    for i in range(3):
        off = 400 + i * 23
        pre = 1000 - off
        name = f"del{i}"
        lines.append(gaf_line(name, pre + 500, 0, pre + 500, ">1>3", 2000,
                              off, off + pre + 500, f"{pre + 500}="))
        reads[name] = seqs[1][off:] + seqs[3][:500]
    lines.append(gaf_line("junk", 100, 0, 100, ">1", 1000, 0, 100, "100=",
                          qual=0))
    with open(gaf_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    write_fastq(fq_path, reads)

    cfg = DiscConfig(gfa_file=gfa_path, gaf_file=gaf_path, fq_file=fq_path,
                     output_file=str(tmp_path / "disc.out"))
    out = io.StringIO()
    got = run_discover(cfg, out=out, err=io.StringIO())
    assert len(got) == 2, got
    ins = [l for l in got if "DISC INS" in l][0]
    dl = [l for l in got if "DISC DEL" in l][0]
    assert "ref pos: 1000, len: 120, support: 4" in ins
    assert f"seq: {alt_seq}" in ins          # consensus == alt segment seq
    assert "ref pos: 1000, len: 1000, support: 3" in dl


def test_disc_sharded_matches_dense(tmp_path):
    """detect_breakpoints over the 8-device mesh (sharded_disc_step)
    must equal the dense single-device scan exactly (VERDICT r2 item 4:
    disc multi-device parity)."""
    import random

    from svtrek_tpu.io.gaf import scan_breakpoints
    from svtrek_tpu.pipeline.discover import detect_breakpoints

    rng = random.Random(4)
    projected = []
    for i in range(73):  # ragged tail vs batch_reads on purpose
        runs = []
        for _ in range(rng.randint(1, 20)):
            runs.append((rng.choice([0, 1, 2, 4, 7, 8]),
                         rng.randint(1, 120)))
        projected.append(ProjectedRead(
            read_name=f"r{i}", read_len=2000, read_start=0, read_end=2000,
            rc=bool(i % 3 == 0), reference_start=rng.randint(0, 10_000),
            runs=runs,
        ))
    dense = detect_breakpoints(iter(projected), 50, batch_reads=32,
                               n_shards=1)
    sharded = detect_breakpoints(iter(projected), 50, batch_reads=32,
                                 n_shards=8)
    assert [b.__dict__ for b in sharded] == [b.__dict__ for b in dense]
    scalar = [b for p in projected for b in scan_breakpoints(p, 50)]
    assert [b.__dict__ for b in dense] == [b.__dict__ for b in scalar]


def test_compact_csr_matches_padded():
    """The flat-CSR feed (scan_projected_runs_compact_csr, the
    single-device production path) must produce identical compact
    results to the padded form it replaces (round 5: the disc loop is
    up-transfer bound; CI's 8-virtual-device mesh takes the sharded
    padded path, so this exercises the CSR kernel explicitly)."""
    import numpy as np

    from svtrek_tpu.ops.discover import (
        scan_projected_runs_compact, scan_projected_runs_compact_csr,
    )

    rng = np.random.default_rng(3)
    N, O = 64, 32
    n_runs = rng.integers(1, O, N).astype(np.int32)
    ops = np.full((N, O), 9, np.int8)
    lens = np.zeros((N, O), np.int32)
    for r in range(N):
        k = n_runs[r]
        ops[r, :k] = rng.choice([0, 1, 2, 4], k).astype(np.int8)
        lens[r, :k] = rng.integers(1, 120, k)
    ref_start = rng.integers(0, 1 << 20, N).astype(np.int32)
    total = int(n_runs.sum())
    T = 1024
    of = np.zeros(T, np.int8)
    lf = np.zeros(T, np.int32)
    pos = 0
    for r in range(N):
        k = int(n_runs[r])
        of[pos:pos + k] = ops[r, :k]
        lf[pos:pos + k] = lens[r, :k]
        pos += k
    pad = [np.asarray(x) for x in scan_projected_runs_compact(
        ops, lens, n_runs, ref_start, min_len=50, cap=256)]
    csr = [np.asarray(x) for x in scan_projected_runs_compact_csr(
        of, lf, n_runs, ref_start, O=O, min_len=50, cap=256)]
    for a, b in zip(pad, csr):
        assert np.array_equal(a, b)
    assert int(pad[0]) > 0  # the fixture actually produced signals
