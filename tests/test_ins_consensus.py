"""--ins-consensus e2e: the audt-mode POA consensus path
(BASELINE.json configs[2]).

A planted INS whose supporting reads carry the inserted bases in SEQ
must come back out as a consensus sequence on the result line —
extracted by the native reader's SEQ decode (svbam_ins_seqs) or the
pure-Python fallback, batched through ops/poa_batch.  Capability slot:
the reference's built-but-unused abPOA submodule (.gitmodules:5-7) and
the refine_ins evidence walk it extends (refinement.c:278-325)."""
from __future__ import annotations

import io
import os
import random
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svtrek_tpu.config import AudtConfig
from svtrek_tpu.constants import CIGAR_I, CIGAR_M, CIGAR_S
from svtrek_tpu.io.bam import BamRecord, BamWriter
from svtrek_tpu.pipeline.audit import run_audit

BASES = "ACGT"


def _rand_seq(rng, n):
    return "".join(rng.choice(BASES) for _ in range(n))


def _mutate(rng, seq, sub=0.03, ind=0.01):
    out = []
    for c in seq:
        r = rng.random()
        if r < ind / 2:
            continue                      # deletion
        out.append(rng.choice(BASES) if r < ind / 2 + sub else c)
        if rng.random() < ind / 2:
            out.append(rng.choice(BASES))  # insertion
    return "".join(out)


def _edit_distance(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def build_fixture(tmpdir, insert: str, depth: int = 10, noisy: bool = False,
                  seed: int = 0):
    """BAM with `depth` reads supporting an INS at pos 20_000 (1-based),
    each carrying (a possibly mutated copy of) `insert` in SEQ at the I
    op's query offset, plus spanning noise reads.  Returns (bam, vcf)."""
    rng = random.Random(seed)
    pos1 = 20_000                       # 1-based VCF POS
    bam = os.path.join(tmpdir, "ins.bam")
    vcf = os.path.join(tmpdir, "ins.vcf")
    reads = []
    for i in range(depth):
        start0 = (pos1 - 1) - rng.randint(2_000, 6_000)
        lead = (pos1 - 1) - start0      # I op lands exactly at pos1-1
        ins = _mutate(rng, insert) if noisy else insert
        tail = rng.randint(1_000, 3_000)
        cigar = [(CIGAR_M, lead), (CIGAR_I, len(ins)), (CIGAR_M, tail)]
        seq = _rand_seq(rng, lead) + ins + _rand_seq(rng, tail)
        sclip = rng.random() < 0.4
        if sclip:
            sl = rng.randint(20, 100)
            cigar.insert(0, (CIGAR_S, sl))
            seq = _rand_seq(rng, sl) + seq
        reads.append((start0, cigar, seq, f"sup{i}"))
    for i in range(15):
        start0 = rng.randint(10_000, 25_000)
        ln = rng.randint(2_000, 5_000)
        reads.append((start0, [(CIGAR_M, ln)], _rand_seq(rng, ln),
                      f"noise{i}"))
    with BamWriter(bam, [("1", 60_000)]) as w:
        for start0, cigar, seq, name in sorted(reads, key=lambda r: r[0]):
            w.write(BamRecord(name=name, flag=0, tid=0, pos=start0,
                              mapq=60, cigar=cigar, seq=seq))
    with open(vcf, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write('##INFO=<ID=SVTYPE,Number=1,Type=String,Description="x">\n')
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        fh.write(f"1\t{pos1}\tsv0\tN\t<INS>\t.\tPASS\tSVTYPE=INS\n")
    return bam, vcf


def _run(bam, vcf, native: bool, **kw):
    cfg = AudtConfig(bam_file=bam, vcf_file=vcf, use_native_io=native,
                     ins_consensus=True, **kw)
    return run_audit(cfg, out=io.StringIO(), err=io.StringIO())


@pytest.mark.parametrize("native", [True, False])
def test_clean_insert_recovered_exactly(tmp_path, native):
    insert = _rand_seq(random.Random(42), 80)
    bam, vcf = build_fixture(str(tmp_path), insert)
    lines = _run(bam, vcf, native)
    assert len(lines) == 1
    m = re.search(r"seq: ([ACGTN]+)$", lines[0])
    assert m, lines[0]
    # identical supporting inserts → the consensus IS the insert
    assert m.group(1) == insert


def test_graph_poa_engine_recovers_insert(tmp_path):
    """--poa-engine graph: the true-POA engine through the full audt
    pipeline (ops/poa_graph_batch.py)."""
    insert = _rand_seq(random.Random(21), 70)
    bam, vcf = build_fixture(str(tmp_path), insert, noisy=True, seed=21)
    lines = _run(bam, vcf, True, poa_engine="graph")
    m = re.search(r"seq: ([ACGTN]+)$", lines[0])
    assert m, lines[0]
    assert _edit_distance(m.group(1), insert) <= len(insert) // 10


@pytest.mark.parametrize("native", [True, False])
def test_noisy_insert_within_quality_bound(tmp_path, native):
    insert = _rand_seq(random.Random(7), 100)
    bam, vcf = build_fixture(str(tmp_path), insert, noisy=True, seed=7)
    lines = _run(bam, vcf, native)
    m = re.search(r"seq: ([ACGTN]+)$", lines[0])
    assert m, lines[0]
    # 3% sub / 1% indel per member: consensus within 10% edit distance
    assert _edit_distance(m.group(1), insert) <= len(insert) // 10


def test_native_and_python_io_agree(tmp_path):
    insert = _rand_seq(random.Random(3), 64)
    bam, vcf = build_fixture(str(tmp_path), insert, seed=3)
    assert _run(bam, vcf, True) == _run(bam, vcf, False)


def test_flag_off_is_exact_parity(tmp_path):
    insert = _rand_seq(random.Random(5), 64)
    bam, vcf = build_fixture(str(tmp_path), insert, seed=5)
    base = run_audit(AudtConfig(bam_file=bam, vcf_file=vcf),
                     out=io.StringIO(), err=io.StringIO())
    with_flag = _run(bam, vcf, True)
    assert [l.split(", seq:")[0] for l in with_flag] == base
    assert all("seq:" not in l for l in base)


def test_unrefined_ins_prints_na_seq(tmp_path):
    # depth below consensus_min_count → NA refinement → seq: NA
    insert = _rand_seq(random.Random(9), 64)
    bam, vcf = build_fixture(str(tmp_path), insert, depth=2, seed=9)
    lines = _run(bam, vcf, True)
    assert len(lines) == 1
    assert "ref pos: NA" in lines[0]
    assert lines[0].endswith("seq: NA")
