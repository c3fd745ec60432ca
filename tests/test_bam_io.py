"""BGZF/BAM/BAI round-trip and region-query tests.

Region queries are validated against a brute-force scan of all records
(the ground truth for htslib-equivalent fetch semantics)."""
import random

import numpy as np
import pytest

from svtrek_tpu.constants import CIGAR_D, CIGAR_I, CIGAR_M, CIGAR_S, CONSUMES_REF
from svtrek_tpu.io.bam import BamReader, BamRecord, BamWriter
from svtrek_tpu.io.bgzf import BgzfReader, BgzfWriter
from svtrek_tpu.io.bai import reg2bin, reg2bins


def test_bgzf_roundtrip(tmp_path):
    path = str(tmp_path / "t.bgzf")
    rng = random.Random(0)
    payload = bytes(rng.randrange(256) for _ in range(300_000))
    with BgzfWriter(path) as w:
        for i in range(0, len(payload), 12345):
            w.write(payload[i : i + 12345])
    r = BgzfReader(path)
    assert r.read(len(payload) + 100) == payload


def test_bgzf_virtual_offsets(tmp_path):
    path = str(tmp_path / "t.bgzf")
    w = BgzfWriter(path)
    offsets = []
    chunks = [bytes([i]) * (10000 + i * 997) for i in range(20)]
    for c in chunks:
        offsets.append(w.tell())
        w.write(c)
    w.close()
    r = BgzfReader(path)
    for c, off in zip(chunks, offsets):
        r.seek(off)
        assert r.read(len(c)) == c


def test_reg2bin_consistency():
    rng = random.Random(1)
    for _ in range(500):
        beg = rng.randrange(0, 1 << 29)
        end = beg + rng.randrange(1, 100000)
        b = reg2bin(beg, end)
        assert b in reg2bins(beg, end)


def _random_records(rng, n, chrom_len, tid=0):
    recs = []
    for i in range(n):
        pos = rng.randrange(0, chrom_len - 20000)
        cigar = [(CIGAR_M, rng.randrange(100, 15000))]
        if rng.random() < 0.3:
            cigar.append((CIGAR_D, rng.randrange(20, 100)))
            cigar.append((CIGAR_M, rng.randrange(100, 3000)))
        if rng.random() < 0.3:
            cigar.insert(0, (CIGAR_S, rng.randrange(10, 300)))
        recs.append(BamRecord(
            name=f"r{i}", flag=0, tid=tid, pos=pos, mapq=40, cigar=cigar,
            seq="A" * sum(l for op, l in cigar
                          if op in (CIGAR_M, CIGAR_I, CIGAR_S)),
        ))
    recs.sort(key=lambda r: r.pos)
    return recs


def test_bam_roundtrip_and_fetch(tmp_path):
    path = str(tmp_path / "t.bam")
    rng = random.Random(2)
    chrom_len = 2_000_000
    recs = _random_records(rng, 400, chrom_len)
    with BamWriter(path, [("1", chrom_len)]) as w:
        for r in recs:
            w.write(r)

    rd = BamReader(path)
    assert rd.references == [("1", chrom_len)]
    got = list(rd)
    assert len(got) == len(recs)
    for a, b in zip(got, recs):
        assert (a.name, a.pos, a.cigar) == (b.name, b.pos, b.cigar)

    # Region queries vs brute force.
    for _ in range(50):
        beg = rng.randrange(0, chrom_len)
        end = beg + rng.randrange(1, 60000)
        want = [r.name for r in recs if r.pos < end and r.endpos > beg]
        have = [r.name for r in rd.fetch(0, beg, end)]
        assert have == want, (beg, end)

    # Degenerate queries (reference's wrapped uint32 coordinates).
    assert list(rd.fetch(0, 4_294_000_000, 4_294_002_000)) == []
    assert list(rd.fetch(0, 500, 100)) == []
    assert list(rd.fetch(-1, 0, 1000)) == []
    assert list(rd.fetch(5, 0, 1000)) == []


def test_bam_multi_ref_fetch(tmp_path):
    path = str(tmp_path / "t.bam")
    rng = random.Random(3)
    lens = [800_000, 600_000]
    all_recs = {0: _random_records(rng, 150, lens[0], 0),
                1: _random_records(rng, 150, lens[1], 1)}
    with BamWriter(path, [("1", lens[0]), ("2", lens[1])]) as w:
        for tid in (0, 1):
            for r in all_recs[tid]:
                w.write(r)
    rd = BamReader(path)
    for tid in (0, 1):
        for _ in range(20):
            beg = rng.randrange(0, lens[tid])
            end = beg + rng.randrange(1, 50000)
            want = [r.name for r in all_recs[tid]
                    if r.pos < end and r.endpos > beg]
            have = [r.name for r in rd.fetch(tid, beg, end)]
            assert have == want
