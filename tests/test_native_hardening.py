"""Reader hardening (VERDICT round-1 item 4): corrupt/truncated BAMs
must RAISE — never return a silently-partial read set — and `.csi`
indexes load transparently next to `.bai` in both the native and the
pure-Python readers (htslib sam_index_load contract, audit.c:272).
"""
from __future__ import annotations

import os
import shutil

import numpy as np
import pytest

from svtrek_tpu.io.bai import BaiIndex
from svtrek_tpu.io.bam import BamReader, BamRecord, BamWriter
from svtrek_tpu.native import native_bam_reader
from svtrek_tpu.native.bamlib import NativeBamError

CHROM_LEN = 2_000_000


@pytest.fixture(scope="module")
def big_bam(tmp_path_factory):
    """A BAM large enough to span many BGZF blocks (long CIGARs)."""
    d = tmp_path_factory.mktemp("hardening")
    path = str(d / "big.bam")
    rng = np.random.default_rng(3)
    with BamWriter(path, [("1", CHROM_LEN)]) as w:
        pos = 1000
        for i in range(300):
            cigar = [(0, 100)]
            for _ in range(400):  # op-rich: ~0.5 MB of CIGAR total
                cigar.append((int(rng.choice([0, 1, 2])),
                              int(rng.integers(1, 30))))
            qlen = sum(l for op, l in cigar if op in (0, 1, 4))
            w.write(BamRecord(name=f"r{i}", flag=0, tid=0, pos=pos,
                              mapq=60, cigar=cigar, seq="A" * qlen))
            pos += 5000
    return path


def _fetch_all_native(path):
    r = native_bam_reader(path)
    assert r is not None
    try:
        return r.fetch_packed(0, 0, CHROM_LEN)
    finally:
        r.close()


def test_native_corrupt_block_raises(big_bam, tmp_path):
    bad = str(tmp_path / "corrupt.bam")
    shutil.copy(big_bam, bad)
    shutil.copy(big_bam + ".bai", bad + ".bai")
    size = os.path.getsize(bad)
    with open(bad, "r+b") as fh:  # trash the middle of the data stream
        fh.seek(size // 2)
        fh.write(b"\xaa" * min(8192, size - size // 2))
    r = native_bam_reader(bad)
    assert r is not None
    with pytest.raises(NativeBamError):
        r.fetch_packed(0, 0, CHROM_LEN)
    r.close()


def test_native_truncated_raises(big_bam, tmp_path):
    bad = str(tmp_path / "trunc.bam")
    shutil.copy(big_bam, bad)
    shutil.copy(big_bam + ".bai", bad + ".bai")
    size = os.path.getsize(bad)
    with open(bad, "r+b") as fh:
        fh.truncate(int(size * 0.6))
    r = native_bam_reader(bad)
    assert r is not None
    with pytest.raises(NativeBamError):
        r.fetch_packed(0, 0, CHROM_LEN)
    r.close()


def test_native_fetch_batch_corrupt_raises(big_bam, tmp_path):
    bad = str(tmp_path / "corrupt2.bam")
    shutil.copy(big_bam, bad)
    shutil.copy(big_bam + ".bai", bad + ".bai")
    size = os.path.getsize(bad)
    with open(bad, "r+b") as fh:
        fh.seek(size // 2)
        fh.write(b"\xaa" * 4096)
    r = native_bam_reader(bad)
    with pytest.raises(NativeBamError):
        r.fetch_batch(
            np.zeros(4, np.int32),
            np.array([0, 500_000, 1_000_000, 1_400_000], np.int64),
            np.full(4, CHROM_LEN, np.int64),
        )
    r.close()


def test_python_corrupt_block_raises(big_bam, tmp_path):
    bad = str(tmp_path / "pycorrupt.bam")
    shutil.copy(big_bam, bad)
    shutil.copy(big_bam + ".bai", bad + ".bai")
    size = os.path.getsize(bad)
    with open(bad, "r+b") as fh:
        fh.seek(size // 2)
        fh.write(b"\xaa" * 8192)
    reader = BamReader(bad)
    with pytest.raises(Exception):
        list(reader.fetch(0, 0, CHROM_LEN))
    reader.close()


def test_csi_native_parity(big_bam, tmp_path):
    want = _fetch_all_native(big_bam)
    assert len(want[0]) == 300

    csionly = str(tmp_path / "csionly.bam")
    shutil.copy(big_bam, csionly)
    BaiIndex.load(big_bam + ".bai").save_csi(csionly + ".csi")
    # no .bai next to csionly.bam — the reader must pick up .csi
    r = native_bam_reader(csionly)
    assert r is not None
    got = r.fetch_packed(0, 0, CHROM_LEN)
    r.close()
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)

    # regional query parity too (bin arithmetic through the CSI path)
    r1 = native_bam_reader(big_bam)
    r2 = native_bam_reader(csionly)
    for beg, end in [(0, 10_000), (700_000, 760_000), (1_400_000, CHROM_LEN)]:
        a = r1.fetch_packed(0, beg, end)
        b = r2.fetch_packed(0, beg, end)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
    r1.close()
    r2.close()


def test_csi_python_parity(big_bam, tmp_path):
    csionly = str(tmp_path / "pycsi.bam")
    shutil.copy(big_bam, csionly)
    BaiIndex.load(big_bam + ".bai").save_csi(csionly + ".csi")
    with BamReader(big_bam) as r1, BamReader(csionly) as r2:
        a = [(rec.pos, rec.cigar) for rec in r1.fetch(0, 700_000, 760_000)]
        b = [(rec.pos, rec.cigar) for rec in r2.fetch(0, 700_000, 760_000)]
    assert a == b and len(a) > 0


def test_ref_names(big_bam):
    r = native_bam_reader(big_bam)
    assert r.ref_name(0) == "1"
    assert r.tid_by_name("1") == 0
    assert r.tid_by_name("chr1") == 0  # chr-prefix tolerance
    assert r.tid_by_name("nope") == -1
    r.close()


def test_multiblock_record_skip_parity(tmp_path):
    """Records larger than one 64 KiB BGZF block (real long reads):
    bgzf_skip must hop whole blocks without decoding them and land
    exactly on the next record.  Parity vs the pure-Python reader."""
    import numpy as np

    path = str(tmp_path / "long.bam")
    rng = np.random.default_rng(4)
    reads = []
    pos = 1000
    for i in range(12):
        cigar = [(0, 100)]
        for _ in range(50):
            cigar.append((int(rng.choice([0, 1, 2])),
                          int(rng.integers(1, 400))))
        reads.append((pos, cigar))
        pos += 20_000
    with BamWriter(path, [("1", CHROM_LEN)]) as w:
        for i, (p, cig) in enumerate(reads):
            qlen = sum(l for op, l in cig if op in (0, 1, 4))
            # >=150 KB of random seq (padded with a trailing soft clip
            # so the CIGAR stays consistent) -> record spans 3+ blocks
            total = max(qlen, 150_000)
            if total > qlen:
                cig = cig + [(4, total - qlen)]
                reads[i] = (p, cig)
            seq = "".join("ACGT"[int(b)] for b in rng.integers(0, 4, total))
            w.write(BamRecord(name=f"r{i}", flag=0, tid=0, pos=p,
                              mapq=60, cigar=cig, seq=seq))
    nat = native_bam_reader(path)
    got = nat.fetch_packed(0, 0, CHROM_LEN)
    nat.close()
    with BamReader(path) as r:
        want = [(rec.pos, rec.cigar) for rec in r.fetch(0, 0, CHROM_LEN)]
    assert len(want) == 12
    assert got[0].tolist() == [p for p, _ in want]
    # reconstruct (op, len) pairs from the packed arrays
    outs = []
    for i in range(12):
        o = int(got[2][i])
        n = int(got[1][i])
        outs.append(list(zip(got[3][o:o+n].tolist(), got[4][o:o+n].tolist())))
    assert outs == [c for _, c in want]
