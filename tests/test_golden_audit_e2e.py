"""END-TO-END golden parity: the reference's OWN audit driver vs ours.

tests/refshim builds `refaudit` from the reference's unmodified audit.c
+ init.c + tpool.c + refinement.c + utils.c (stub htslib backed by an
in-memory read store loaded from a file).  This test generates random
VCFs + read sets, runs the REAL reference driver (single worker for
deterministic output order), runs this framework's run_audit on a real
BAM with the identical reads, and byte-compares every result line —
covering the full chain: thread_func's strtok_r field walk, SVTYPE/END
extraction quirks (including strstr("END=") matching inside CIEND=),
type inference from allele lengths, the uint32 interval arithmetic, the
refine kernels, and the printf result formats (audit.c:50-236).
"""
from __future__ import annotations

import os
import subprocess

import numpy as np
import pytest

from svtrek_tpu.config import AudtConfig
from svtrek_tpu.io.bam import BamRecord, BamWriter
from svtrek_tpu.pipeline.audit import run_audit

try:
    import refshim
except ImportError:
    from tests import refshim

try:
    AUDIT_BIN = refshim.build_audit_bin()
    _SKIP = None
except Exception as e:  # pragma: no cover
    _SKIP = str(e)

pytestmark = pytest.mark.skipif(
    _SKIP is not None, reason=f"refaudit unavailable: {_SKIP}")

CHROM_LEN = 2_000_000


def gen_reads(rng: np.random.Generator, n_chrom: int = 2,
              n_reads: int = 500):
    """Random (tid, pos, cigar) reads biased toward SV evidence."""
    reads = []
    for _ in range(n_reads):
        tid = int(rng.integers(0, n_chrom))
        pos = int(rng.integers(0, CHROM_LEN - 50_000))
        cigar = []
        if rng.random() < 0.3:
            cigar.append((4, int(rng.integers(20, 300))))
        cigar.append((0, int(rng.integers(500, 9_000))))
        r = rng.random()
        if r < 0.4:
            cigar.append((2, int(rng.choice([49, 50, 51, 80, 200, 400]))))
        elif r < 0.7:
            cigar.append((1, int(rng.choice([49, 50, 51, 80, 200]))))
        cigar.append((0, int(rng.integers(200, 4_000))))
        if rng.random() < 0.3:
            cigar.append((4, int(rng.integers(20, 300))))
        reads.append((tid, pos, cigar))
    reads.sort(key=lambda r: (r[0], r[1]))
    return reads


def gen_vcf_lines(rng: np.random.Generator, n_records: int = 50):
    """Random records hitting the parser's quirk surface."""
    lines = []
    for i in range(n_records):
        chrom = rng.choice(["1", "2", "chr1", "chr2", "X", "0"])
        pos = int(rng.integers(1_000, CHROM_LEN - 60_000))
        kind = rng.random()
        info_extra = "DP=9"
        if rng.random() < 0.4:
            # CIPOS/CIEND noise — CIEND= contains 'END=' and the
            # reference's strstr(info, "END=") finds it FIRST (the
            # load-bearing quirk; audit.c END extraction).
            info_extra += f";CIPOS=-{int(rng.integers(20, 60))},30"
            if rng.random() < 0.7:
                info_extra += f";CIEND=-25,{int(rng.integers(20, 60))}"
        if kind < 0.3:  # explicit DEL
            svlen = int(rng.choice([30, 49, 50, 51, 120, 400]))
            info = (f"SVTYPE=DEL;{info_extra};END={pos + svlen}"
                    if rng.random() < 0.5
                    else f"{info_extra};SVTYPE=DEL;END={pos + svlen}")
            lines.append(f"{chrom}\t{pos}\tsv{i}\tN\t<DEL>\t.\tPASS\t{info}")
        elif kind < 0.5:  # explicit INS
            info = f"SVTYPE=INS;{info_extra}"
            lines.append(f"{chrom}\t{pos}\tsv{i}\tN\t<INS>\t.\tPASS\t{info}")
        elif kind < 0.65:  # explicit INV
            svlen = int(rng.choice([40, 60, 500]))
            info = f"SVTYPE=INV;{info_extra};END={pos + svlen}"
            lines.append(f"{chrom}\t{pos}\tsv{i}\tN\t<INV>\t.\tPASS\t{info}")
        elif kind < 0.8:  # inferred DEL from allele lengths, no END=
            ref = "A" * int(rng.choice([60, 120, 300]))
            lines.append(
                f"{chrom}\t{pos}\tsv{i}\t{ref}\tA\t.\tPASS\t{info_extra}")
        elif kind < 0.95:  # inferred INS
            alt = "T" * int(rng.choice([60, 200]))
            lines.append(
                f"{chrom}\t{pos}\tsv{i}\tT\t{alt},{alt[:30]}\t.\tPASS\t"
                f"{info_extra}")
        else:  # SNP-ish (skipped by both)
            lines.append(f"{chrom}\t{pos}\tsv{i}\tA\tC\t.\tPASS\t{info_extra}")
    return lines


def run_reference_driver(tmp_path, reads, vcf_text: str) -> list[str]:
    reads_bin = tmp_path / "reads.bin"
    refshim.write_reads_file(str(reads_bin), reads)
    vcf = tmp_path / "in.vcf"
    # REFERENCE BUG (found by this harness): line_queue_pop returns NULL
    # as soon as exit_signal is set even with lines still queued
    # (audit.c:39-41), silently dropping the trailing <= tload_factor x
    # threads records of every run.  This framework deliberately
    # processes every record, so the reference's input is padded with
    # sentinel SNP records (skipped without output by both sides) to
    # flush the real records through its queue.
    sentinels = "".join(f"1\t{1000 + i}\tpad{i}\tA\tC\t.\tPASS\tDP=1\n"
                        for i in range(4))
    vcf.write_text(vcf_text + sentinels)
    dummy_bam = tmp_path / "dummy.bam"
    dummy_bam.write_bytes(b"")  # only existence-checked by the stub
    env = dict(os.environ, SVTREK_SHIM_READS=str(reads_bin))
    proc = subprocess.run(
        [AUDIT_BIN, "audt", "-b", str(dummy_bam), "-v", str(vcf), "-t", "1"],
        env=env, capture_output=True, text=True, timeout=240)
    # the reference's audit() returns 1 on success (audit.c:367 quirk)
    assert proc.returncode == 1, (proc.returncode, proc.stderr[-2000:])
    return [l for l in proc.stdout.splitlines() if l.startswith("(")]


def run_ours(tmp_path, reads, vcf_text: str, extract: str) -> list[str]:
    bam = str(tmp_path / f"ours_{extract}.bam")
    with BamWriter(bam, [("1", CHROM_LEN), ("2", CHROM_LEN)]) as w:
        for k, (tid, pos, cigar) in enumerate(reads):
            w.write(BamRecord(name=f"r{k}", flag=0, tid=tid, pos=pos,
                              mapq=60, cigar=cigar, seq=""))
    vcf = tmp_path / f"ours_{extract}.vcf"
    vcf.write_text(vcf_text)
    import io

    cfg = AudtConfig(bam_file=bam, vcf_file=str(vcf), extract=extract)
    return run_audit(cfg, out=io.StringIO(), err=io.StringIO())


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_golden_audit_end_to_end(tmp_path, seed):
    rng = np.random.default_rng(seed)
    reads = gen_reads(rng)
    header = ("##fileformat=VCFv4.2\n"
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    vcf_text = header + "\n".join(gen_vcf_lines(rng)) + "\n"

    want = run_reference_driver(tmp_path, reads, vcf_text)
    assert want, "reference produced no result lines — bad generator?"
    for extract in ("host", "device"):
        got = run_ours(tmp_path, reads, vcf_text, extract)
        assert got == want, (
            f"seed {seed} extract={extract}:\n"
            + "\n".join(f"ref: {a!r}\nours:{b!r}"
                        for a, b in zip(want, got) if a != b)
            + f"\nlen ref={len(want)} ours={len(got)}")


@pytest.mark.parametrize("seed", [0, 5])
def test_golden_audit_real_file_backend(tmp_path, seed):
    """refbench — the reference driver on REAL BAM/BAI files via the
    htslib-faithful backend (tests/refshim/htsio.c) — must match our
    pipeline byte-for-byte.  This is the measured-performance baseline
    of bench.py, so its correctness is load-bearing: a wrong backend
    would invalidate the vs_baseline ratio."""
    try:
        bench_bin = refshim.build_bench_bin()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"refbench unavailable: {e}")
    rng = np.random.default_rng(seed)
    reads = gen_reads(rng)
    header = ("##fileformat=VCFv4.2\n"
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    vcf_text = header + "\n".join(gen_vcf_lines(rng)) + "\n"

    bam = str(tmp_path / "real.bam")
    with BamWriter(bam, [("1", CHROM_LEN), ("2", CHROM_LEN)]) as w:
        for k, (tid, pos, cigar) in enumerate(reads):
            qlen = sum(l for op, l in cigar if op in (0, 1, 4))
            seq = "ACGT" * (qlen // 4 + 1)
            w.write(BamRecord(name=f"r{k}", flag=0, tid=tid, pos=pos,
                              mapq=60, cigar=cigar, seq=seq[:qlen]))
    vcf = tmp_path / "real.vcf"
    # sentinel padding flushes the reference's trailing-record queue bug
    sentinels = "".join(f"1\t{1000 + i}\tpad{i}\tA\tC\t.\tPASS\tDP=1\n"
                        for i in range(4))
    vcf.write_text(vcf_text + sentinels)
    proc = subprocess.run(
        [bench_bin, "audt", "-b", bam, "-v", str(vcf), "-t", "1"],
        capture_output=True, text=True, timeout=240)
    assert proc.returncode == 1, (proc.returncode, proc.stderr[-2000:])
    want = [l for l in proc.stdout.splitlines() if l.startswith("(")]
    assert want, "refbench produced no result lines"

    import io

    cfg = AudtConfig(bam_file=bam, vcf_file=str(tmp_path / "ours.vcf"))
    (tmp_path / "ours.vcf").write_text(vcf_text)
    got = run_audit(cfg, out=io.StringIO(), err=io.StringIO())
    assert got == want, (
        "\n".join(f"ref: {a!r}\nours:{b!r}"
                  for a, b in zip(want, got) if a != b)
        + f"\nlen ref={len(want)} ours={len(got)}")


def test_golden_audit_dense_window(tmp_path):
    """Dense evidence (overflow regimes) against the real driver."""
    rng = np.random.default_rng(9)
    reads = []
    sv_pos = 500_000
    for i in range(250):
        start0 = sv_pos - 3000 + i * 3
        lead = 3000 - i * 3 + (i % 5) - 2
        reads.append((0, start0, [(0, max(lead, 1)), (2, 400), (0, 800)]))
    reads.sort(key=lambda r: (r[0], r[1]))
    header = ("##fileformat=VCFv4.2\n"
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    vcf_text = header + (f"1\t{sv_pos}\tsv0\tN\t<DEL>\t.\tPASS\t"
                         f"SVTYPE=DEL;END={sv_pos + 400}\n")
    want = run_reference_driver(tmp_path, reads, vcf_text)
    import dataclasses as _d

    for extract in ("host", "device"):
        got = run_ours(tmp_path, reads, vcf_text, extract)
        assert got == want, (extract, want, got)
    # tiny capacities → every fallback path, still byte-identical
    bam = str(tmp_path / "ours_host.bam")
    import io

    cfg = AudtConfig(bam_file=bam, vcf_file=str(tmp_path / "ours_host.vcf"),
                     extract="host", cand_width=16, sweep_width=8,
                     max_candidates=16)
    got = run_audit(cfg, out=io.StringIO(), err=io.StringIO())
    assert got == want
