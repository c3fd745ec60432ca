"""--chrom-by-name extension (VERDICT round-1 item 8).

The reference assumes numeric chromosome names and queries tid=chrom-1
(refinement.c:114), so a chrX VCF record silently refines to all-NA.
With --chrom-by-name the framework resolves CHROM via the BAM header
(chr-prefix tolerant) and refines correctly; without it, parity behavior
(all-NA on chrX) is preserved byte for byte.
"""
from __future__ import annotations

import io

import pytest

from svtrek_tpu.config import AudtConfig
from svtrek_tpu.io.bam import BamRecord, BamWriter
from svtrek_tpu.pipeline.audit import run_audit
from tests.fixtures import PlantedSV, simulate_reads_for_sv


@pytest.fixture(scope="module")
def chrx_fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("chrx")
    bam = str(d / "x.bam")
    vcf = str(d / "x.vcf")
    import random

    rng = random.Random(11)
    sv = PlantedSV(1, 50_000, 50_400, "DEL", 400)
    reads = [(s, c) for s, c, _ in simulate_reads_for_sv(sv, rng)]
    reads.sort()
    with BamWriter(bam, [("chrX", 500_000)]) as w:
        for i, (start0, cigar) in enumerate(reads):
            qlen = sum(l for op, l in cigar if op in (0, 1, 4))
            w.write(BamRecord(name=f"r{i}", flag=0, tid=0, pos=start0,
                              mapq=60, cigar=cigar, seq="A" * qlen))
    with open(vcf, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        fh.write("chrX\t50000\tsv0\tN\t<DEL>\t.\tPASS\t"
                 "SVTYPE=DEL;END=50400\n")
    return bam, vcf


@pytest.mark.parametrize("native", [True, False])
def test_chrx_refines_with_flag(chrx_fixture, native):
    bam, vcf = chrx_fixture
    cfg = AudtConfig(bam_file=bam, vcf_file=vcf, chrom_by_name=True,
                     use_native_io=native)
    lines = run_audit(cfg, out=io.StringIO(), err=io.StringIO())
    assert len(lines) == 1
    # CHROM printed by name; both breakpoints land within a few bp.
    assert lines[0].startswith("(DEL) chr: chrX, org pos: 50000")
    assert "ref pos: NA" not in lines[0]
    assert "ref end: NA" not in lines[0]


def test_chrx_parity_without_flag(chrx_fixture):
    bam, vcf = chrx_fixture
    cfg = AudtConfig(bam_file=bam, vcf_file=vcf)
    lines = run_audit(cfg, out=io.StringIO(), err=io.StringIO())
    # atoi("X") == 0 → tid -1 → no evidence → NA, numeric chrom printed
    # (the reference's exact behavior).
    assert lines == [
        "(DEL) chr: 0, org pos: 50000, org end: 50400, ref pos: NA, "
        "ref end: NA, diff pos: NA, diff end: NA"
    ]


def test_unknown_chrom_warns(chrx_fixture):
    bam, vcf_old = chrx_fixture
    import os

    vcf = os.path.join(os.path.dirname(vcf_old), "bad.vcf")
    with open(vcf, "w") as fh:
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        fh.write("chr9\t50000\tsv0\tN\t<DEL>\t.\tPASS\t"
                 "SVTYPE=DEL;END=50400\n")
    err = io.StringIO()
    cfg = AudtConfig(bam_file=bam, vcf_file=vcf, chrom_by_name=True)
    lines = run_audit(cfg, out=io.StringIO(), err=err)
    assert "not in the BAM header" in err.getvalue()
    assert "ref pos: NA" in lines[0]


# ---- scan mode (VERDICT r2 item 8: scan lacked --chrom-by-name) ----

@pytest.fixture(scope="module")
def chrx_ins_bam(tmp_path_factory):
    """INS-supporting reads on a BAM whose only reference is 'chrX'."""
    d = tmp_path_factory.mktemp("chrx_scan")
    bam = str(d / "xi.bam")
    import random

    rng = random.Random(5)
    sv = PlantedSV(1, 50_000, 50_001, "INS", 120)
    reads = sorted((s, c) for s, c, _ in simulate_reads_for_sv(sv, rng))
    with BamWriter(bam, [("chrX", 500_000)]) as w:
        for i, (start0, cigar) in enumerate(reads):
            qlen = sum(l for op, l in cigar if op in (0, 1, 4))
            w.write(BamRecord(name=f"r{i}", flag=0, tid=0, pos=start0,
                              mapq=60, cigar=cigar, seq="A" * qlen))
    return bam


@pytest.mark.parametrize("native", [True, False])
@pytest.mark.parametrize("name", ["chrX", "X"])
def test_scan_chrom_by_name(chrx_ins_bam, native, name):
    """scan -c chrX --chrom-by-name finds the planted INS (chr-prefix
    tolerant in both directions, like audt)."""
    from svtrek_tpu.config import ScanConfig
    from svtrek_tpu.pipeline.scan import run_scan

    cfg = ScanConfig(bam_file=chrx_ins_bam, chrom_by_name=True,
                     chrom_name=name, start=45_000, end=55_000,
                     window_size=1000, use_native_io=native)
    best, _ = run_scan(cfg, out=io.StringIO())
    assert abs(best - 50_000) <= 5


def test_scan_numeric_parity_misses(chrx_ins_bam):
    """Without the flag, chrom=9 -> tid 8 (reference parity,
    sliding_window.c:27): no such tid, no evidence, best = -1."""
    from svtrek_tpu.config import ScanConfig
    from svtrek_tpu.pipeline.scan import run_scan

    cfg = ScanConfig(bam_file=chrx_ins_bam, chrom=9, start=45_000,
                     end=55_000, window_size=1000)
    best, _ = run_scan(cfg, out=io.StringIO())
    assert best == -1
