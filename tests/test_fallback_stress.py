"""Fallback-cliff stress (VERDICT round-1 item 7): dense-repeat windows
that overflow the candidate capacity (K) and the consensus sweep budget
must still produce EXACT results via the host fallbacks, and --verbose
must attribute the fallbacks to their causes.
"""
from __future__ import annotations

import io

import pytest

from svtrek_tpu.config import AudtConfig
from svtrek_tpu.io.bam import BamRecord, BamWriter
from svtrek_tpu.oracle import refine_task
from svtrek_tpu.constants import KIND_DEL_START
from svtrek_tpu.pipeline.audit import AuditStats, run_audit

CHROM_LEN = 400_000


@pytest.fixture(scope="module")
def dense_fixture(tmp_path_factory):
    """A pathological window: ~300 reads each carrying a >50 bp D op at
    slightly different positions → hundreds of in-range candidates, far
    beyond small K/sweep budgets."""
    d = tmp_path_factory.mktemp("dense")
    bam = str(d / "dense.bam")
    vcf = str(d / "dense.vcf")
    reads = []
    sv_pos = 50_000
    for i in range(300):
        start0 = sv_pos - 3000 + i * 3
        # D evidence lands at start0 + lead: spread candidates over
        # ~900 bp so every anchor stays in consensus range (500).
        lead = 3000 - i * 3 + (i % 7) - 3
        reads.append((start0, [(0, lead), (2, 400), (0, 800)]))
    reads.sort()
    with BamWriter(bam, [("1", CHROM_LEN)]) as w:
        for i, (s, cig) in enumerate(reads):
            qlen = sum(l for op, l in cig if op in (0, 1, 4))
            w.write(BamRecord(name=f"r{i}", flag=0, tid=0, pos=s,
                              mapq=60, cigar=cig, seq="A" * qlen))
    with open(vcf, "w") as fh:
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        fh.write(f"1\t{sv_pos}\tsv0\tN\t<DEL>\t.\tPASS\t"
                 f"SVTYPE=DEL;END={sv_pos + 400}\n")
    return bam, vcf, reads, sv_pos


def expected_lines(reads, sv_pos, cfg):
    """Ground truth through the proven scalar oracle."""
    import svtrek_tpu.constants as C
    from svtrek_tpu.constants import KIND_DEL_END
    from svtrek_tpu.emit import format_del

    def htslib_filter(beg, end):
        out = []
        for pos, cigar in reads:
            endpos = pos + sum(l for op, l in cigar
                               if op in (0, 2, 3, 7, 8))
            if pos < end and endpos > beg:
                out.append((pos, cigar))
        return out

    end = sv_pos + 400
    s_lo, s_hi = C.u32(sv_pos - cfg.wider_interval), \
        C.u32(sv_pos + cfg.narrow_interval)
    rs = refine_task(KIND_DEL_START,
                     htslib_filter(C.u32(s_lo - 1), C.u32(s_hi - 1)),
                     s_lo, s_hi, sv_pos)
    e_lo, e_hi = C.u32(end - cfg.narrow_interval), \
        C.u32(end + cfg.narrow_interval)
    re_ = refine_task(KIND_DEL_END,
                      htslib_filter(C.u32(e_lo - 1), C.u32(e_hi - 1)),
                      e_lo, e_hi, end)
    return [format_del(1, sv_pos, end, C.u32(rs), C.u32(re_))]


@pytest.mark.parametrize("extract", ["host", "device"])
@pytest.mark.parametrize("cand_width,sweep_width", [
    (16, 8),     # K overflow AND sweep overflow territory
    (1024, 8),   # sweep overflow only
    (16, 1024),  # K overflow only
])
def test_dense_repeat_exactness(dense_fixture, extract, cand_width,
                                sweep_width):
    bam, vcf, reads, sv_pos = dense_fixture
    cfg = AudtConfig(bam_file=bam, vcf_file=vcf, extract=extract,
                     cand_width=cand_width, sweep_width=sweep_width,
                     max_candidates=cand_width, verbose=True)
    err = io.StringIO()
    lines = run_audit(cfg, out=io.StringIO(), err=err)
    assert lines == expected_lines(reads, sv_pos, cfg), (
        extract, cand_width, sweep_width, err.getvalue())


def test_verbose_reports_fallback_causes(dense_fixture):
    bam, vcf, reads, sv_pos = dense_fixture
    cfg = AudtConfig(bam_file=bam, vcf_file=vcf, extract="host",
                     cand_width=16, sweep_width=1024, verbose=True)
    err = io.StringIO()
    run_audit(cfg, out=io.StringIO(), err=err)
    text = err.getvalue()
    assert "kovf=" in text and "sweep=" in text and "long_ops=" in text
    # the dense DEL-start window must show up as a K overflow
    kovf = int(text.split("kovf=")[1].split()[0])
    assert kovf >= 1, text


def test_stats_report_fields():
    s = AuditStats(records=1, windows=2, oracle_windows=3,
                   fallback_kovf=1, fallback_sweep=2)
    buf = io.StringIO()
    s.report(buf)
    out = buf.getvalue()
    assert "oracle_fallbacks=3" in out
    assert "kovf=1" in out and "sweep=2" in out
