"""--refine-inv (VERDICT r2 item 7): opt-in real INV refinement.

The reference *intends* INV refinement but refine_point collects D
evidence only for SV_INS and is only ever called with SV_INV
(refinement.c:250, 336-338), so both INV breakpoints always print NA.
Default-off behavior mirrors that exactly (tests here + the golden
full-driver diff in test_golden_audit_e2e.py); with the flag, soft-clip
+ D>50 evidence at both breakpoints runs through the existing consensus.
"""
from __future__ import annotations

import io
import random

import pytest

from svtrek_tpu.config import AudtConfig
from svtrek_tpu.constants import CIGAR_M, CIGAR_S
from svtrek_tpu.io.bam import BamRecord, BamWriter
from svtrek_tpu.pipeline.audit import run_audit

INV_POS = 150_000
INV_END = 190_000
NA = "4294967295"


def _clip_reads(rng, breakpoint0, side, depth=12):
    """Reads whose alignment is clipped at `breakpoint0` (0-based):
    side='end' → trailing soft clip (alignment ENDS at the breakpoint),
    side='start' → leading soft clip (alignment STARTS there)."""
    reads = []
    for _ in range(depth):
        jit = rng.randint(-2, 2)
        if side == "end":
            m = rng.randint(2_000, 6_000)
            start0 = breakpoint0 + jit - m
            cigar = [(CIGAR_M, m), (CIGAR_S, rng.randint(200, 2_000))]
        else:
            start0 = breakpoint0 + jit
            cigar = [(CIGAR_S, rng.randint(200, 2_000)),
                     (CIGAR_M, rng.randint(2_000, 6_000))]
        reads.append((start0, cigar))
    return reads


@pytest.fixture(scope="module")
def inv_fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("refine_inv")
    bam = str(d / "inv.bam")
    vcf = str(d / "inv.vcf")
    rng = random.Random(17)
    reads = sorted(
        _clip_reads(rng, INV_POS, "end") + _clip_reads(rng, INV_END, "start")
    )
    with BamWriter(bam, [("1", 400_000)]) as w:
        for i, (start0, cigar) in enumerate(reads):
            qlen = sum(l for op, l in cigar if op in (0, 1, 4))
            w.write(BamRecord(name=f"r{i}", flag=0, tid=0, pos=start0,
                              mapq=60, cigar=cigar, seq="A" * qlen))
    with open(vcf, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        fh.write(f"1\t{INV_POS}\tinv0\tN\t<INV>\t.\tPASS\t"
                 f"SVTYPE=INV;END={INV_END}\n")
    return bam, vcf


def test_default_is_reference_parity(inv_fixture):
    """Without the flag, INV refinement is the reference's structural
    no-op: both breakpoints print the NA sentinel."""
    bam, vcf = inv_fixture
    lines = run_audit(AudtConfig(bam_file=bam, vcf_file=vcf),
                      out=io.StringIO(), err=io.StringIO())
    assert len(lines) == 1
    assert lines[0].count(NA) == 2


@pytest.mark.parametrize("extract", ["host", "device"])
@pytest.mark.parametrize("native", [True, False])
def test_flag_refines_both_breakpoints(inv_fixture, extract, native):
    """--refine-inv recovers both planted breakpoints within a few bp
    on every extraction path (C host walk, device kernel, python IO)."""
    bam, vcf = inv_fixture
    cfg = AudtConfig(bam_file=bam, vcf_file=vcf, refine_inv=True,
                     extract=extract, use_native_io=native)
    lines = run_audit(cfg, out=io.StringIO(), err=io.StringIO())
    assert len(lines) == 1
    assert NA not in lines[0]
    import re

    m = re.search(r"ref pos: (\d+), ref end: (\d+)", lines[0])
    rstart, rend = int(m.group(1)), int(m.group(2))
    assert abs(rstart - INV_POS) <= 5
    assert abs(rend - INV_END) <= 5


def test_flag_and_default_agree_elsewhere(inv_fixture, tmp_path):
    """DEL/INS records are untouched by --refine-inv."""
    from tests.fixtures import PlantedSV, write_fixture

    bam, vcf = write_fixture(str(tmp_path), [
        PlantedSV(1, 50_000, 50_400, "DEL", 400),
        PlantedSV(1, 120_000, 120_001, "INS", 120),
    ], {1: 300_000}, seed=23)
    base = dict(bam_file=bam, vcf_file=vcf)
    a = run_audit(AudtConfig(**base), out=io.StringIO(), err=io.StringIO())
    b = run_audit(AudtConfig(**base, refine_inv=True),
                  out=io.StringIO(), err=io.StringIO())
    assert a == b
