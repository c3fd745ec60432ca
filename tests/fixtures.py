"""Synthetic BAM/VCF fixture generation for end-to-end tests.

Plants DEL/INS/INV SVs on a synthetic reference, simulates long reads
whose CIGARs carry the SV signal (plus noisy reads), and writes
coordinate-sorted BAM + BAI with the framework's own writer — filling the
role of the missing reference test assets (SURVEY.md §4: the reference
ships no fixtures at all).
"""
from __future__ import annotations

import random
from dataclasses import dataclass

from svtrek_tpu.constants import CIGAR_D, CIGAR_I, CIGAR_M, CIGAR_S
from svtrek_tpu.io.bam import BamRecord, BamWriter


@dataclass
class PlantedSV:
    chrom: int          # 1-based numeric name ("1", "2", ...)
    pos: int            # 1-based breakpoint (start)
    end: int            # 1-based end (DEL/INV)
    svtype: str         # DEL / INS / INV
    svlen: int


def simulate_reads_for_sv(
    sv: PlantedSV,
    rng: random.Random,
    depth: int = 12,
    read_len: int = 8000,
    jitter: int = 2,
):
    """Reads supporting `sv`: each spans the breakpoint with a D/I op at
    (approximately) the true position, start-position randomized."""
    reads = []
    for i in range(depth):
        # 0-based alignment start, left of the breakpoint.
        start0 = (sv.pos - 1) - rng.randint(read_len // 4, read_len - 500)
        start0 = max(start0, 0)
        lead = (sv.pos - 1) - start0 + rng.randint(-jitter, jitter)
        lead = max(lead, 1)
        cigar = []
        if rng.random() < 0.3:
            cigar.append((CIGAR_S, rng.randint(20, 200)))
        cigar.append((CIGAR_M, lead))
        if sv.svtype == "DEL":
            cigar.append((CIGAR_D, sv.svlen + rng.randint(-1, 1)))
        elif sv.svtype == "INS":
            cigar.append((CIGAR_I, sv.svlen + rng.randint(-1, 1)))
        cigar.append((CIGAR_M, rng.randint(500, read_len // 2)))
        if rng.random() < 0.3:
            cigar.append((CIGAR_S, rng.randint(20, 200)))
        reads.append((start0, cigar, f"sv{sv.chrom}_{sv.pos}_{i}"))
    return reads


def simulate_noise_reads(rng, chrom_len, n, read_len=6000):
    reads = []
    for i in range(n):
        start0 = rng.randint(0, max(chrom_len - read_len, 1))
        cigar = [(CIGAR_M, rng.randint(read_len // 2, read_len))]
        if rng.random() < 0.2:
            cigar.insert(0, (CIGAR_S, rng.randint(10, 100)))
        if rng.random() < 0.2:
            cigar.append((CIGAR_S, rng.randint(10, 100)))
        reads.append((start0, cigar, f"noise_{i}"))
    return reads


def write_fixture(
    tmpdir: str,
    svs: list[PlantedSV],
    chrom_lens: dict[int, int],
    seed: int = 0,
    depth: int = 12,
    noise: int = 30,
):
    """Write fixture BAM+BAI and a plain SV VCF. Returns (bam, vcf) paths."""
    rng = random.Random(seed)
    bam_path = f"{tmpdir}/fixture.bam"
    vcf_path = f"{tmpdir}/fixture.vcf"

    refs = [(str(c), chrom_lens[c]) for c in sorted(chrom_lens)]
    tid_of = {c: i for i, c in enumerate(sorted(chrom_lens))}

    per_tid: dict[int, list] = {i: [] for i in range(len(refs))}
    for sv in svs:
        for start0, cigar, name in simulate_reads_for_sv(sv, rng, depth=depth):
            per_tid[tid_of[sv.chrom]].append((start0, cigar, name))
    for c, tid in tid_of.items():
        for start0, cigar, name in simulate_noise_reads(rng, chrom_lens[c], noise):
            per_tid[tid].append((start0, cigar, name))

    with BamWriter(bam_path, refs) as w:
        for tid in range(len(refs)):
            for start0, cigar, name in sorted(per_tid[tid], key=lambda r: r[0]):
                qlen = sum(l for op, l in cigar
                           if op in (CIGAR_M, CIGAR_I, CIGAR_S))
                w.write(BamRecord(
                    name=name, flag=0, tid=tid, pos=start0, mapq=60,
                    cigar=cigar, seq="A" * qlen,
                ))

    with open(vcf_path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write('##INFO=<ID=SVTYPE,Number=1,Type=String,Description="x">\n')
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for i, sv in enumerate(svs):
            info = f"SVTYPE={sv.svtype};END={sv.end}"
            fh.write(
                f"{sv.chrom}\t{sv.pos}\tsv{i}\tN\t<{sv.svtype}>\t.\tPASS\t{info}\n"
            )
    return bam_path, vcf_path
