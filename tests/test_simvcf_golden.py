"""Golden parity for the VCF simulator: run the reference's OWN
utils/simvcf.py (it is Python — executed directly from the read-only
reference tree, seeded) and diff our tools/simvcf.py byte-for-byte.

Covers both inference mode (SV type from allele lengths) and tag mode,
including the reference's quirks: INV records pass through unmodified
(sv_len stays -1 and the length filter short-circuits), negative DEL
sv_len feeds the jitter formula through int() truncation, raw tab-split
keeps the newline in the last field.
"""
from __future__ import annotations

import os
import subprocess
import sys

import pytest

REF_SIMVCF = "/root/reference/utils/simvcf.py"
OUR_SIMVCF = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "simvcf.py")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_SIMVCF), reason="reference tree not mounted")

HEADER = """##fileformat=VCFv4.2
##INFO=<ID=SVTYPE,Number=1,Type=String,Description="x">
##INFO=<ID=MYTYPE,Number=1,Type=String,Description="x">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1
"""


def truth_vcf_infer() -> str:
    rows = [
        # big DEL ('.' id → GoldStandard1)
        ("1", 10_000, ".", "A" * 301, "A", "PASS", "DP=9"),
        # big INS (named id stays)
        ("chr2", 20_000, "ins1", "T", "T" * 220, "PASS", "DP=9"),
        # short indel → pass through
        ("3", 30_000, ".", "ACGT", "A", "PASS", "DP=9"),
        # SNP → pass through
        ("4", 40_000, ".", "A", "C", "PASS", "DP=9"),
        # another big DEL ('.' id → GoldStandard2)
        ("5", 50_000, ".", "G" * 99, "G", "PASS", "DP=9"),
        # multi-allelic ALT (raw len comparison, commas included)
        ("6", 60_000, ".", "C", "C" * 40 + "," + "C" * 30, "PASS", "DP=9"),
    ]
    out = HEADER
    for chrom, pos, vid, ref, alt, filt, info in rows:
        out += (f"{chrom}\t{pos}\t{vid}\t{ref}\t{alt}\t.\t{filt}\t{info}"
                f"\tGT\t0/1\n")
    return out


def truth_vcf_tagged() -> str:
    rows = [
        ("1", 10_000, ".", "N", "<DEL>", "MYTYPE=DEL;SVLEN=-300"),
        ("1", 20_000, ".", "N", "<INS>", "MYTYPE=INS;SVLEN=200"),
        ("1", 30_000, ".", "N", "<INV>", "MYTYPE=INV;SVLEN=500"),
        ("1", 40_000, ".", "N", "<DUP>", "MYTYPE=DUP;SVLEN=100"),
    ]
    out = HEADER
    for chrom, pos, vid, ref, alt, info in rows:
        out += f"{chrom}\t{pos}\t{vid}\t{ref}\t{alt}\t.\tPASS\t{info}\tGT\t0/1\n"
    return out


def run_reference(in_vcf: str, out_vcf: str, seed: int, extra=()):
    """Execute the reference's simvcf.py, seeded, from its own tree."""
    code = (
        "import random, runpy, sys\n"
        f"random.seed({seed})\n"
        f"sys.argv = ['simvcf.py', '-i', {in_vcf!r}, '-o', {out_vcf!r}"
        + "".join(f", {a!r}" for a in extra) + "]\n"
        f"runpy.run_path({REF_SIMVCF!r}, run_name='__main__')\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True,
                   capture_output=True)


def run_ours(in_vcf: str, out_vcf: str, seed: int, extra=()):
    subprocess.run(
        [sys.executable, OUR_SIMVCF, "-i", in_vcf, "-o", out_vcf,
         "--seed", str(seed), *extra],
        check=True, capture_output=True)


@pytest.mark.parametrize("seed", [0, 7, 42])
def test_simvcf_golden_infer_mode(tmp_path, seed):
    src = tmp_path / "truth.vcf"
    src.write_text(truth_vcf_infer())
    ref_out = tmp_path / "ref.vcf"
    our_out = tmp_path / "ours.vcf"
    run_reference(str(src), str(ref_out), seed)
    run_ours(str(src), str(our_out), seed)
    assert our_out.read_text() == ref_out.read_text()


@pytest.mark.parametrize("seed", [1, 13])
def test_simvcf_golden_tag_mode(tmp_path, seed):
    src = tmp_path / "truth.vcf"
    src.write_text(truth_vcf_tagged())
    ref_out = tmp_path / "ref.vcf"
    our_out = tmp_path / "ours.vcf"
    extra = ("--tag", "MYTYPE")
    run_reference(str(src), str(ref_out), seed, extra)
    run_ours(str(src), str(our_out), seed, extra)
    assert our_out.read_text() == ref_out.read_text()


def test_simvcf_golden_chrom_filter(tmp_path):
    src = tmp_path / "truth.vcf"
    src.write_text(truth_vcf_infer())
    ref_out = tmp_path / "ref.vcf"
    our_out = tmp_path / "ours.vcf"
    extra = ("-c", "2")  # keep only chrom 2 records (chr prefix stripped)
    run_reference(str(src), str(ref_out), 3, extra)
    run_ours(str(src), str(our_out), 3, extra)
    assert our_out.read_text() == ref_out.read_text()
