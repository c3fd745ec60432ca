#!/usr/bin/env python
"""simvcf — turn a truth VCF into an "imprecise" SV VCF for auditing.

Fresh reimplementation of the reference's test-data generator
(utils/simvcf.py, SURVEY.md §2.12) with identical transformation
semantics:

- keeps only DEL/INS/INV records at least --length (default 50) long,
  passing everything else through unchanged;
- truncates REF/ALT to their first base;
- appends CIPOS (and CIEND for non-INS) jitter of ±(rand·6% + 1%)·svlen
  ± 25, then END=, then the SVELDT=SIMULATED tag (the header INFO line is
  inserted too);
- rewrites/append SVTYPE=, and assigns GoldStandard<N> IDs to '.' IDs.

Faithful quirk: fields are taken from a raw tab-split of the line
(newline included in the last field), exactly like the original — feed
VCFs with FORMAT/sample columns if the INFO column must stay well-formed.

Extension over the reference: --seed for reproducible jitter.
"""
from __future__ import annotations

import argparse
import random
import sys

SV_MIN_LENGTH = 50

SVELDT_HEADER = (
    '##INFO=<ID=SVELDT,Number=1,Type=String,Description="The SV is tagged '
    "by SVELDT program:SIMULATED=The SV is only simulated var varsim.py and "
    "not processed by sveldt yet, SUCCESS=SVELDT was able to refine all "
    "given intervals, PARTIAL=SVELDT was able to refine only one of the "
    'points, INCORRECT=SVELDT detected invalid SV."\n'
)


def jitter(rng: random.Random, sv_len: int) -> int:
    return abs(int(rng.random() * sv_len * 0.06 + sv_len * 0.01)) + 25


def simulate(in_fh, out_fh, chrom: str = "", min_len: int = SV_MIN_LENGTH,
             tag: str | None = None, tag_del: str = "DEL",
             tag_ins: str = "INS", tag_inv: str = "INV",
             rng: random.Random | None = None):
    rng = rng or random.Random()
    id_index = 1
    intro = True
    description = False

    for line in in_fh:
        if intro:
            if line.startswith("##INFO") and not description:
                out_fh.write(SVELDT_HEADER)
                description = True
            if line.startswith("#CHROM"):
                if not description:
                    out_fh.write(SVELDT_HEADER)
                    description = True
                intro = False
            out_fh.write(line)
            continue

        fields = line.split("\t")
        if fields[0].startswith("chr"):
            fields[0] = fields[0][3:]
        if chrom and fields[0] != chrom:
            continue

        sv_type = ""
        sv_info_tag = "Invalid"
        if tag is not None:
            info = fields[7]
            if f"{tag}={tag_del}" in info:
                sv_info_tag, sv_type = f"{tag}={tag_del}", "DEL"
            elif f"{tag}={tag_ins}" in info:
                sv_info_tag, sv_type = f"{tag}={tag_ins}", "INS"
            elif f"{tag}={tag_inv}" in info:
                sv_info_tag, sv_type = f"{tag}={tag_inv}", "INV"
            else:
                out_fh.write(line)
                continue
        else:
            if len(fields[3]) > len(fields[4]):
                sv_type = "DEL"
            elif len(fields[3]) < len(fields[4]):
                sv_type = "INS"
            else:
                out_fh.write(line)
                continue

        end = str(int(fields[1]) + 1)
        if sv_type == "DEL":
            end = str(int(fields[1]) + len(fields[3]) - len(fields[4]) + 1)

        sv_len = -1
        if sv_type in ("DEL", "INS"):
            sv_len = len(fields[4]) - len(fields[3])
        if -min_len < sv_len < min_len:
            out_fh.write(line)
            continue

        outer_start = -jitter(rng, sv_len)
        inner_start = jitter(rng, sv_len)

        fields[3] = fields[3][0]
        fields[4] = fields[4][0]
        fields[7] += f";CIPOS={outer_start},{inner_start}"
        if sv_type != "INS":
            inner_end = -jitter(rng, sv_len)
            outer_end = jitter(rng, sv_len)
            fields[7] += f";CIEND={inner_end},{outer_end}"
        fields[7] += f";END={end}"
        fields[7] += ";SVELDT=SIMULATED"

        if sv_info_tag in fields[7]:
            fields[7] = fields[7].replace(sv_info_tag, f"SVTYPE={sv_type}")
        else:
            fields[7] += f";SVTYPE={sv_type}"

        if fields[2] == ".":
            fields[2] = f"GoldStandard{id_index}"
            id_index += 1

        out_fh.write("\t".join(fields))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("-i", "--input", type=str)
    p.add_argument("-c", "--chr", type=str, default="")
    p.add_argument("-l", "--length", type=int, default=SV_MIN_LENGTH)
    p.add_argument("-o", "--output", type=str)
    p.add_argument("--tag", type=str)
    p.add_argument("--DEL", type=str)
    p.add_argument("--INS", type=str)
    p.add_argument("--INV", type=str)
    p.add_argument("--seed", type=int, default=None)
    args = p.parse_args(argv)

    if args.input is None:
        print("Please enter vcf file name.")
        return -1
    if len(args.input) < 4 or not args.input.endswith(".vcf"):
        print("Please enter valid vcf file.")
        return -1
    out = args.output or (args.input[:-4] + ".sim.vcf")

    tag = None if args.tag in (None, "None") else args.tag
    tag_del = args.DEL or "DEL"
    tag_ins = args.INS or "INS"
    tag_inv = args.INV or "INV"

    rng = random.Random(args.seed)
    with open(args.input) as fin, open(out, "w") as fout:
        simulate(fin, fout, args.chr, args.length, tag,
                 tag_del, tag_ins, tag_inv, rng)
    print("Simualtion of vcf is successful.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
