"""Synthetic GFA/GAF/FASTQ fixture generation for disc-mode tests.

Builds a linear rank-0 backbone (P-line path) with optional rank-1 alt
segments (L-linked), and reads whose GAF alignments traverse the graph
with planted insertions/deletions.
"""
from __future__ import annotations

import random


def make_backbone_gfa(path: str, seg_lens: list[int], alt: dict | None = None,
                      seed: int = 0):
    """Write a GFA: segments 1..n form the backbone path; `alt` may map
    an (i, j) backbone gap to an alt segment id bridging them.
    Returns {seg_id: sequence}."""
    rng = random.Random(seed)
    seqs = {}
    lines = []
    n = len(seg_lens)
    for i, ln in enumerate(seg_lens, start=1):
        seq = "".join(rng.choice("ACGT") for _ in range(ln))
        seqs[i] = seq
        lines.append(f"S\t{i}\t{seq}")
    path_ids = ",".join(f"{i}+" for i in range(1, n + 1))
    lines.append(f"P\tref\t{path_ids}\t*")
    for i in range(1, n):
        lines.append(f"L\t{i}\t+\t{i + 1}\t+\t0M")
    if alt:
        for (i, j), (aid, ln) in alt.items():
            seq = "".join(rng.choice("ACGT") for _ in range(ln))
            seqs[aid] = seq
            lines.append(f"S\t{aid}\t{seq}")
            lines.append(f"L\t{i}\t+\t{aid}\t+\t0M")
            lines.append(f"L\t{aid}\t+\t{j}\t+\t0M")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return seqs


def gaf_line(name, read_len, read_start, read_end, path, path_len,
             path_start, path_end, cigar, qual=60):
    matches = read_end - read_start
    return (
        f"{name}\t{read_len}\t{read_start}\t{read_end}\t+\t{path}\t"
        f"{path_len}\t{path_start}\t{path_end}\t{matches}\t"
        f"{read_end - read_start}\t{qual}\tcg:Z:{cigar}"
    )


def write_fastq(path: str, reads: dict[str, str]):
    with open(path, "w") as fh:
        for name, seq in reads.items():
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
