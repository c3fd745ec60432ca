"""FASTQ reading (plain or gzip), replacing the reference's kseq usage
(parse_fq, discover.c:381-407)."""
from __future__ import annotations

import gzip
from typing import Iterator

_COMP = str.maketrans("ACGTacgtNn", "TGCAtgcaNn")


def reverse_complement(seq: str) -> str:
    return seq.translate(_COMP)[::-1]


def iter_fastq(path: str) -> Iterator[tuple[str, str]]:
    """Yield (name, sequence). Name is the first whitespace token."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as fh:
        while True:
            hdr = fh.readline()
            if not hdr:
                return
            seq = fh.readline().rstrip("\n")
            fh.readline()            # '+'
            fh.readline()            # quals
            name = hdr[1:].split()[0] if len(hdr) > 1 else ""
            yield name, seq
