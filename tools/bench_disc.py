#!/usr/bin/env python
"""disc-mode benchmark fixture + runner (VERDICT r2 item 4).

Builds a large synthetic pangenome fixture — GFA backbone, >=100k GAF
read alignments, FASTQ — with planted clustered INS/DEL/clip signals
(the workload shape of the reference's per-read projection loop,
discover.c:46-246), and measures end-to-end `disc` reads/s.

The baseline for vs_baseline is the same pipeline with the detection
scan forced to the host scalar path (io.gaf.scan_breakpoints) on a 10%
read slice, extrapolated — the honest single-machine comparison, since
the reference's own disc detection is an empty stub with no number to
cite (discover.c:209-222; SURVEY.md §2.8).
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEG_LEN = 16_384
N_SEG = 64                # 1 MiB backbone
READ_LEN = 1_000
N_INS_SITES = 64
N_DEL_SITES = 64
N_TEMPLATES = 256         # distinct noisy-CIGAR shapes (reused across reads)
BASES = np.frombuffer(b"ACGT", np.uint8)


def _rand_seq(rng, n: int) -> str:
    return rng.choice(BASES, n).tobytes().decode()


def _noisy_runs(rng, ref_span: int):
    """Realistic long-read alignment runs: ~25 bp match stretches
    interleaved with 1-3 bp X/I/D noise (ONT/HiFi-style ~5% error ⇒
    ~80 runs per kb — the shape real minimap2/GraphAligner cg:Z tags
    have, and what the reference's per-base projection loop is bounded
    by, MAX_CIGAR = 131072, params.h:40)."""
    runs = []
    ref = 0
    while ref < ref_span:
        m = min(int(rng.integers(12, 40)), ref_span - ref)
        runs.append(("=", m))
        ref += m
        if ref >= ref_span:
            break
        r = rng.random()
        ln = int(rng.integers(1, 4))
        if r < 0.35:
            ln = min(ln, ref_span - ref)
            runs.append(("X", ln))
            ref += ln
        elif r < 0.6:
            runs.append(("I", ln))
        elif r < 0.8:
            ln = min(ln, ref_span - ref)
            runs.append(("D", ln))
            ref += ln
    return runs


def _runs_str(runs) -> str:
    return "".join(f"{l}{op}" for op, l in runs)


def _qlen(runs) -> int:
    return sum(l for op, l in runs if op in "=XIS")


def _rspan(runs) -> int:
    return sum(l for op, l in runs if op in "=XD")


def _read_seq(rng, runs, ref: str, pathoff: int, big_ins: str | None):
    """Build the read sequence consistent with `runs` against `ref`
    (X keeps ref bases — only the big-I substring matters downstream)."""
    out = []
    p = pathoff
    for op, l in runs:
        if op in "=X":
            out.append(ref[p:p + l])
            p += l
        elif op == "D":
            p += l
        elif op == "I":
            out.append(big_ins if (big_ins and l == len(big_ins))
                       else _rand_seq(rng, l))
    return "".join(out)


def build_fixture(tmpdir: str, n_reads: int, seed: int = 0):
    """Write bench.gfa / bench.gaf / bench.fq; returns their paths."""
    rng = np.random.default_rng(seed)
    gfa = os.path.join(tmpdir, "bench.gfa")
    gaf = os.path.join(tmpdir, "bench.gaf")
    fq = os.path.join(tmpdir, "bench.fq")

    seqs = {}
    with open(gfa, "w") as fh:
        for i in range(1, N_SEG + 1):
            seqs[i] = _rand_seq(rng, SEG_LEN)
            fh.write(f"S\t{i}\t{seqs[i]}\n")
        fh.write("P\tref\t" + ",".join(f"{i}+" for i in range(1, N_SEG + 1))
                 + "\t*\n")
        for i in range(1, N_SEG):
            fh.write(f"L\t{i}\t+\t{i + 1}\t+\t0M\n")

    # Noisy-CIGAR template pool: realistic run counts (~80/kb) at
    # fixture-build cost O(N_TEMPLATES), not O(n_reads).
    templates = [_noisy_runs(rng, READ_LEN) for _ in range(N_TEMPLATES)]
    tmpl_str = [_runs_str(t) for t in templates]
    tmpl_qlen = [_qlen(t) for t in templates]
    tmpl_ref = [_rspan(t) for t in templates]

    # Planted sites (backbone offsets within one segment each, away from
    # edges so a READ_LEN window fits) with clustered support.
    ins_sites = rng.integers(2_000, SEG_LEN - 2_000 - READ_LEN,
                             N_INS_SITES) + \
        rng.integers(0, N_SEG, N_INS_SITES) * SEG_LEN
    ins_len = rng.integers(55, 120, N_INS_SITES)
    ins_seq = [_rand_seq(rng, int(l)) for l in ins_len]
    del_len = rng.integers(60, 200, N_DEL_SITES)

    # Read plan: 1% INS-supporting, 1% DEL-supporting, 1% clipped,
    # rest plain noisy alignments (the realistic long-tail mix).
    kind = rng.random(n_reads)
    site_of = rng.integers(0, N_INS_SITES, n_reads)
    offs = rng.integers(0, N_SEG * SEG_LEN - 2 * READ_LEN - 1, n_reads)
    lead = rng.integers(200, READ_LEN - 300, n_reads)
    tmpl_of = rng.integers(0, N_TEMPLATES, n_reads)

    def splice_big(t: int, op: str, ln: int, lead_ref: int):
        """Template runs with one big op inserted at the run boundary
        closest to `lead_ref` reference bases in."""
        runs, ref = [], 0
        placed = False
        for o, l in templates[t]:
            if not placed and ref >= lead_ref:
                runs.append((op, ln))
                placed = True
            runs.append((o, l))
            if o in "=XD":
                ref += l
        if not placed:
            runs.append((op, ln))
        return runs

    with open(gaf, "w") as g, open(fq, "w") as f:
        for r in range(n_reads):
            name = f"rd{r}"
            t = int(tmpl_of[r])
            start = int(offs[r])
            pathoff = start % (SEG_LEN - READ_LEN - 300)
            seg0 = start // SEG_LEN + 1
            ref = seqs[seg0]
            if kind[r] < 0.01:                       # INS support
                s = int(site_of[r])
                pathoff = int(ins_sites[s]) % SEG_LEN - int(lead[r])
                seg0 = int(ins_sites[s]) // SEG_LEN + 1
                ref = seqs[seg0]
                runs = splice_big(t, "I", int(ins_len[s]), int(lead[r]))
                qlen, span = _qlen(runs), _rspan(runs)
                g.write(f"{name}\t{qlen}\t0\t{qlen}\t+\t>{seg0}\t{SEG_LEN}"
                        f"\t{pathoff}\t{pathoff + span}\t{qlen}\t{qlen}"
                        f"\t60\tcg:Z:{_runs_str(runs)}\n")
                seq = _read_seq(rng, runs, ref, pathoff, ins_seq[s])
                f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
            elif kind[r] < 0.02:                     # DEL support
                s = int(site_of[r]) % N_DEL_SITES
                runs = splice_big(t, "D", int(del_len[s]), int(lead[r]))
                qlen, span = _qlen(runs), _rspan(runs)
                g.write(f"{name}\t{qlen}\t0\t{qlen}\t+\t>{seg0}\t{SEG_LEN}"
                        f"\t{pathoff}\t{pathoff + span}\t{qlen}\t{qlen}"
                        f"\t60\tcg:Z:{_runs_str(runs)}\n")
                f.write(f"@{name}\n{_rand_seq(rng, qlen)}\n+\n"
                        f"{'I' * qlen}\n")
            elif kind[r] < 0.03:                     # clipped read
                cl = 60 + int(lead[r]) % 200
                qlen, span = tmpl_qlen[t], tmpl_ref[t]
                g.write(f"{name}\t{qlen + cl}\t{cl}\t{qlen + cl}\t+\t"
                        f">{seg0}\t{SEG_LEN}\t{pathoff}\t{pathoff + span}"
                        f"\t{qlen}\t{qlen}\t60\tcg:Z:{tmpl_str[t]}\n")
                f.write(f"@{name}\n{_rand_seq(rng, qlen + cl)}\n+\n"
                        f"{'I' * (qlen + cl)}\n")
            else:                                    # plain noisy read
                qlen, span = tmpl_qlen[t], tmpl_ref[t]
                g.write(f"{name}\t{qlen}\t0\t{qlen}\t+\t>{seg0}\t{SEG_LEN}"
                        f"\t{pathoff}\t{pathoff + span}\t{qlen}\t{qlen}"
                        f"\t60\tcg:Z:{tmpl_str[t]}\n")
                f.write(f"@{name}\n{ref[pathoff:pathoff + qlen]}\n+\n"
                        f"{'I' * qlen}\n")
    return gfa, gaf, fq


def main():
    import argparse
    import io
    import time

    from svtrek_tpu.config import DiscConfig
    from svtrek_tpu.pipeline.discover import run_discover

    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=100_000)
    args = ap.parse_args()
    tmpdir = "/tmp/svtrek_bench_disc"
    os.makedirs(tmpdir, exist_ok=True)
    marker = os.path.join(tmpdir, f"done_{args.reads}")
    if not os.path.exists(marker):
        build_fixture(tmpdir, args.reads)
        open(marker, "w").close()
    gfa = os.path.join(tmpdir, "bench.gfa")
    gaf = os.path.join(tmpdir, "bench.gaf")
    fq = os.path.join(tmpdir, "bench.fq")

    cfg = DiscConfig(gfa_file=gfa, gaf_file=gaf, fq_file=fq)
    run_discover(cfg, out=io.StringIO(), err=io.StringIO())  # warm
    t0 = time.perf_counter()
    lines = run_discover(cfg, out=io.StringIO(), err=io.StringIO())
    dt = time.perf_counter() - t0
    print(f"{args.reads / dt:.1f} reads/s, {dt:.2f}s, "
          f"{len(lines)} clusters")


if __name__ == "__main__":
    main()
