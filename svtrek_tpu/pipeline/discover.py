"""`disc` mode driver: GFA + GAF + FASTQ → discovered SVs.

The completed form of the reference's WIP discover() path
(discover.c:409-443; SURVEY.md §3.3): project every read's graph
alignment onto the rank-0 backbone, scan for >=50 bp INS/DEL/clip signals
(batched device kernel), cluster signals across reads, and for insertion
clusters extract the inserted read substrings and build a consensus
sequence (the abPOA-shaped step the reference never implemented —
SURVEY.md §2.14).

Defined output (the reference defines none):
  (DISC DEL) ref pos: P, len: L, support: N
  (DISC INS) ref pos: P, len: L, support: N, seq: <consensus or NA>
  (DISC CLIP) ref pos: P, len: L, support: N
positions are 0-based backbone coordinates; one line per cluster with
support >= consensus_min_count, sorted by (type, position).
"""
from __future__ import annotations

import sys
from dataclasses import dataclass, field

import numpy as np

from ..config import DiscConfig
from ..io.fastq import iter_fastq, reverse_complement
from ..io.gaf import Breakpoint, iter_gaf
from ..io.gfa import parse_gfa
from ..ops.discover import BP_CLIP, BP_DEL, BP_INS, scan_projected_runs

_TYPE_NAME = {BP_INS: "INS", BP_DEL: "DEL", BP_CLIP: "CLIP"}
_RUN_BUCKETS = (32, 128, 512, 2048, 8192)


@dataclass
class SvCluster:
    type: str
    ref_pos: int
    length: int
    support: int
    members: list[Breakpoint] = field(default_factory=list)
    seq: str | None = None

    def line(self) -> str:
        base = (
            f"(DISC {self.type}) ref pos: {self.ref_pos}, "
            f"len: {self.length}, support: {self.support}"
        )
        if self.type == "INS":
            base += f", seq: {self.seq if self.seq else 'NA'}"
        return base


def _bucket(n: int) -> int:
    for b in _RUN_BUCKETS:
        if n <= b:
            return b
    return _RUN_BUCKETS[-1]


def detect_breakpoints(projected, min_len: int, batch_reads: int = 512):
    """Batched device scan over projected reads → Breakpoint list.

    Reads whose run count exceeds the largest bucket fall back to the
    host scalar scan (identical semantics)."""
    from ..io.gaf import scan_breakpoints

    out: list[Breakpoint] = []
    batch: list = []

    def flush():
        nonlocal batch
        if not batch:
            return
        O = _bucket(max(len(p.runs) for p in batch))
        N = len(batch)
        ops = np.full((N, O), 9, np.int8)
        lens = np.zeros((N, O), np.int32)
        n_runs = np.zeros(N, np.int32)
        ref_start = np.zeros(N, np.int32)
        for i, p in enumerate(batch):
            k = len(p.runs)
            if k:
                arr = np.asarray(p.runs, np.int64)
                ops[i, :k] = arr[:, 0].astype(np.int8)
                lens[i, :k] = arr[:, 1].astype(np.int32)
            n_runs[i] = k
            ref_start[i] = p.reference_start
        bp_type, ref_pos, read_pos = scan_projected_runs(
            ops, lens, n_runs, ref_start, min_len=min_len
        )
        bp_type = np.asarray(bp_type)
        ref_pos = np.asarray(ref_pos)
        read_pos = np.asarray(read_pos)
        rows, cols = np.nonzero(bp_type)
        for r, c in zip(rows.tolist(), cols.tolist()):
            p = batch[r]
            out.append(Breakpoint(
                p.read_name, _TYPE_NAME[int(bp_type[r, c])],
                int(ref_pos[r, c]), int(read_pos[r, c]),
                int(lens[r, c]), p.rc,
            ))
        batch = []

    for p in projected:
        if len(p.runs) > _RUN_BUCKETS[-1]:
            out.extend(scan_breakpoints(p, min_len))
            continue
        batch.append(p)
        if len(batch) >= batch_reads:
            flush()
    flush()
    return out


def cluster_breakpoints(
    bps: list[Breakpoint],
    min_count: int,
    cluster_window: int = 100,
) -> list[SvCluster]:
    """Greedy position clustering per type: sorted signals within
    ``cluster_window`` of the cluster's running mean merge; clusters with
    support >= min_count survive.  Position/length are rounded means
    (the (total + n/2)/n convention of refinement.c:65)."""
    clusters: list[SvCluster] = []
    for t in ("INS", "DEL", "CLIP"):
        sel = sorted(
            (b for b in bps if b.type == t), key=lambda b: (b.ref_pos, b.length)
        )
        cur: list[Breakpoint] = []

        def close():
            if len(cur) >= min_count:
                n = len(cur)
                pos = (sum(b.ref_pos for b in cur) + n // 2) // n
                ln = (sum(b.length for b in cur) + n // 2) // n
                clusters.append(SvCluster(t, pos, ln, n, list(cur)))

        for b in sel:
            if cur and b.ref_pos - cur[-1].ref_pos > cluster_window:
                close()
                cur = []
            cur.append(b)
        if cur:
            close()
    clusters.sort(key=lambda c: (c.type, c.ref_pos))
    return clusters


def consensus_insert_sequences(
    clusters: list[SvCluster], fq_path: str
) -> None:
    """Attach a consensus inserted sequence to each INS cluster.

    Fills the reference's TODO at discover.c:401 (abPOA was built but
    never wired, SURVEY.md §2.14): extract each supporting read's
    inserted substring (reverse-complement-normalized) and run the POA
    consensus kernel over them.
    """
    wanted: dict[str, list[tuple[SvCluster, Breakpoint]]] = {}
    for c in clusters:
        if c.type != "INS":
            continue
        for b in c.members:
            wanted.setdefault(b.read_name, []).append((c, b))
    if not wanted:
        return

    per_cluster: dict[int, list[str]] = {}
    for name, seq in iter_fastq(fq_path):
        hits = wanted.get(name)
        if not hits:
            continue
        for c, b in hits:
            s = reverse_complement(seq) if b.rc else seq
            sub = s[b.read_pos : b.read_pos + b.length]
            if sub:
                per_cluster.setdefault(id(c), []).append(sub)

    from ..ops.poa_batch import consensus_sequence_batch

    ins = [c for c in clusters if c.type == "INS"]
    seq_lists = [per_cluster.get(id(c), []) for c in ins]
    for c, s in zip(ins, consensus_sequence_batch(seq_lists)):
        if s:
            c.seq = s


def run_discover(cfg: DiscConfig, out=None, err=None) -> list[str]:
    out = out or sys.stdout
    err = err or sys.stderr

    print("[INFO] Started graph discovery.", file=out)
    gfa = parse_gfa(cfg.gfa_file)
    errors: list[str] = []
    projected = iter_gaf(cfg.gaf_file, gfa, errors)
    bps = detect_breakpoints(projected, cfg.sv_min_length, cfg.batch_reads)
    for name in errors:
        print(f"[ERROR] Read {name} has an invalid path.", file=err)

    clusters = cluster_breakpoints(bps, cfg.consensus_min_count)
    consensus_insert_sequences(clusters, cfg.fq_file)

    lines = [c.line() for c in clusters]
    for line in lines:
        print(line, file=out)
    print("[INFO] Ended graph discovery.", file=out)

    if cfg.output_file and out is sys.stdout:
        with open(cfg.output_file, "w") as fh:
            fh.write("\n".join(lines) + ("\n" if lines else ""))
    return lines
