"""`audt` mode driver: VCF + BAM → refined breakpoint records.

TPU-native re-design of the reference's process_vcf/thread_func pipeline
(audit.c:50-357): instead of a pthread pool pulling VCF lines from a
bounded queue, the host parses + packs fixed-shape window batches and one
jitted XLA program per bucket refines a whole batch at once; results are
emitted deterministically in input order (removing the reference's
unsynchronized-stdout interleaving class of bug; SURVEY.md §5 'race
detection').
"""
from __future__ import annotations

import sys
from dataclasses import dataclass

import numpy as np

from .. import constants as C
from ..config import AudtConfig
from ..constants import SVType
from ..emit import format_result
from ..io.vcf import VcfSkip, VcfTask, iter_vcf_tasks
from ..oracle import refine_task
from ..ops.audit_step import audit_refine_step
from .pack import PackedBatch, pack_batches, windows_for_task

NA32 = 0xFFFFFFFF


@dataclass
class AuditResult:
    task: VcfTask
    rstart: int = NA32
    rend: int = NA32
    emit: bool = True

    def line(self) -> str:
        return format_result(
            self.task.sv_type, self.task.chrom_index, self.task.pos,
            self.task.end, self.rstart, self.rend,
        )


def _next_pow2(n: int, lo: int = 16) -> int:
    v = lo
    while v < n:
        v *= 2
    return v


def run_refinement(packed: PackedBatch, cfg: AudtConfig) -> list:
    """Run one packed batch on device (+ oracle fallback). Returns
    (window, refined) pairs."""
    out = []
    b = packed.batch
    B = b.num_windows
    if B > 0:
        K = _next_pow2(min(cfg.max_candidates, 8192), 64)
        refined, counts, overflow = audit_refine_step(
            b.ops, b.lens, b.pos, b.n_ops, b.window_id,
            b.kind, b.inter_start, b.inter_end, b.imprecise_pos,
            num_windows=B, K=K,
            min_count=cfg.consensus_min_count,
            interval=cfg.consensus_interval,
            range_=cfg.consensus_interval_range,
        )
        refined = np.asarray(refined)
        counts = np.asarray(counts)
        overflow = np.asarray(overflow)
        for i, w in enumerate(packed.windows):
            if overflow[i]:
                # Capacity/sweep overflow: exact host fallback.
                r = refine_task(
                    w.kind, packed.reads_per_window[i],
                    w.inter_start, w.inter_end, w.imprecise_pos,
                    cfg.consensus_min_count, cfg.consensus_interval,
                    cfg.consensus_interval_range,
                )
            else:
                r = int(refined[i])
            out.append((w, r))
    for w, reads in packed.oracle_windows:
        r = refine_task(
            w.kind, reads, w.inter_start, w.inter_end, w.imprecise_pos,
            cfg.consensus_min_count, cfg.consensus_interval,
            cfg.consensus_interval_range,
        )
        out.append((w, r))
    return out


def run_audit(cfg: AudtConfig, out=None, err=None) -> list[str]:
    """Full audt pipeline. Returns the result lines (also written to
    ``out``/output_file)."""
    out = out or sys.stdout
    err = err or sys.stderr

    from ..io.bam import BamReader
    from ..native import native_bam_reader

    reader = None
    if cfg.use_native_io:
        reader = native_bam_reader(cfg.bam_file)
    if reader is None:
        reader = BamReader(cfg.bam_file)

    def fetch(tid, beg, end):
        return [
            (rec.pos, rec.cigar) for rec in reader.fetch(tid, int(beg), int(end))
        ]

    print("[INFO] Started processing variation file.", file=out)

    tasks: list[VcfTask] = []
    results: dict[int, AuditResult] = {}
    with open(cfg.vcf_file, "r") as fh:
        for item in iter_vcf_tasks(fh):
            if isinstance(item, VcfSkip):
                if item.message:
                    print(item.message, file=err)
                continue
            tasks.append(item)

    all_windows = []
    for t in tasks:
        wins, emit = windows_for_task(t, cfg)
        results[t.line_index] = AuditResult(t, emit=emit)
        all_windows.extend(wins)

    for packed in pack_batches(all_windows, fetch, cfg):
        for w, refined in run_refinement(packed, cfg):
            res = results[w.record_index]
            if w.slot == 0:
                res.rstart = C.u32(refined)
            else:
                res.rend = C.u32(refined)

    lines = []
    for t in tasks:
        res = results[t.line_index]
        if not res.emit:
            continue
        line = res.line()
        lines.append(line)
        print(line, file=out)

    print("[INFO] Ended processing variation file", file=out)

    if cfg.refined_vcf:
        from ..io.vcf_writer import write_refined_vcf

        write_refined_vcf(
            cfg.refined_vcf, cfg.vcf_file,
            {
                t.line_index: (t, results[t.line_index].rstart,
                               results[t.line_index].rend)
                for t in tasks
                if results[t.line_index].emit
            },
        )

    if cfg.output_file and out is sys.stdout:
        with open(cfg.output_file, "w") as fh:
            fh.write("\n".join(lines) + ("\n" if lines else ""))
    return lines
