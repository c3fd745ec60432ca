"""Host-side window packer: VCF tasks → fixed-shape device batches.

The reference's unit of work is one VCF record per pthread worker
(audit.c:50); the TPU-native unit is a *batch of refine windows* packed
into static shapes (SURVEY.md §7, design translation 1).  Each accepted
VCF record expands into 1-2 windows:

  INS  → 1 × KIND_INS      interval [pos-median, pos+median]   (audit.c:178)
  DEL  → KIND_DEL_START    interval [pos-wider,  pos+narrow]   (audit.c:191)
         KIND_DEL_END      interval [end-narrow, end+narrow]   (audit.c:192)
  INV  → 2 × KIND_POINT    intervals ±wider around pos/end     (audit.c:224-225)

All interval arithmetic wraps in uint32 exactly like the C struct fields;
degenerate wrapped intervals yield empty BAM queries (mirroring htslib's
behavior on the reference's out-of-range coordinates).

Shapes are bucketed (reads N, ops O) to bound padding waste and compile
count; windows whose reads exceed the largest ops bucket or whose
candidate count exceeds K fall back to the scalar oracle on the host.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Iterable, Sequence

import numpy as np

from .. import constants as C
from ..constants import KIND_DEL_END, KIND_DEL_START, KIND_INS, KIND_POINT, SVType
from ..io.vcf import VcfTask
from ..ops.audit_step import AuditBatch

# Reads with more CIGAR ops than this are handled by the host oracle.
MAX_OPS_BUCKET = 16384
OPS_BUCKETS = (64, 256, 1024, 4096, MAX_OPS_BUCKET)


@dataclass
class WindowSpec:
    """One refine_* invocation."""

    kind: int
    chrom_index: int
    inter_start: int       # uint32, 1-based as the reference passes it
    inter_end: int         # uint32
    imprecise_pos: int
    record_index: int      # which VcfTask this belongs to
    slot: int              # 0 = start/point result, 1 = end result


@dataclass
class PackedBatch:
    """Device batch plus everything needed for fallback and emit."""

    batch: AuditBatch
    windows: list[WindowSpec]
    reads_per_window: list[list[tuple[int, list[tuple[int, int]]]]]
    oracle_windows: list[tuple[WindowSpec, list]] = field(default_factory=list)
    # Multi-device layout: number of mesh shards the batch was packed for
    # (1 = dense single-device layout) and, when > 1, the global result
    # slot of each entry in `windows` (the batch is shard-blockwise padded,
    # so slots are not the identity).
    n_shards: int = 1
    window_slots: list[int] | None = None


def windows_for_task(task: VcfTask, cfg) -> tuple[list[WindowSpec], bool]:
    """Expand a VCF task into refine windows.

    Returns (windows, emit): emit=False when the reference would print
    nothing (the DEL/INV `50 < end-pos` inner check failing on exact
    equality, audit.c:190, 223)."""
    u = C.u32
    t = task
    if t.sv_type == SVType.INS:
        return (
            [
                WindowSpec(
                    KIND_INS, t.chrom_index,
                    u(t.pos - cfg.median_interval), u(t.pos + cfg.median_interval),
                    t.pos, t.line_index, 0,
                )
            ],
            True,
        )
    if t.sv_type == SVType.DEL:
        if not (C.SV_MIN_LENGTH < u(t.end - t.pos)):
            return [], False
        return (
            [
                WindowSpec(
                    KIND_DEL_START, t.chrom_index,
                    u(t.pos - cfg.wider_interval), u(t.pos + cfg.narrow_interval),
                    t.pos, t.line_index, 0,
                ),
                WindowSpec(
                    KIND_DEL_END, t.chrom_index,
                    u(t.end - cfg.narrow_interval), u(t.end + cfg.narrow_interval),
                    t.end, t.line_index, 1,
                ),
            ],
            True,
        )
    if t.sv_type == SVType.INV:
        if not (C.SV_MIN_LENGTH < u(t.end - t.pos)):
            return [], False
        return (
            [
                WindowSpec(
                    KIND_POINT, t.chrom_index,
                    u(t.pos - cfg.wider_interval), u(t.pos + cfg.wider_interval),
                    t.pos, t.line_index, 0,
                ),
                WindowSpec(
                    KIND_POINT, t.chrom_index,
                    u(t.end - cfg.wider_interval), u(t.end + cfg.wider_interval),
                    t.end, t.line_index, 1,
                ),
            ],
            True,
        )
    raise ValueError(f"unexpected sv type {t.sv_type}")


def _bucket(value: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]


def query_region(fetch, w: WindowSpec):
    """BAM region fetch with the reference's coordinate mapping:
    tid = chrom-1, beg = start-1, end = end-1 in uint32 arithmetic
    (refinement.c:114)."""
    tid = w.chrom_index - 1
    beg = C.u32(w.inter_start - 1)
    end = C.u32(w.inter_end - 1)
    if tid < 0:
        return []
    return fetch(tid, beg, end)


def pack_batches(
    windows: Iterable[WindowSpec],
    fetch: Callable[[int, int, int], list],
    cfg,
    n_shards: int = 1,
) -> Iterable[PackedBatch]:
    """Fetch reads for each window and pack fixed-shape batches.

    ``fetch(tid, beg, end)`` returns [(pos, [(op, len), ...]), ...].
    Yields PackedBatch objects sized (B=cfg.batch_windows) windows.
    With ``n_shards > 1`` batches are laid out shard-blockwise for
    `parallel.mesh.sharded_audit_step` (read-balanced bins, shard-local
    window ids).
    """
    pending: list[tuple[WindowSpec, list]] = []

    def flush():
        nonlocal pending
        if not pending:
            return None
        if n_shards > 1:
            pb = _pack_one_sharded(pending, cfg, n_shards)
        else:
            pb = _pack_one(pending, cfg)
        pending = []
        return pb

    for w in windows:
        if w.kind == KIND_POINT:
            reads: list = []  # refine_point collects nothing; skip I/O
        else:
            reads = query_region(fetch, w)
        pending.append((w, reads))
        if len(pending) >= cfg.batch_windows:
            yield flush()
    pb = flush()
    if pb is not None:
        yield pb


def _pack_one(items: list[tuple[WindowSpec, list]], cfg) -> PackedBatch:
    device_items = []
    oracle_items = []
    for w, reads in items:
        if any(len(cig) > MAX_OPS_BUCKET for _, cig in reads):
            oracle_items.append((w, reads))
        else:
            device_items.append((w, reads))

    B = len(device_items)
    max_ops = 1
    n_reads = 0
    for _, reads in device_items:
        n_reads += len(reads)
        for _, cig in reads:
            max_ops = max(max_ops, len(cig))
    O = _bucket(max_ops, OPS_BUCKETS)
    N = max(n_reads, 1)

    ops = np.full((N, O), 9, np.int8)
    lens = np.zeros((N, O), np.int32)
    pos = np.zeros(N, np.int32)
    n_ops = np.zeros(N, np.int32)
    wid = np.full(N, B, np.int32)
    kind = np.zeros(max(B, 1), np.int32)
    istart = np.zeros(max(B, 1), np.int32)
    iend = np.zeros(max(B, 1), np.int32)
    ipos = np.zeros(max(B, 1), np.int32)

    r = 0
    reads_per_window = []
    for b, (w, reads) in enumerate(device_items):
        kind[b] = w.kind
        # Windows that still have reads always have sane (< 2^31) interval
        # coordinates — wrapped intervals produce empty queries — so the
        # int32 casts below are lossless where they matter.
        istart[b] = np.int64(w.inter_start).astype(np.int32)
        iend[b] = np.int64(w.inter_end).astype(np.int32)
        ipos[b] = np.int64(w.imprecise_pos).astype(np.int32)
        for rp, cig in reads:
            k = len(cig)
            if k:
                arr = np.asarray(cig, np.int64)
                ops[r, :k] = arr[:, 0].astype(np.int8)
                lens[r, :k] = arr[:, 1].astype(np.int32)
            pos[r] = rp
            n_ops[r] = k
            wid[r] = b
            r += 1
        reads_per_window.append(reads)

    batch = AuditBatch(
        ops=ops, lens=lens, pos=pos, n_ops=n_ops, window_id=wid,
        kind=kind, inter_start=istart, inter_end=iend, imprecise_pos=ipos,
    )
    return PackedBatch(
        batch=batch,
        windows=[w for w, _ in device_items],
        reads_per_window=reads_per_window,
        oracle_windows=oracle_items,
    )


def _pack_one_sharded(
    items: list[tuple[WindowSpec, list]], cfg, n_shards: int
) -> PackedBatch:
    """Shard-blockwise packing for the multi-device audit step.

    The reference balances work by handing whole VCF records to whichever
    pthread pops the queue next (audit.c:57); here the packer *plans* the
    balance up front: windows are greedily binned by descending read count
    so every mesh shard gets near-equal evidence to chew on (SURVEY.md §7
    design translation 5 — sharding at record granularity keeps the step
    collective-free).  Layout contract of `sharded_audit_step`: both axes
    divisible by n_shards, window_id shard-local, padding reads use the
    local sentinel B_local.
    """
    device_items = []
    oracle_items = []
    for w, reads in items:
        if any(len(cig) > MAX_OPS_BUCKET for _, cig in reads):
            oracle_items.append((w, reads))
        else:
            device_items.append((w, reads))

    bins: list[list[int]] = [[] for _ in range(n_shards)]
    bin_reads = [0] * n_shards
    order = sorted(
        range(len(device_items)), key=lambda i: -len(device_items[i][1])
    )
    for i in order:
        s = min(range(n_shards), key=lambda j: (bin_reads[j], len(bins[j])))
        bins[s].append(i)
        bin_reads[s] += len(device_items[i][1])

    b_loc = max(1, max((len(b) for b in bins), default=1))
    n_loc = max(1, max(bin_reads, default=1))
    B = n_shards * b_loc
    N = n_shards * n_loc

    max_ops = 1
    for _, reads in device_items:
        for _, cig in reads:
            max_ops = max(max_ops, len(cig))
    O = _bucket(max_ops, OPS_BUCKETS)

    ops = np.full((N, O), 9, np.int8)
    lens = np.zeros((N, O), np.int32)
    pos = np.zeros(N, np.int32)
    n_ops = np.zeros(N, np.int32)
    wid = np.full(N, b_loc, np.int32)       # shard-local padding sentinel
    kind = np.full(B, KIND_POINT, np.int32)  # padding windows collect nothing
    istart = np.zeros(B, np.int32)
    iend = np.zeros(B, np.int32)
    ipos = np.zeros(B, np.int32)

    windows_out: list[WindowSpec] = []
    window_slots: list[int] = []
    reads_per_window = []
    for s, bin_idx in enumerate(bins):
        r = s * n_loc
        for k, i in enumerate(bin_idx):
            w, reads = device_items[i]
            g = s * b_loc + k
            kind[g] = w.kind
            istart[g] = np.int64(w.inter_start).astype(np.int32)
            iend[g] = np.int64(w.inter_end).astype(np.int32)
            ipos[g] = np.int64(w.imprecise_pos).astype(np.int32)
            for rp, cig in reads:
                nk = len(cig)
                if nk:
                    arr = np.asarray(cig, np.int64)
                    ops[r, :nk] = arr[:, 0].astype(np.int8)
                    lens[r, :nk] = arr[:, 1].astype(np.int32)
                pos[r] = rp
                n_ops[r] = nk
                wid[r] = k
                r += 1
            windows_out.append(w)
            window_slots.append(g)
            reads_per_window.append(reads)

    batch = AuditBatch(
        ops=ops, lens=lens, pos=pos, n_ops=n_ops, window_id=wid,
        kind=kind, inter_start=istart, inter_end=iend, imprecise_pos=ipos,
    )
    return PackedBatch(
        batch=batch,
        windows=windows_out,
        reads_per_window=reads_per_window,
        oracle_windows=oracle_items,
        n_shards=n_shards,
        window_slots=window_slots,
    )
