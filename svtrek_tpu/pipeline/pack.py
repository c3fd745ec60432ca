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

Packing is fully vectorized: the native BAM reader hands over columnar
``PackedReads`` arrays (pos/n_ops/offsets + flat op/len streams) and the
packer scatters them into the [N, O] device matrices with a single fancy
-indexed assignment — no per-op Python objects anywhere on the hot host
path.  A fetch that returns plain ``[(pos, [(op, len), ...]), ...]``
lists (the pure-Python reader, tests) is normalized to the same form.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Iterable, Sequence

import numpy as np

from .. import constants as C
from ..constants import (
    KIND_DEL_END, KIND_DEL_START, KIND_INS, KIND_INV_END, KIND_POINT, SVType,
)
from ..io.vcf import VcfTask
from ..ops.audit_step import AuditBatch, AuditBatchCSR

# Reads with more CIGAR ops than this are handled by the host oracle.
MAX_OPS_BUCKET = 16384
OPS_BUCKETS = (64, 256, 1024, 2048, 4096, 8192, MAX_OPS_BUCKET)

PAD_OP = 9  # CIGAR op code that consumes nothing (padding sentinel)


class PackedReads:
    """Columnar reads for one window: the native reader's layout.

    pos   [R] int64 — 0-based alignment start per read
    n_ops [R] int32 — CIGAR op count per read
    opoff [R] int64 — start offset of each read's ops in the flat streams
    ops   [T] uint8, lens [T] int32 — flat op/len streams
    """

    __slots__ = ("pos", "n_ops", "opoff", "ops", "lens")

    def __init__(self, pos, n_ops, opoff, ops, lens):
        self.pos = pos
        self.n_ops = n_ops
        self.opoff = opoff
        self.ops = ops
        self.lens = lens

    @property
    def num_reads(self) -> int:
        return int(self.pos.shape[0])

    @property
    def max_ops(self) -> int:
        return int(self.n_ops.max()) if self.n_ops.size else 0

    def flat(self) -> tuple[np.ndarray, np.ndarray]:
        """(ops_seq, lens_seq) in read order. Zero-copy when the streams
        are already contiguous in read order (the native reader's case)."""
        if self.n_ops.size == 0:
            return (np.empty(0, np.uint8), np.empty(0, np.int32))
        starts = np.cumsum(self.n_ops.astype(np.int64)) - self.n_ops
        total = int(starts[-1] + self.n_ops[-1])
        if total == len(self.ops) and np.array_equal(self.opoff, starts):
            return self.ops, self.lens
        src = np.repeat(self.opoff, self.n_ops) + (
            np.arange(total, dtype=np.int64) - np.repeat(starts, self.n_ops)
        )
        return self.ops[src], self.lens[src]

    def to_list(self) -> list[tuple[int, list[tuple[int, int]]]]:
        """Oracle-fallback form: [(pos, [(op, len), ...]), ...]."""
        out = []
        for r in range(self.num_reads):
            o = int(self.opoff[r])
            n = int(self.n_ops[r])
            cig = list(
                zip(self.ops[o : o + n].tolist(), self.lens[o : o + n].tolist())
            )
            out.append((int(self.pos[r]), cig))
        return out

    @staticmethod
    def from_list(reads) -> "PackedReads":
        R = len(reads)
        n_ops = np.fromiter((len(c) for _, c in reads), np.int32, R)
        pos = np.fromiter((p for p, _ in reads), np.int64, R)
        opoff = (np.cumsum(n_ops.astype(np.int64)) - n_ops) if R else \
            np.empty(0, np.int64)
        total = int(n_ops.sum())
        ops = np.empty(total, np.uint8)
        lens = np.empty(total, np.int32)
        t = 0
        for _, cig in reads:
            for op, ln in cig:
                ops[t] = op
                lens[t] = ln
                t += 1
        return PackedReads(pos, n_ops, opoff, ops, lens)


_EMPTY = PackedReads(
    np.empty(0, np.int64), np.empty(0, np.int32), np.empty(0, np.int64),
    np.empty(0, np.uint8), np.empty(0, np.int32),
)


def as_packed(reads) -> PackedReads:
    """Normalize a fetch() result (PackedReads or list form)."""
    if isinstance(reads, PackedReads):
        return reads
    if not reads:
        return _EMPTY
    return PackedReads.from_list(reads)


def as_read_list(reads):
    """Normalize to the oracle-fallback list form."""
    if isinstance(reads, PackedReads):
        return reads.to_list()
    if isinstance(reads, LazyWindowReads):
        return reads.to_list()
    return reads


_FALLBACK_READERS: dict = {}
_FALLBACK_LOCK = None


class LazyWindowReads:
    """Evidence for one window, re-fetched from the BAM on demand.

    The all-in-C pack path leaves the fetched reads in the reader's
    reusable buffers; snapshotting them per batch just in case a window
    overflows the device capacities would cost more bandwidth than the
    pack itself, so overflow fallback (rare by construction) re-queries
    the region instead — through a cached per-path fallback reader.
    """

    __slots__ = ("bam_path", "tid", "beg", "end")

    def __init__(self, bam_path: str, tid: int, beg: int, end: int):
        self.bam_path = bam_path
        self.tid = tid
        self.beg = beg
        self.end = end

    def to_list(self):
        global _FALLBACK_LOCK
        import threading

        if _FALLBACK_LOCK is None:
            _FALLBACK_LOCK = threading.Lock()
        with _FALLBACK_LOCK:
            reader = _FALLBACK_READERS.get(self.bam_path)
            if reader is None:
                from ..native import native_bam_reader

                reader = native_bam_reader(self.bam_path)
                if reader is None:
                    from ..io.bam import BamReader

                    reader = BamReader(self.bam_path)
                _FALLBACK_READERS[self.bam_path] = reader
            if self.tid < 0:
                return []
            if hasattr(reader, "fetch_packed"):
                return PackedReads(
                    *reader.fetch_packed(self.tid, self.beg, self.end)
                ).to_list()
            return [(r.pos, r.cigar)
                    for r in reader.fetch(self.tid, self.beg, self.end)]


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
    tid: int = -2          # explicit BAM tid (--chrom-by-name); -2 =
                           # the reference's tid = chrom-1 assumption


def window_tid(w: WindowSpec) -> int:
    """BAM tid for a window: the header-resolved tid when set
    (--chrom-by-name extension), else the reference's numeric mapping
    tid = chrom - 1 (refinement.c:114)."""
    return w.tid if w.tid != -2 else w.chrom_index - 1


@dataclass
class PackedBatch:
    """Device batch plus everything needed for fallback and emit."""

    batch: AuditBatch
    windows: list[WindowSpec]
    reads_per_window: list  # PackedReads (or list form) per window
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
        # --refine-inv (default off = reference parity): the reference
        # INTENDS INV refinement but refine_point collects nothing
        # (refinement.c:250; called with SV_INV at refinement.c:336-338),
        # so both breakpoints always print NA.  With the flag, the start
        # breakpoint runs the DEL-start rules (trailing-clip alignment
        # end + D>50 start — the right evidence) and the end breakpoint
        # the clean INV_END rules (leading-clip alignment start + D>50
        # end), over the reference's own INV intervals (audit.c:221-231).
        k_start, k_end = (
            (KIND_DEL_START, KIND_INV_END)
            if getattr(cfg, "refine_inv", False)
            else (KIND_POINT, KIND_POINT)
        )
        return (
            [
                WindowSpec(
                    k_start, t.chrom_index,
                    u(t.pos - cfg.wider_interval), u(t.pos + cfg.wider_interval),
                    t.pos, t.line_index, 0,
                ),
                WindowSpec(
                    k_end, t.chrom_index,
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
    tid = window_tid(w)
    beg = C.u32(w.inter_start - 1)
    end = C.u32(w.inter_end - 1)
    if tid < 0:
        return _EMPTY
    return fetch(tid, beg, end)


def pack_batches(
    windows: Iterable[WindowSpec],
    fetch: Callable[[int, int, int], object],
    cfg,
    n_shards: int = 1,
) -> Iterable[PackedBatch]:
    """Fetch reads for each window and pack fixed-shape batches.

    ``fetch(tid, beg, end)`` returns a PackedReads (native reader fast
    path) or ``[(pos, [(op, len), ...]), ...]`` lists.  Yields
    PackedBatch objects sized (B=cfg.batch_windows) windows.  With
    ``n_shards > 1`` batches are laid out shard-blockwise for
    `parallel.mesh.sharded_audit_step` (read-balanced bins, shard-local
    window ids).
    """
    chunk: list[WindowSpec] = []
    for w in windows:
        chunk.append(w)
        if len(chunk) >= cfg.batch_windows:
            yield pack_chunk(chunk, fetch, cfg, n_shards)
            chunk = []
    if chunk:
        yield pack_chunk(chunk, fetch, cfg, n_shards)


def pack_chunk(
    window_chunk: Sequence[WindowSpec],
    fetch: Callable[[int, int, int], object],
    cfg,
    n_shards: int = 1,
) -> PackedBatch:
    """Fetch + pack one batch worth of windows (the unit of work each
    producer-pool thread runs; see pipeline.audit)."""
    items: list[tuple[WindowSpec, PackedReads]] = []
    for w in window_chunk:
        if w.kind == KIND_POINT:
            reads = _EMPTY  # refine_point collects nothing; skip I/O
        else:
            reads = as_packed(query_region(fetch, w))
        items.append((w, reads))
    if n_shards > 1:
        return _pack_one_sharded(items, cfg, n_shards)
    return _pack_one(items, cfg)


def pack_chunk_native(window_chunk: Sequence[WindowSpec], reader, cfg,
                      n_shards: int = 1) -> PackedBatch:
    """Dense (single-device) fetch + pack, all heavy work in C.

    One `svbam_fetch_batch` call pulls every window's reads (GIL
    released for the whole chunk) and one `svbam_fill` call scatters
    them into the padded device matrices — the Python layer only builds
    the tiny per-window attribute vectors.  Falls back to the generic
    path when a read exceeds the top ops bucket (host-oracle windows).
    """
    n_win = len(window_chunk)
    tids = np.empty(n_win, np.int32)
    begs = np.empty(n_win, np.int64)
    ends = np.empty(n_win, np.int64)
    for i, w in enumerate(window_chunk):
        if w.kind == KIND_POINT or window_tid(w) < 0:
            tids[i] = -1  # refine_point collects nothing; skip I/O
            begs[i] = ends[i] = 0
        else:
            tids[i] = window_tid(w)
            begs[i] = int(C.u32(w.inter_start - 1))
            ends[i] = int(C.u32(w.inter_end - 1))

    total, counts = reader.fetch_batch(tids, begs, ends)
    max_ops = reader.max_nops(total)
    if max_ops > MAX_OPS_BUCKET:
        # Rare: some window needs the host oracle. Take the generic path
        # (re-fetch per window) so the split logic stays in one place.
        def fetch(tid, beg, end):
            return PackedReads(*reader.fetch_packed(tid, int(beg), int(end)))

        return pack_chunk(window_chunk, fetch, cfg, n_shards=n_shards)

    if n_shards > 1:
        return _pack_native_sharded(window_chunk, reader, cfg, n_shards,
                                    total, counts, max_ops,
                                    tids, begs, ends)

    O = _bucket(max(max_ops, 1), OPS_BUCKETS)
    B = max(cfg.batch_windows, n_win, 1)
    N = _pow2(max(total, 1), lo=64)

    rpos, rnops, fops, flens = reader.batch_flat_n(total)
    T = _pow2(max(len(fops), 1), lo=256)
    ops_flat = np.empty(T, np.uint8)
    lens_flat = np.empty(T, np.int32)
    ops_flat[: len(fops)] = fops
    lens_flat[: len(flens)] = flens
    pos = np.zeros(N, np.int32)
    n_ops = np.zeros(N, np.int32)          # padding rows MUST be 0
    wid = np.full(N, B, np.int32)
    pos[:total] = rpos.astype(np.int32)
    n_ops[:total] = rnops
    wid[:total] = np.repeat(np.arange(n_win, dtype=np.int32), counts)

    kind = np.full(B, KIND_POINT, np.int32)
    istart = np.zeros(B, np.int32)
    iend = np.zeros(B, np.int32)
    ipos = np.zeros(B, np.int32)
    for b, w in enumerate(window_chunk):
        kind[b] = w.kind
        istart[b] = np.int64(w.inter_start).astype(np.int32)
        iend[b] = np.int64(w.inter_end).astype(np.int32)
        ipos[b] = np.int64(w.imprecise_pos).astype(np.int32)

    # Overflow-fallback evidence is re-fetched lazily (rare): snapshotting
    # every batch's reads would cost more bandwidth than the pack itself.
    bam_path = reader.path
    reads_per_window = [
        LazyWindowReads(bam_path, int(tids[i]), int(begs[i]), int(ends[i]))
        for i in range(n_win)
    ]

    batch = AuditBatchCSR(
        ops_flat=ops_flat, lens_flat=lens_flat, pos=pos, n_ops=n_ops,
        window_id=wid, kind=kind, inter_start=istart, inter_end=iend,
        imprecise_pos=ipos, ops_width=O,
    )
    return PackedBatch(
        batch=batch,
        windows=list(window_chunk),
        reads_per_window=reads_per_window,
        oracle_windows=[],
    )


def _pack_native_sharded(window_chunk, reader, cfg, n_shards: int,
                         total: int, counts: np.ndarray, max_ops: int,
                         tids: np.ndarray, begs: np.ndarray,
                         ends: np.ndarray) -> PackedBatch:
    """Shard-blockwise CSR packing for `sharded_audit_step_csr`.

    The native fetch already laid reads out in window order, so a
    contiguous window→shard split keeps every per-shard read/flat-op
    range a contiguous slice — the blocks are plain memcpys, no
    re-gather (contrast _pack_one_sharded, which must re-bin Python-side
    PackedReads).  Layout contract: T/N/B all divisible by n_shards,
    window_id shard-local (padding sentinel b_loc), flat tails garbage.
    """
    n_win = len(window_chunk)
    O = _bucket(max(max_ops, 1), OPS_BUCKETS)
    rpos, rnops, fops, flens = reader.batch_flat_n(total)

    b_loc = max(-(-cfg.batch_windows // n_shards), -(-n_win // n_shards), 1)
    B = n_shards * b_loc

    counts64 = counts.astype(np.int64)
    roff = np.concatenate([[0], np.cumsum(counts64)])       # per-window reads
    nops64 = rnops.astype(np.int64)
    ooff = np.concatenate([[0], np.cumsum(nops64)])         # per-read flat ops

    # Per-shard window ranges (contiguous) and their read/flat slices.
    wlo = [min(s * b_loc, n_win) for s in range(n_shards + 1)]
    rlo = [int(roff[w]) for w in wlo]
    olo = [int(ooff[r]) for r in rlo]
    n_loc = _pow2(max(1, max(rlo[s + 1] - rlo[s]
                             for s in range(n_shards))), lo=64)
    t_loc = _pow2(max(1, max(olo[s + 1] - olo[s]
                             for s in range(n_shards))), lo=256)

    N = n_shards * n_loc
    T = n_shards * t_loc
    ops_flat = np.zeros(T, np.uint8)
    lens_flat = np.zeros(T, np.int32)
    pos = np.zeros(N, np.int32)
    n_ops = np.zeros(N, np.int32)          # padding rows MUST be 0
    wid = np.full(N, b_loc, np.int32)      # shard-local padding sentinel
    kind = np.full(B, KIND_POINT, np.int32)
    istart = np.zeros(B, np.int32)
    iend = np.zeros(B, np.int32)
    ipos = np.zeros(B, np.int32)

    window_slots: list[int] = []
    for s in range(n_shards):
        a, b = wlo[s], wlo[s + 1]
        ra, rb = rlo[s], rlo[s + 1]
        oa, ob = olo[s], olo[s + 1]
        pos[s * n_loc : s * n_loc + (rb - ra)] = rpos[ra:rb].astype(np.int32)
        n_ops[s * n_loc : s * n_loc + (rb - ra)] = rnops[ra:rb]
        wid[s * n_loc : s * n_loc + (rb - ra)] = np.repeat(
            np.arange(b - a, dtype=np.int32), counts[a:b])
        ops_flat[s * t_loc : s * t_loc + (ob - oa)] = fops[oa:ob]
        lens_flat[s * t_loc : s * t_loc + (ob - oa)] = flens[oa:ob]
        for k, w in enumerate(window_chunk[a:b]):
            g = s * b_loc + k
            kind[g] = w.kind
            istart[g] = np.int64(w.inter_start).astype(np.int32)
            iend[g] = np.int64(w.inter_end).astype(np.int32)
            ipos[g] = np.int64(w.imprecise_pos).astype(np.int32)
            window_slots.append(g)

    bam_path = reader.path
    reads_per_window = [
        LazyWindowReads(bam_path, int(tids[i]), int(begs[i]), int(ends[i]))
        for i in range(n_win)
    ]

    batch = AuditBatchCSR(
        ops_flat=ops_flat, lens_flat=lens_flat, pos=pos, n_ops=n_ops,
        window_id=wid, kind=kind, inter_start=istart, inter_end=iend,
        imprecise_pos=ipos, ops_width=O,
    )
    return PackedBatch(
        batch=batch,
        windows=list(window_chunk),
        reads_per_window=reads_per_window,
        oracle_windows=[],
        n_shards=n_shards,
        window_slots=window_slots,
    )


INT64_MIN = np.iinfo(np.int64).min
_I32_PAD = 0x7FFFFFFF


@dataclass
class AuditBatchCand:
    """Host-extracted candidate layout (the bandwidth-optimal device
    feed): the native C reader already ran the reference's CIGAR
    evidence walk (refinement.c:103-325) per window, so the device
    receives only K sorted int32 candidates per window — typically
    100-500x fewer host→device bytes than shipping packed CIGARs — and
    runs the batched consensus sweep (the genuinely vectorizable part).
    """

    locs: np.ndarray           # [B, K] int32 sorted asc, INT32_MAX pad
    counts: np.ndarray         # [B] int32, clipped to K
    imprecise_pos: np.ndarray  # [B] int32

    @property
    def num_windows(self) -> int:
        return int(self.counts.shape[0])


@dataclass
class PackedCandBatch:
    """A host-extracted batch plus everything collect/emit need."""

    batch: AuditBatchCand
    windows: list[WindowSpec]
    true_counts: np.ndarray    # [n_win] int32, may exceed K
    refined_c: np.ndarray      # [n_win] int64; != INT64_MIN → precomputed
    num_reads: int = 0
    n_shards: int = 1


def pack_chunk_cand(window_chunk: Sequence[WindowSpec], reader, cfg,
                    n_shards: int = 1) -> PackedCandBatch:
    """Fetch + host-extract one chunk of windows (all heavy work in C).

    One `svbam_fetch_batch` + one `svbam_extract_batch` call per chunk;
    windows whose candidates overflow K arrive pre-refined by the C
    scalar consensus (exact; same semantics the golden refshim tests
    prove against the reference's own code)."""
    n_win = len(window_chunk)
    tids = np.empty(n_win, np.int32)
    begs = np.empty(n_win, np.int64)
    ends = np.empty(n_win, np.int64)
    kinds = np.empty(n_win, np.int32)
    istart = np.empty(n_win, np.int64)
    iend = np.empty(n_win, np.int64)
    ipos = np.empty(n_win, np.int64)
    for i, w in enumerate(window_chunk):
        kinds[i] = w.kind
        istart[i] = int(C.u32(w.inter_start))
        iend[i] = int(C.u32(w.inter_end))
        ipos[i] = int(C.u32(w.imprecise_pos))
        if w.kind == KIND_POINT or window_tid(w) < 0:
            tids[i] = -1  # refine_point collects nothing; skip I/O
            begs[i] = ends[i] = 0
        else:
            tids[i] = window_tid(w)
            begs[i] = int(C.u32(w.inter_start - 1))
            ends[i] = int(C.u32(w.inter_end - 1))

    # Merged fetch (default): overlapping/nearby windows share one
    # region fetch and each read is decoded once — the per-window read
    # sets are identical by construction (the htslib overlap test is
    # re-applied per window in C), so results cannot differ.
    merge_gap = int(getattr(cfg, "merge_fetch_gap", 0) or 0)
    if merge_gap > 0 and hasattr(reader, "fetch_batch_merged"):
        total, win_counts = reader.fetch_batch_merged(tids, begs, ends,
                                                      merge_gap)
    else:
        total, win_counts = reader.fetch_batch(tids, begs, ends)
    K = _pow2(min(getattr(cfg, "cand_width", 128), 8192), lo=16)
    locs, counts, refined = reader.extract_batch(
        kinds, istart, iend, ipos, win_counts, K,
        cfg.consensus_min_count, cfg.consensus_interval,
        cfg.consensus_interval_range,
    )
    # Shrink the shipped width to this batch's live candidate maximum
    # (pow2 bucket, so at most a handful of compiled variants): the
    # device step costs ~nothing, but every host->device byte rides the
    # accelerator tunnel, and typical windows carry 10-30 candidates
    # against a 128-wide default.
    kmax = int(np.minimum(counts, K).max()) if n_win else 1
    keff = _pow2(max(kmax, 1), lo=16)
    if keff < K:
        locs = np.ascontiguousarray(locs[:, :keff])
        K = keff

    # Pad the window axis to a stable bucket (recompile control); with a
    # mesh, also to a multiple of the shard count (rows shard blockwise).
    B = max(cfg.batch_windows, n_win, 1)
    if n_shards > 1:
        B = ((B + n_shards - 1) // n_shards) * n_shards
    if B != n_win:
        locs_p = np.full((B, K), _I32_PAD, np.int32)
        locs_p[:n_win] = locs
        counts_p = np.zeros(B, np.int32)
        counts_p[:n_win] = np.minimum(counts, K)
        ipos_p = np.zeros(B, np.int32)
        ipos_p[:n_win] = ipos.astype(np.int32)
    else:
        locs_p = locs
        counts_p = np.minimum(counts, K)
        ipos_p = ipos.astype(np.int32)

    return PackedCandBatch(
        batch=AuditBatchCand(locs=locs_p, counts=counts_p,
                             imprecise_pos=ipos_p),
        windows=list(window_chunk),
        true_counts=counts,
        refined_c=refined,
        num_reads=int(total),
        n_shards=n_shards,
    )


def _split_oracle(items):
    """Separate windows whose reads exceed the top ops bucket (host
    oracle handles those with exact reference semantics)."""
    device_items = []
    oracle_items = []
    for w, pr in items:
        if pr.max_ops > MAX_OPS_BUCKET:
            oracle_items.append((w, pr.to_list()))
        else:
            device_items.append((w, pr))
    return device_items, oracle_items


def _fill_reads(
    ops, lens, pos, n_ops, wid,
    prs: list[PackedReads],
    row_start: np.ndarray,
    wid_value: np.ndarray,
    O: int,
) -> None:
    """Scatter each PackedReads block into the device matrices.

    ``prs[i]``'s reads land in consecutive rows starting at
    ``row_start[i]`` with window id ``wid_value[i]`` — one vectorized
    fancy-indexed assignment over the whole batch.
    """
    if not prs:
        return
    counts = np.fromiter((p.num_reads for p in prs), np.int64, len(prs))
    if counts.sum() == 0:
        return
    dest_row = np.concatenate(
        [np.arange(s, s + c, dtype=np.int64)
         for s, c in zip(row_start, counts) if c]
    )
    pos_all = np.concatenate([p.pos for p in prs if p.num_reads])
    nops_all = np.concatenate([p.n_ops for p in prs if p.num_reads])
    flats = [p.flat() for p in prs if p.num_reads]
    ops_seq = np.concatenate([f[0] for f in flats])
    lens_seq = np.concatenate([f[1] for f in flats])

    pos[dest_row] = pos_all.astype(np.int32)
    n_ops[dest_row] = nops_all
    wid[dest_row] = np.repeat(wid_value, counts)

    nops64 = nops_all.astype(np.int64)
    starts = np.cumsum(nops64) - nops64
    T = int(starts[-1] + nops64[-1]) if len(nops64) else 0
    if T == 0:
        return
    col = np.arange(T, dtype=np.int64) - np.repeat(starts, nops_all)
    flat_idx = np.repeat(dest_row, nops_all) * O + col
    ops.reshape(-1)[flat_idx] = ops_seq.astype(np.int8)
    lens.reshape(-1)[flat_idx] = lens_seq


def _pow2(n: int, lo: int = 256) -> int:
    v = lo
    while v < n:
        v *= 2
    return v


def _pack_one(items: list[tuple[WindowSpec, PackedReads]], cfg) -> PackedBatch:
    device_items, oracle_items = _split_oracle(items)

    n_win = len(device_items)
    counts = np.fromiter(
        (pr.num_reads for _, pr in device_items), np.int64, n_win
    ) if n_win else np.empty(0, np.int64)
    n_reads = int(counts.sum())
    max_ops = max((pr.max_ops for _, pr in device_items), default=1)
    O = _bucket(max(max_ops, 1), OPS_BUCKETS)
    # Constant window axis + pow2-bucketed reads axis: every batch of a
    # run shares one compiled shape per O bucket (no per-batch recompile).
    B = max(cfg.batch_windows, n_win, 1)
    N = _pow2(max(n_reads, 1))

    ops = np.full((N, O), PAD_OP, np.int8)
    lens = np.zeros((N, O), np.int32)
    pos = np.zeros(N, np.int32)
    n_ops = np.zeros(N, np.int32)
    wid = np.full(N, B, np.int32)
    kind = np.full(B, KIND_POINT, np.int32)  # padding windows collect nothing
    istart = np.zeros(B, np.int32)
    iend = np.zeros(B, np.int32)
    ipos = np.zeros(B, np.int32)

    for b, (w, _) in enumerate(device_items):
        kind[b] = w.kind
        # Windows that still have reads always have sane (< 2^31) interval
        # coordinates — wrapped intervals produce empty queries — so the
        # int32 casts below are lossless where they matter.
        istart[b] = np.int64(w.inter_start).astype(np.int32)
        iend[b] = np.int64(w.inter_end).astype(np.int32)
        ipos[b] = np.int64(w.imprecise_pos).astype(np.int32)

    row_start = (np.cumsum(counts) - counts) if n_win else np.empty(0, np.int64)
    _fill_reads(
        ops, lens, pos, n_ops, wid,
        [pr for _, pr in device_items],
        row_start, np.arange(n_win, dtype=np.int64), O,
    )

    batch = AuditBatch(
        ops=ops, lens=lens, pos=pos, n_ops=n_ops, window_id=wid,
        kind=kind, inter_start=istart, inter_end=iend, imprecise_pos=ipos,
    )
    return PackedBatch(
        batch=batch,
        windows=[w for w, _ in device_items],
        reads_per_window=[pr for _, pr in device_items],
        oracle_windows=oracle_items,
    )


def _pack_one_sharded(
    items: list[tuple[WindowSpec, PackedReads]], cfg, n_shards: int
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
    device_items, oracle_items = _split_oracle(items)

    bins: list[list[int]] = [[] for _ in range(n_shards)]
    bin_reads = [0] * n_shards
    order = sorted(
        range(len(device_items)), key=lambda i: -device_items[i][1].num_reads
    )
    for i in order:
        s = min(range(n_shards), key=lambda j: (bin_reads[j], len(bins[j])))
        bins[s].append(i)
        bin_reads[s] += device_items[i][1].num_reads

    # Stable shapes across batches (one compile): window axis padded to
    # the ceil(batch_windows / n_shards) capacity, reads axis to pow2.
    b_cap = -(-cfg.batch_windows // n_shards)
    b_loc = max(b_cap, max((len(b) for b in bins), default=1), 1)
    n_loc = _pow2(max(1, max(bin_reads, default=1)), lo=64)
    B = n_shards * b_loc
    N = n_shards * n_loc

    max_ops = max((pr.max_ops for _, pr in device_items), default=1)
    O = _bucket(max(max_ops, 1), OPS_BUCKETS)

    ops = np.full((N, O), PAD_OP, np.int8)
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
    prs: list[PackedReads] = []
    row_starts: list[int] = []
    wid_values: list[int] = []
    for s, bin_idx in enumerate(bins):
        r = s * n_loc
        for k, i in enumerate(bin_idx):
            w, pr = device_items[i]
            g = s * b_loc + k
            kind[g] = w.kind
            istart[g] = np.int64(w.inter_start).astype(np.int32)
            iend[g] = np.int64(w.inter_end).astype(np.int32)
            ipos[g] = np.int64(w.imprecise_pos).astype(np.int32)
            prs.append(pr)
            row_starts.append(r)
            wid_values.append(k)
            r += pr.num_reads
            windows_out.append(w)
            window_slots.append(g)
            reads_per_window.append(pr)

    _fill_reads(
        ops, lens, pos, n_ops, wid, prs,
        np.asarray(row_starts, np.int64), np.asarray(wid_values, np.int64), O,
    )

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
