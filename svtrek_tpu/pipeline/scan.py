"""`scan` mode driver: windowed INS discovery over a BAM region.

Makes the reference's dead sliding-window discovery a real mode
(sliding_window.c:8-97 has no call site and a mismatched header name;
SURVEY.md §2.11/§3.4).  Pipeline: tile [start, end) into
``window_size``-wide sub-windows; each sub-window is one batch row —
host fetches its reads (tid = chrom-1, 1-based bounds exactly like
sliding_window.c:27), the device extracts INS evidence
(ops.cigar.extract_read_candidates, same rule as refine_ins), groups it
per sub-window, and runs the strided cluster scan kernel
(ops.window_scan).  Sub-windows whose evidence overflows the device
capacity fall back to the scalar oracle — exactness is never silently
lost.

Output mirrors the reference's per-window print
(sliding_window.c:87) plus an overall-best summary line (the reference
only *returns* the overall best; printing it is this framework's
defined behavior).
"""
from __future__ import annotations

import sys

import numpy as np

from .. import constants as C
from ..config import ScanConfig
from ..constants import KIND_INS
from ..ops.cigar import extract_read_candidates, group_candidates_by_window
from ..ops.window_scan import window_scan_batch
from ..oracle import extract_candidates, window_scan


def _next_pow2(n: int, lo: int = 16) -> int:
    v = lo
    while v < n:
        v *= 2
    return v


def scan_tiles(cfg: ScanConfig) -> list[tuple[int, int]]:
    """[start, end) tiling: sub_start += window_size, last tile clipped
    (sliding_window.c:12-15)."""
    tiles = []
    s = C.u32(cfg.start)
    while s < C.u32(cfg.end):
        e = min(C.u32(s + cfg.window_size), C.u32(cfg.end))
        tiles.append((s, e))
        s = C.u32(s + cfg.window_size)
    return tiles


def resolve_scan_tid(cfg: ScanConfig, reader=None) -> int:
    """tid for the scan region: the reference's numeric tid = chrom-1
    (sliding_window.c:27 via refinement.c:114), or --chrom-by-name
    resolution against the BAM header (the same extension audt has)."""
    if getattr(cfg, "chrom_by_name", False):
        if reader is None:
            return -1
        if hasattr(reader, "tid_by_name"):
            return reader.tid_by_name(cfg.chrom_name)
        return reader.tid_of(cfg.chrom_name)
    return cfg.chrom - 1


def run_scan_tiles(
    tiles: list[tuple[int, int]],
    fetch,
    cfg: ScanConfig,
    tid: int | None = None,
) -> list[tuple[int, int]]:
    """Run the windowed scan over pre-built tiles.

    ``fetch(tid, beg, end)`` → [(pos, [(op, len), ...]), ...].
    Returns [(best_pos or -1, support)] per tile.
    """
    results: list[tuple[int, int]] = [(-1, 0)] * len(tiles)
    K = _next_pow2(min(cfg.max_candidates, 8192), 64)
    if tid is None:
        tid = cfg.chrom - 1

    for base in range(0, len(tiles), cfg.batch_windows):
        chunk = tiles[base : base + cfg.batch_windows]
        per_tile_reads = []
        max_ops = 1
        n_reads = 0
        for (s, e) in chunk:
            reads = [] if tid < 0 else fetch(tid, C.u32(s - 1), C.u32(e - 1))
            per_tile_reads.append(reads)
            n_reads += len(reads)
            for _, cig in reads:
                max_ops = max(max_ops, len(cig))

        B = len(chunk)
        O = _next_pow2(max_ops, 16)
        N = max(n_reads, 1)
        ops = np.full((N, O), 9, np.int8)
        lens = np.zeros((N, O), np.int32)
        pos = np.zeros(N, np.int32)
        n_ops = np.zeros(N, np.int32)
        wid = np.full(N, B, np.int32)
        kind = np.full(B, KIND_INS, np.int32)
        istart = np.zeros(B, np.int32)
        iend = np.zeros(B, np.int32)
        r = 0
        for b, ((s, e), reads) in enumerate(zip(chunk, per_tile_reads)):
            istart[b] = np.int64(s).astype(np.int32)
            iend[b] = np.int64(e).astype(np.int32)
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

        kind_r = kind[np.clip(wid, 0, B - 1)]
        is_r = istart[np.clip(wid, 0, B - 1)]
        ie_r = iend[np.clip(wid, 0, B - 1)]
        cand, _ = extract_read_candidates(
            ops, lens, pos, n_ops, kind_r, is_r, ie_r)
        locs, counts, read_ovf = group_candidates_by_window(cand, wid, B, K)
        best, support = window_scan_batch(
            locs, np.minimum(np.asarray(counts), K),
            min_count=cfg.consensus_min_count,
            window_size=cfg.window_size, slide_size=cfg.slide_size,
        )
        best = np.asarray(best)
        support = np.asarray(support)
        counts = np.asarray(counts)
        read_ovf = np.asarray(read_ovf)
        for b, (s, e) in enumerate(chunk):
            if read_ovf[b] or counts[b] > K:
                evidence = extract_candidates(
                    KIND_INS, per_tile_reads[b], s, e)
                results[base + b] = window_scan(
                    evidence, cfg.consensus_min_count,
                    cfg.window_size, cfg.slide_size)
            else:
                results[base + b] = (int(best[b]), int(support[b]))
    return results


def run_scan_tiles_native(
    tiles: list[tuple[int, int]],
    reader,
    cfg: ScanConfig,
    tid: int | None = None,
    make_reader=None,
) -> list[tuple[int, int]]:
    """audt-grade host path for scan: one C merged fetch + one C
    extract_batch call per chunk (GIL released throughout), the strided
    cluster scan batched on device — no per-read Python objects
    (VERDICT round-1 item 5).  Tiles whose evidence overflows K are
    re-fetched and scanned by the scalar oracle (exactness preserved).

    When ``make_reader`` is given, chunks' host stages (fetch + extract,
    decode-bandwidth-bound) run on a cfg.thread_number worker pool with
    one private reader per worker — the audt producer-pool treatment —
    while the device scan consumes completed chunks in order."""
    results: list[tuple[int, int]] = [(-1, 0)] * len(tiles)
    K = _next_pow2(min(cfg.max_candidates, 8192), 64)
    if tid is None:
        tid = cfg.chrom - 1
    merge_gap = int(getattr(cfg, "merge_fetch_gap", 0) or 0)

    chunks = [(base, tiles[base:base + cfg.batch_windows])
              for base in range(0, len(tiles), cfg.batch_windows)]

    def host_stage(chunk, rd):
        """Fetch + extract one chunk on reader `rd`; overflow tiles'
        reads are packed HERE (the handle belongs to this worker) so
        the oracle can run on the main thread without handle races."""
        n = len(chunk)
        tids = np.full(n, tid if tid >= 0 else -1, np.int32)
        begs = np.fromiter((int(C.u32(s - 1)) for s, _ in chunk),
                           np.int64, n)
        ends = np.fromiter((int(C.u32(e - 1)) for _, e in chunk),
                           np.int64, n)
        # Adjacent scan tiles merge into ONE region fetch per chunk
        # (each read decoded once; per-tile read sets identical).
        if merge_gap > 0 and hasattr(rd, "fetch_batch_merged"):
            total, win_counts = rd.fetch_batch_merged(
                tids, begs, ends, merge_gap)
        else:
            total, win_counts = rd.fetch_batch(tids, begs, ends)
        kinds = np.full(n, KIND_INS, np.int32)
        istart = np.fromiter((int(C.u32(s)) for s, _ in chunk), np.int64, n)
        iend = np.fromiter((int(C.u32(e)) for _, e in chunk), np.int64, n)
        ipos = np.zeros(n, np.int64)
        locs, counts, _ = rd.extract_batch(
            kinds, istart, iend, ipos, win_counts, K,
            cfg.consensus_min_count, cfg.consensus_interval,
            cfg.consensus_interval_range,
        )
        overflow = {}
        for b in np.nonzero(counts > K)[0]:
            overflow[int(b)] = rd.fetch_packed(
                int(tids[b]), int(begs[b]), int(ends[b]))
        return locs, counts, overflow

    n_workers = max(1, min(cfg.thread_number, len(chunks)))
    if n_workers > 1 and make_reader is not None:
        import itertools
        import threading
        from collections import deque as _deque
        from concurrent.futures import ThreadPoolExecutor

        tls = threading.local()

        def work(chunk):
            if not hasattr(tls, "rd"):
                tls.rd = make_reader()
            return host_stage(chunk, tls.rd)

        ex = ThreadPoolExecutor(n_workers, thread_name_prefix="svtrek-scan")

        def bounded_map(fn, items, window):
            """ex.map, but with at most `window` futures outstanding —
            ex.map submits every chunk eagerly, so completed host-stage
            results (locs [n,K] arrays + overflow reads) would buffer
            unboundedly if the device consumer lags (ADVICE r4)."""
            it = iter(items)
            pending = _deque(ex.submit(fn, c)
                             for c in itertools.islice(it, window))
            while pending:
                fut = pending.popleft()
                nxt = next(it, None)
                if nxt is not None:
                    pending.append(ex.submit(fn, nxt))
                yield fut.result()

        staged = bounded_map(work, (c for _, c in chunks), n_workers + 2)
    else:
        ex = None
        staged = (host_stage(c, reader) for _, c in chunks)

    def apply(base, chunk, counts, overflow, best, support):
        best = np.asarray(best)
        support = np.asarray(support)
        for b, (s, e) in enumerate(chunk):
            if counts[b] > K:
                # Rare overflow: exact scalar oracle over the reads
                # the host stage packed for this tile.
                from .pack import PackedReads

                evidence = extract_candidates(
                    KIND_INS, PackedReads(*overflow[b]).to_list(), s, e)
                results[base + b] = window_scan(
                    evidence, cfg.consensus_min_count,
                    cfg.window_size, cfg.slide_size)
            else:
                results[base + b] = (int(best[b]), int(support[b]))

    from collections import deque

    in_flight: deque = deque()  # device batches ride async dispatch
    try:
        for (base, chunk), (locs, counts, overflow) in zip(chunks, staged):
            n = len(chunk)
            B = max(cfg.batch_windows, n)
            if B != n:
                locs_p = np.full((B, K), 0x7FFFFFFF, np.int32)
                locs_p[:n] = locs
                counts_p = np.zeros(B, np.int32)
                counts_p[:n] = np.minimum(counts, K)
            else:
                locs_p = locs
                counts_p = np.minimum(counts, K)

            best, support = window_scan_batch(
                locs_p, counts_p,
                min_count=cfg.consensus_min_count,
                window_size=cfg.window_size, slide_size=cfg.slide_size,
            )
            in_flight.append((base, chunk, counts, overflow, best, support))
            if len(in_flight) > 3:
                apply(*in_flight.popleft())
        while in_flight:
            apply(*in_flight.popleft())
    finally:
        if ex is not None:
            ex.shutdown(wait=True)
    return results


def run_scan(cfg: ScanConfig, out=None, err=None) -> tuple[int, list[str]]:
    """Full scan pipeline.  Returns (overall_best_pos or -1, lines)."""
    out = out or sys.stdout

    from ..io.bam import BamReader
    from ..native import native_bam_reader

    reader = None
    if cfg.use_native_io:
        reader = native_bam_reader(cfg.bam_file)

    tiles = scan_tiles(cfg)
    if reader is not None and hasattr(reader, "extract_batch"):
        tid = resolve_scan_tid(cfg, reader)

        def make_reader():
            return native_bam_reader(cfg.bam_file)

        results = run_scan_tiles_native(tiles, reader, cfg, tid=tid,
                                        make_reader=make_reader)
    else:
        if reader is None:
            reader = BamReader(cfg.bam_file)
        tid = resolve_scan_tid(cfg, reader)

        def fetch(tid, beg, end):
            return [
                (rec.pos, rec.cigar)
                for rec in reader.fetch(tid, int(beg), int(end))
            ]

        results = run_scan_tiles(tiles, fetch, cfg, tid=tid)

    lines = []
    best_overall, support_overall = -1, 0
    for (s, e), (bp, sup) in zip(tiles, results):
        if bp != -1:
            # Per-window report (sliding_window.c:87).
            lines.append(
                f"INS Discovery in window [{s}, {e}] at position {bp} "
                f"with support {sup}"
            )
            if sup > support_overall:
                support_overall = sup
                best_overall = bp
    lines.append(
        f"(SCAN INS) best position: {best_overall}, "
        f"support: {support_overall}"
    )
    for line in lines:
        print(line, file=out)

    if cfg.output_file:
        with open(cfg.output_file, "w") as fh:
            fh.write("\n".join(lines) + "\n")
    return best_overall, lines
