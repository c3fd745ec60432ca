#!/usr/bin/env python
"""Benchmark: SV breakpoints refined per second, device vs C baseline.

Prints ONE JSON line:
  {"metric": "breakpoints_refined_per_sec", "value": N,
   "unit": "breakpoints/s", "vs_baseline": R}

The workload is a synthetic packed batch of refine windows (the audit
hot path: CIGAR-walk evidence extraction → window grouping → clustering
consensus).  The baseline is this repo's C scalar implementation of the
same reference semantics (svtrek_tpu/native/svtrek_native.c), compiled
-O3 and scaled by the reference's default 4 worker threads
(params.h:36) under a perfect-scaling assumption — a deliberately
generous stand-in for the reference binary, which cannot be built here
(its htslib submodule is empty; see BASELINE.md).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Persist XLA compiles (some remote compiles here take minutes).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

B = 8192            # windows per batch (dispatch-overhead-amortizing; the
                    # step itself is ~30 µs flat from 1k to 16k windows)
READS_PER_WIN = 24  # supporting + noise reads per window
O = 128             # padded CIGAR ops per read
K = 64              # candidate capacity per window (overflow → host fallback)
ITERS = 30
REF_THREADS = 4     # reference default thread count (params.h:36)


def make_workload(seed=0):
    """Synthetic refine windows, vectorized (the scalar loop version took
    minutes at B=8192).  Same shape as before: per read an optional
    leading soft-clip, a lead M to near the breakpoint, one >50 bp SV op
    on the 10 supporting reads, then sub-threshold noise ops and an
    optional trailing soft-clip."""
    rng = np.random.default_rng(seed)
    N = B * READS_PER_WIN
    cols = np.arange(O, dtype=np.int32)[None, :]

    base = rng.integers(100_000, 50_000_000, B)
    kind = rng.integers(0, 3, B).astype(np.int32)
    istart = base - 2000
    iend = base + 2000
    ipos = base + rng.integers(-40, 40, B)

    base_r = np.repeat(base, READS_PER_WIN)
    kind_r = np.repeat(kind, READS_PER_WIN)
    start = base_r - rng.integers(1_000, 12_000, N)
    j = np.tile(np.arange(READS_PER_WIN), B)
    has_lead_s = rng.random(N) < 0.3
    has_trail_s = rng.random(N) < 0.3
    has_sv = j < 10

    # Noise body: ops in {M, I, D} with sub-threshold lengths.
    t = rng.integers(0, 4, (N, O))
    noise_ops = np.where(t == 1, 1, np.where(t == 2, 2, 0)).astype(np.int8)
    noise_lens = np.where(
        t == 1, rng.integers(1, 45, (N, O)),
        np.where(t == 2, rng.integers(1, 45, (N, O)),
                 np.where(t == 0, rng.integers(1, 300, (N, O)),
                          rng.integers(1, 50, (N, O))))).astype(np.int32)
    n_noise = rng.integers(8, O - 12, N).astype(np.int32)

    lead_col = has_lead_s.astype(np.int32)           # M lead position
    sv_col = lead_col + 1                             # SV op (supporting reads)
    noise_beg = (lead_col + 1 + has_sv)[:, None]
    noise_end = np.minimum(noise_beg[:, 0] + n_noise, O - 2)[:, None]
    in_noise = (cols >= noise_beg) & (cols < noise_end)

    ops = np.where(in_noise, noise_ops, np.int8(9))
    lens = np.where(in_noise, noise_lens, 0)

    def put(col, op, ln, mask):
        col = col[:, None]
        np.put_along_axis(ops, col, np.where(mask, op, np.take_along_axis(
            ops, col, axis=1)[:, 0])[:, None].astype(np.int8), axis=1)
        np.put_along_axis(lens, col, np.where(mask, ln, np.take_along_axis(
            lens, col, axis=1)[:, 0])[:, None].astype(np.int32), axis=1)

    lead_len = np.maximum(base_r - start + rng.integers(-3, 4, N), 1)
    put(np.zeros(N, np.int32), 4, rng.integers(20, 300, N), has_lead_s)
    put(lead_col, 0, lead_len, np.ones(N, bool))
    svop = np.where(kind_r == 2, 1, 2)
    put(sv_col, svop, rng.integers(55, 90, N), has_sv)
    put(noise_end[:, 0], 4, rng.integers(20, 300, N), has_trail_s)

    pos = start
    n_ops = noise_end[:, 0] + has_trail_s
    wid = np.repeat(np.arange(B, dtype=np.int32), READS_PER_WIN)
    return (ops, lens, pos.astype(np.int64), n_ops.astype(np.int32), wid,
            kind, istart.astype(np.int64), iend.astype(np.int64),
            ipos.astype(np.int64))

def bench_device(work):
    import jax

    from svtrek_tpu.ops.audit_step import audit_refine_step

    ops, lens, pos, n_ops, wid, kind, istart, iend, ipos = work
    args = (
        jax.device_put(ops), jax.device_put(lens),
        jax.device_put(pos.astype(np.int32)), jax.device_put(n_ops),
        jax.device_put(wid), jax.device_put(kind),
        jax.device_put(istart.astype(np.int32)),
        jax.device_put(iend.astype(np.int32)),
        jax.device_put(ipos.astype(np.int32)),
    )

    def run():
        refined, counts, overflow = audit_refine_step(*args, num_windows=B, K=K)
        return refined

    refined = run()  # compile + warmup
    refined.block_until_ready()
    # Throughput: pipeline ITERS dispatches, block once at the end (the
    # per-call sync round-trip through the device tunnel would otherwise
    # dominate; the production pipeline overlaps host packing with device
    # execution the same way).
    t0 = time.perf_counter()
    for _ in range(ITERS):
        refined = run()
    refined.block_until_ready()
    dt = time.perf_counter() - t0
    return (B * ITERS) / dt, np.asarray(refined)


def bench_baseline(work):
    from svtrek_tpu.native.bamlib import load_library
    import ctypes as ct

    lib = load_library()
    if lib is None:
        return None, None
    ops, lens, pos, n_ops, wid, kind, istart, iend, ipos = work
    # Slice per-window packed views once (not timed).
    views = []
    for b in range(B):
        sel = np.nonzero(wid == b)[0]
        rp = pos[sel].astype(np.int64)
        nn = n_ops[sel].astype(np.int32)
        flat_ops = np.concatenate([ops[i, : n_ops[i]] for i in sel]).astype(np.uint8)
        flat_lens = np.concatenate([lens[i, : n_ops[i]] for i in sel]).astype(np.int32)
        off = np.concatenate([[0], np.cumsum(nn)[:-1]]).astype(np.int64)
        views.append((int(kind[b]), rp, nn, off, flat_ops, flat_lens,
                      int(istart[b]), int(iend[b]), int(ipos[b])))

    out = np.zeros(B, np.int64)
    reps = max(1, ITERS // 10)
    t0 = time.perf_counter()
    for _ in range(reps):
        for b, (kd, rp, nn, off, fo, fl, s, e, p) in enumerate(views):
            out[b] = lib.svbaseline_refine(
                kd,
                rp.ctypes.data_as(ct.POINTER(ct.c_int64)),
                nn.ctypes.data_as(ct.POINTER(ct.c_int32)),
                off.ctypes.data_as(ct.POINTER(ct.c_int64)),
                fo.ctypes.data_as(ct.POINTER(ct.c_uint8)),
                fl.ctypes.data_as(ct.POINTER(ct.c_int32)),
                len(rp), s, e, p, 3, 5, 500,
            )
    dt = time.perf_counter() - t0
    return (B * reps) / dt, out


def main():
    work = make_workload()
    dev_rate, dev_refined = bench_device(work)
    base_rate, base_refined = bench_baseline(work)

    if base_refined is not None:
        mism = int(np.sum(dev_refined.astype(np.int64) != base_refined))
        if mism:
            print(f"[bench] WARNING: {mism}/{B} device/baseline mismatches",
                  file=sys.stderr)

    if base_rate:
        vs = dev_rate / (base_rate * REF_THREADS)
    else:
        vs = 0.0
    print(json.dumps({
        "metric": "breakpoints_refined_per_sec",
        "value": round(dev_rate, 1),
        "unit": "breakpoints/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
