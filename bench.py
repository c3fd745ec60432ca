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

B = 1024            # windows per batch
READS_PER_WIN = 24  # supporting + noise reads per window
O = 128             # padded CIGAR ops per read
K = 64              # candidate capacity per window (overflow → host fallback)
ITERS = 30
REF_THREADS = 4     # reference default thread count (params.h:36)


def make_workload(seed=0):
    rng = np.random.default_rng(seed)
    N = B * READS_PER_WIN
    ops = np.full((N, O), 9, np.int8)
    lens = np.zeros((N, O), np.int32)
    pos = np.zeros(N, np.int64)
    n_ops = np.zeros(N, np.int32)
    wid = np.zeros(N, np.int32)
    kind = np.zeros(B, np.int32)
    istart = np.zeros(B, np.int64)
    iend = np.zeros(B, np.int64)
    ipos = np.zeros(B, np.int64)

    r = 0
    for b in range(B):
        base = int(rng.integers(100_000, 50_000_000))
        kind[b] = int(rng.integers(0, 3))  # DEL_START / DEL_END / INS
        istart[b] = base - 2000
        iend[b] = base + 2000
        ipos[b] = base + int(rng.integers(-40, 40))
        for j in range(READS_PER_WIN):
            start = base - int(rng.integers(1_000, 12_000))
            cig = []
            if rng.random() < 0.3:
                cig.append((4, int(rng.integers(20, 300))))
            lead = base - start + int(rng.integers(-3, 4))
            cig.append((0, max(lead, 1)))
            if j < 10:  # supporting reads
                svop = 1 if kind[b] == 2 else 2
                cig.append((svop, int(rng.integers(55, 90))))
            # noisy mid ops
            for _ in range(int(rng.integers(8, O - 12))):
                t = rng.integers(0, 4)
                if t == 0:
                    cig.append((0, int(rng.integers(1, 300))))
                elif t == 1:
                    cig.append((1, int(rng.integers(1, 45))))
                elif t == 2:
                    cig.append((2, int(rng.integers(1, 45))))
                else:
                    cig.append((0, int(rng.integers(1, 50))))
                if len(cig) >= O - 1:
                    break
            if rng.random() < 0.3:
                cig.append((4, int(rng.integers(20, 300))))
            cig = cig[:O]
            arr = np.asarray(cig, np.int64)
            ops[r, : len(cig)] = arr[:, 0]
            lens[r, : len(cig)] = arr[:, 1].astype(np.int32)
            pos[r] = start
            n_ops[r] = len(cig)
            wid[r] = b
            r += 1
    return ops, lens, pos, n_ops, wid, kind, istart, iend, ipos


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
