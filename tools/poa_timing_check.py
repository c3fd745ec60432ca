#!/usr/bin/env python
"""Timing-methodology cross-check for the POA DP kernel.

Motivation: bench_poa times ITERS async-dispatched calls and divides by
ITERS.  If the backend (or an accelerator tunnel) overlaps or elides
repeated identical executions, that method overstates throughput.  This
tool measures the same kernel three ways:

  loop-async    — bench_poa's method (dispatch N, block on the last)
  loop-blocked  — block_until_ready after EVERY call (adds one host
                  round-trip per call; a lower bound on per-call wall)
  chained-scan  — ONE compiled program running the DP body S times in a
                  lax.scan with a data dependency between iterations
                  (impossible to overlap or elide; amortizes dispatch)

The chained-scan number is the defensible one; loop-async matching it
validates bench_poa's method on this backend.

Usage: python tools/poa_timing_check.py [B] [M] [ITERS]
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from svtrek_tpu.ops.poa import encode
    from svtrek_tpu.ops.poa_batch import _dp_cols_batch, _dp_one, _pow2

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    BAND = 64
    BASES = "ACGT"
    rng = np.random.default_rng(0)

    def mutate(seq, sub=0.05, ins=0.02, dele=0.02):
        out = []
        for c in seq:
            r = rng.random()
            if r < dele:
                continue
            out.append(BASES[rng.integers(4)] if r < dele + sub else c)
            if rng.random() < ins:
                out.append(BASES[rng.integers(4)])
        return "".join(out)

    targets, queries = [], []
    for _ in range(B):
        t = "".join(BASES[i] for i in rng.integers(0, 4, M))
        targets.append(encode(t))
        queries.append(encode(mutate(t)))
    Mp = _pow2(max(len(t) for t in targets), 16)
    Np = _pow2(max(len(q) for q in queries), 16)
    bands = np.array([max(BAND, abs(len(q) - len(t)) + 1)
                      for t, q in zip(targets, queries)], np.int32)
    W = _pow2(int(bands.max()), 16)
    tpad = np.full((B, Mp), 5, np.int8)
    qpad = np.full((B, Np), 5, np.int8)
    ms = np.array([len(t) for t in targets], np.int32)
    ns = np.array([len(q) for q in queries], np.int32)
    for i in range(B):
        tpad[i, : ms[i]] = targets[i]
        qpad[i, : ns[i]] = queries[i]
    args = [jax.device_put(x) for x in (tpad, ms, qpad, ns, bands)]
    eff_cells = int((ns.astype(np.int64) * (2 * bands + 1)).sum())
    print(f"backend={jax.devices()[0].platform} B={B} M={M} W={W} "
          f"eff_cells/call={eff_cells:.3e} iters={ITERS}")

    r = _dp_cols_batch(*args, W=W)
    jax.block_until_ready(r)

    # 1. loop-async (bench_poa's method)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            r = _dp_cols_batch(*args, W=W)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    print(f"loop-async   : {best/ITERS*1e3:8.3f} ms/call  "
          f"{eff_cells/(best/ITERS):.3e} cells/s")

    # 2. loop-blocked
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            jax.block_until_ready(_dp_cols_batch(*args, W=W))
        best = min(best, time.perf_counter() - t0)
    print(f"loop-blocked : {best/ITERS*1e3:8.3f} ms/call  "
          f"{eff_cells/(best/ITERS):.3e} cells/s")

    # 3. chained-scan: S sequential DPs inside one program, with the
    # output fed (as a provably-zero but data-dependent term) into the
    # next iteration's target so nothing can overlap or be elided.
    @functools.partial(jax.jit, static_argnames=("W", "iters"))
    def chained(tpad, ms, qpad, ns, bands, *, W, iters):
        def body(tp, _):
            cols, ins = jax.vmap(functools.partial(_dp_one, W=W))(
                tp, ms, qpad, ns, bands)
            # min(ins,0) is always 0 for real counts, but the compiler
            # cannot prove it: a genuine data dependency.
            dep = jnp.minimum(ins[:, :1], 0).astype(jnp.int8)
            return tp + dep, cols[:, 0]
        tp_final, outs = jax.lax.scan(body, tpad, None, length=iters)
        return tp_final, outs

    r = chained(*args, W=W, iters=ITERS)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = chained(*args, W=W, iters=ITERS)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    print(f"chained-scan : {best/ITERS*1e3:8.3f} ms/call  "
          f"{eff_cells/(best/ITERS):.3e} cells/s")


if __name__ == "__main__":
    main()
