#!/usr/bin/env python
"""Measure the fixed per-grid-step overhead of a Pallas kernel on this
backend (the diagnostic that motivated the R-rows-per-step form of the
POA kernels, ops/poa_pallas.py::_rows_per_step).

A trivial kernel reduces one [rows_per, B, WP] int8 block per grid step
into a [B, 128] accumulator; sweeping rows_per while holding total
bytes/work constant isolates the per-step cost (DMA turnaround + loop
overhead).  Measured on the axon-tunneled v5e chip 2026-08-21:
~1.9 us/row at rows_per=1 collapsing to ~0.06-0.1 us/row at
rows_per=4-8 — per-step overhead, not compute, bounded the kernels.

Timing is dependency-chained slope (bench._chained_seconds_per_call):
plain repeat loops measure this backend's result memoization instead
of the hardware.

Usage: python tools/pallas_step_overhead.py [N B WP]
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import UNREACHABLE, _chained_seconds_per_call

    N, B, WP = (int(x) for x in (sys.argv[1:4] or (1280, 256, 256)))

    @functools.partial(jax.jit, static_argnames=("rows_per",))
    def run(ptr, rows_per=1):
        def k(in_ref, o_ref):
            gi = pl.program_id(0)

            @pl.when(gi == 0)
            def _():
                o_ref[:, :] = jnp.zeros_like(o_ref)

            acc = jnp.zeros((B, 1), jnp.int32)
            for r in range(rows_per):
                acc = acc + jnp.sum(in_ref[r, :, :].astype(jnp.int32),
                                    axis=1, keepdims=True)
            o_ref[:, 0:1] = o_ref[:, 0:1] + acc

        return pl.pallas_call(
            k, grid=(N // rows_per,),
            in_specs=[pl.BlockSpec((rows_per, B, WP),
                                   lambda gi: (gi, 0, 0))],
            out_specs=pl.BlockSpec((B, 128), lambda gi: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(ptr)

    ptr = jax.device_put(
        np.random.default_rng(0).integers(0, 3, (N, B, WP)).astype(np.int8))
    for rp in (1, 2, 4, 8):
        if N % rp:
            continue

        @jax.jit
        def chained(iters, ptr, rp=rp):
            def body(_, carry):
                p, acc = carry
                o = run(p, rows_per=rp)
                dep = (o[:1, :1] == jnp.int32(UNREACHABLE)).astype(jnp.int8)
                return p + dep, acc + o.sum()

            _, acc = jax.lax.fori_loop(0, iters, body, (ptr, jnp.int32(0)))
            return acc

        dt, lin = _chained_seconds_per_call(
            lambda iters: (lambda: chained(iters, ptr)))
        print(f"rows_per {rp}: {dt * 1e3:.3f} ms/call "
              f"({dt * 1e6 / N:.2f} us/row)  linearity {lin:.2f}")


if __name__ == "__main__":
    main()
