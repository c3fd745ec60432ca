"""Pallas banded-DP row scan for the POA consensus kernel.

The XLA formulation (ops/poa_batch.py::_dp_one) runs one ``lax.scan``
step per query row; measured with dependency-chained timing the scan
spends ~100x the VPU roofline per step — per-step loop overhead, not
compute, bounds it (the row update is only [B, 2W+1] int32 work).  This
kernel runs the SAME recurrence as a ``pallas_call`` grid over
(batch-tile, query-row): grid steps are hardware loop iterations, the
band row lives in a VMEM scratch across steps, and each step writes one
int8 pointer row for the (unchanged, XLA) traceback scan.

Semantics are bit-identical to ``_dp_one`` by construction: identical
score algebra (int32, NEG band-invalid cells), identical tie-breaking
(diag ≥ up; strict ``left > cand`` preference), and the same
exclusive-cummax realization of the in-row left-gap recurrence (a
shift-max ladder here — max is associative, so the result is equal).
Property-tested against the XLA path in tests/test_poa_pallas.py.

Reference context: the reference builds abPOA but never calls it
(SURVEY.md §2.14, /root/reference/.gitmodules:5-7); this DP is the
framework-defined consensus kernel (BASELINE.json north star: "banded
DP ... as the inner loop").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .poa import GAP, MATCH, MISMATCH

NEG = -(1 << 28)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _rows_per_step(N: int, cap: int = 8) -> int:
    """Query rows processed per grid step: a measured ~1.9 µs of fixed
    per-grid-step overhead (DMA/loop turnaround) dominated both POA
    kernels at one row per step; unrolling R rows in-kernel amortizes
    it ~R-fold.  Largest divisor of N up to `cap` (every production
    N bucket — pow2 below 512, multiples of 128 above — gives 8)."""
    r = cap
    while r > 1 and N % r:
        r //= 2
    return r


def _dp_rows_kernel(tbig_ref, q_ref, m_ref, band_ref, ptr_ref, row_ref,
                    *, W: int, WP: int, N: int, R: int = 1):
    """One grid step: query rows i = gi*R + 1 .. gi*R + R for batch
    tile bt (R rows per step — a measured ~1.9 µs of per-grid-step
    overhead dominated the whole kernel at one row per step; the row
    recurrence stays sequential via the VMEM scratch, unrolled
    in-kernel).

    tbig_ref: [Bt, TP] int8 (target padded with 5s, W+1 lead)
    q_ref:    [Bt, NP] int8
    m_ref, band_ref: [Bt, 1] int32
    ptr_ref:  [R, Bt, WP] int8 output block (rows' pointers)
    row_ref:  [Bt, WP] int32 scratch (band row, persists across rows)

    Mosaic requires dynamic lane offsets to be 128-aligned, so the
    per-row target window [i, i+WP) is read as an aligned wide load at
    i0 = (i//128)*128 followed by a dynamic pltpu.roll — the sanctioned
    unaligned-window idiom.  The wide-load width is a POWER OF TWO:
    dynamic rolls over non-power-of-two lane counts (e.g. 384)
    miscompute on real hardware (observed at W=64; 256/512 are fine).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gi = pl.program_id(1)
    karr = jax.lax.broadcasted_iota(jnp.int32, (1, WP), 1)
    gapk = GAP * karr
    m = m_ref[:, :]          # [Bt, 1]
    band = band_ref[:, :]

    @pl.when(gi == 0)
    def _init():
        # Row 0: score[0, j] = GAP*j for 0 <= j <= min(m, band).
        j0 = karr - W
        row_ref[:, :] = jnp.where(
            (j0 >= 0) & (j0 <= jnp.minimum(m, band)), GAP * j0, NEG
        ).astype(jnp.int32)

    # (roll is 32-bit-only on this Mosaic; widen the int8 bases first)
    WPW = 128
    while WPW < WP + 128:
        WPW *= 2

    for r in range(R):
        i = gi * R + r + 1
        prev = row_ref[:, :]     # [Bt, WP]
        j = i + karr - W         # [1, WP] broadcasts over Bt
        i0 = pl.multiple_of((i // 128) * 128, 128)
        wide = tbig_ref[:, pl.ds(i0, WPW)].astype(jnp.int32)
        tb = pltpu.roll(wide, shift=-(i - i0), axis=1)[:, :WP]
        q0 = pl.multiple_of(((i - 1) // 128) * 128, 128)
        qwide = q_ref[:, pl.ds(q0, 128)].astype(jnp.int32)
        qi = pltpu.roll(qwide, shift=-(i - 1 - q0), axis=1)[:, :1]
        sub = jnp.where(tb == qi, MATCH, MISMATCH)
        diag = prev + sub
        up = jnp.concatenate(
            [prev[:, 1:], jnp.full((prev.shape[0], 1), NEG, prev.dtype)],
            axis=1) + GAP
        c = jnp.maximum(diag, up)
        # pointers stay int32 in-kernel (int8 selects force an i1
        # relayout Mosaic rejects); the store narrows once at the end
        pc = jnp.where(up > diag, jnp.int32(1), jnp.int32(0))  # tie→diag
        validj = (j >= 1) & (j <= m) & (jnp.abs(j - i) <= band)
        cand = jnp.where(validj, c, NEG)
        bmask = (j == 0) & (i <= band)
        cand = jnp.where(bmask, GAP * i, cand)
        pcand = jnp.where(bmask, jnp.int32(1), pc)
        # In-row left gaps: exclusive cummax of (cand - GAP*k) along
        # the band, as a shift-max ladder (max is associative → equal
        # to lax.cummax).
        g = cand - gapk
        d = 1
        while d < WP:
            shifted = jnp.concatenate(
                [jnp.full((g.shape[0], d), NEG, g.dtype), g[:, :-d]],
                axis=1)
            g = jnp.maximum(g, shifted)
            d *= 2
        pexc = jnp.concatenate(
            [jnp.full((g.shape[0], 1), NEG, g.dtype), g[:, :-1]], axis=1)
        left = pexc + gapk
        use_left = validj & (left > cand)
        row = jnp.where(use_left, left, cand)
        prow = jnp.where(use_left, jnp.int32(2), pcand)
        row = jnp.where(validj | bmask, row, NEG)
        row_ref[:, :] = row
        ptr_ref[r, :, :] = prow.astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("W", "N", "Bt", "interpret"))
def dp_ptr_pallas(tbig, q, ms, bands, *, W: int, N: int, Bt: int = 256,
                  interpret: bool = False):
    """Pointer tensor [N, B, WP] int8 for the banded DP, Pallas path.

    tbig: [B, TP] int8 — target padded as in _dp_one (W+1 lead of 5s)
          AND tail-padded so i + WP never reads past TP (the XLA path
          leans on dynamic_slice clamping; here the wrapper pads).
    q:    [B, NP] int8, NP >= N.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = tbig.shape[0]
    WP = _round_up(2 * W + 1, 128)
    nbt = (B + Bt - 1) // Bt
    assert B % Bt == 0 or nbt == 1, (B, Bt)
    if nbt == 1:
        Bt = B
    R = _rows_per_step(N)
    grid = (nbt, N // R)
    kernel = functools.partial(_dp_rows_kernel, W=W, WP=WP, N=N, R=R)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bt, tbig.shape[1]), lambda bt, gi: (bt, 0)),
            pl.BlockSpec((Bt, q.shape[1]), lambda bt, gi: (bt, 0)),
            pl.BlockSpec((Bt, 1), lambda bt, gi: (bt, 0)),
            pl.BlockSpec((Bt, 1), lambda bt, gi: (bt, 0)),
        ],
        out_specs=pl.BlockSpec((R, Bt, WP), lambda bt, gi: (gi, bt, 0)),
        out_shape=jax.ShapeDtypeStruct((N, B, WP), jnp.int8),
        scratch_shapes=[pltpu.VMEM((Bt, WP), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ) if not interpret else None,
        interpret=interpret,
    )(tbig, q, ms.reshape(B, 1), bands.reshape(B, 1))


def _tb_rows_kernel(ptr_ref, m_ref, n_ref, cols_ref, ins_ref, k_ref,
                    *, W: int, WP: int, MP: int, MP2: int, N: int,
                    R: int = 1):
    """Pallas traceback, reverse-ROW-sweep formulation: one grid step
    processes R consecutive query rows (descending from
    i = N - gi*R) for a whole batch tile at once — the same
    per-grid-step overhead amortization as the DP kernel
    (_rows_per_step).

    The naive walk is N+M sequential steps PER PAIR (a first attempt
    that walked one pair per grid step serialized B×(N+M) tiny steps
    and its compile wedged this environment's remote Mosaic service —
    round 4).  Key identity: collapsing each row's left-gap RUN into
    one jump, every pair descends exactly one query row per super-step
    (both diag and up decrement i), so all pairs advance in lock-step
    through the SAME row index and the batch stays vectorized across
    sublanes:

      eff[k]  = 1 if j(k) == 0 else ptr_row[k]      (forced-up rule)
      k*      = last k' <= k with eff[k'] != 2       (left-run collapse,
                exclusive-cummax as a shift-max ladder, like the DP)
      p* == 0 → cols[j*-1] = i-1, k stays (diag);  p* == 1 → ins[j*] += 1,
                k += 1 (up).

    Left moves emit nothing (cols init -1, ins 0) and row 0 is all left
    moves, so the sweep stops after row 1 — nothing to post-process.
    cols holds the aligned QUERY INDEX per target column (-1 = gap);
    the caller resolves indices to bases with one take outside.
    Semantics are bit-identical to _traceback_one by construction
    (property-tested in tests/test_poa_pallas.py).

    ptr_ref: [R, Bt, WP] int8 (pointer rows; block bi = NB-1-gi covers
    query rows bi*R+1 .. bi*R+R, processed descending); m/n_ref:
    [Bt, 1] int32; cols_ref [Bt, MP] / ins_ref [Bt, MP2] int32 outputs
    double as the across-rows accumulators (their block index is
    grid-invariant, so they live in VMEM for the whole sweep); k_ref:
    [Bt, 128] int32 scratch, col 0 carries each pair's band coordinate
    k = j - i + W.
    """
    from jax.experimental import pallas as pl

    gi = pl.program_id(1)
    bi = (N // R) - 1 - gi               # ptr block index
    karr = jax.lax.broadcasted_iota(jnp.int32, (1, WP), 1)
    mio = jax.lax.broadcasted_iota(jnp.int32, (1, MP), 1)
    m2io = jax.lax.broadcasted_iota(jnp.int32, (1, MP2), 1)
    m = m_ref[:, :]                      # [Bt, 1]
    n = n_ref[:, :]

    @pl.when(gi == 0)
    def _init():
        cols_ref[:, :] = jnp.full((m.shape[0], MP), -1, jnp.int32)
        ins_ref[:, :] = jnp.zeros((m.shape[0], MP2), jnp.int32)
        k_ref[:, :] = jnp.zeros((m.shape[0], 128), jnp.int32)

    WIN = 256
    while WIN < 2 * W + 129:
        WIN *= 2

    for r in range(R - 1, -1, -1):       # rows descend within the block
        i = bi * R + r + 1
        active = n >= i                  # pair's walk has reached row i
        k_cur = k_ref[:, 0:1]
        # Activation: the walk starts at (i=n, j=m) → k = m - n + W.
        k_cur = jnp.where(n == i, m - n + W, k_cur)

        row = ptr_ref[r, :, :].astype(jnp.int32)   # [Bt, WP]
        j_of_k = karr - W + i                      # [1, WP]
        eff = jnp.where(j_of_k == 0, jnp.int32(1), row)
        # Left-run collapse: k* = max{k' <= k : eff[k'] != 2} via an
        # inclusive cummax shift-max ladder (max is associative).
        g = jnp.where(eff != 2, karr, jnp.int32(-1))
        d = 1
        while d < WP:
            shifted = jnp.concatenate(
                [jnp.full((g.shape[0], d), -1, g.dtype), g[:, :-d]],
                axis=1)
            g = jnp.maximum(g, shifted)
            d *= 2
        kstar = jnp.sum(jnp.where(karr == k_cur, g, 0), axis=1,
                        keepdims=True)
        kstar = jnp.maximum(kstar, 0)    # inactive/garbage guard
        pstar = jnp.sum(jnp.where(karr == kstar, eff, 0), axis=1,
                        keepdims=True)
        jstar = kstar - W + i
        dg = active & (pstar == 0)
        up = active & (pstar == 1)
        jclip = jnp.clip(jstar, 0, MP2 - 1)  # walk keeps j <= m <= M
        # Row i's emissions land within the band: j* in [i-band,
        # i+band] (+ the j==0 boundary, reachable only when i <= band).
        # Updating a 128-aligned window of width WIN >= 2W+129 around i
        # instead of the full [Bt, MP]/[Bt, MP2] rows cuts per-row work.
        if WIN < MP:
            base = (jnp.maximum(i - W - 1, 0) // 128) * 128
            i0c = pl.multiple_of(jnp.clip(base, 0, MP - WIN), 128)
            wio = jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1)
            cs = cols_ref[:, pl.ds(i0c, WIN)]
            cols_ref[:, pl.ds(i0c, WIN)] = jnp.where(
                (wio + i0c == jstar - 1) & dg, i - 1, cs)
            i0i = pl.multiple_of(jnp.clip(base, 0, MP2 - WIN), 128)
            isl = ins_ref[:, pl.ds(i0i, WIN)]
            ins_ref[:, pl.ds(i0i, WIN)] = isl + jnp.where(
                (wio + i0i == jclip) & up, 1, 0)
        else:
            cols_ref[:, :] = jnp.where((mio == jstar - 1) & dg, i - 1,
                                       cols_ref[:, :])
            ins_ref[:, :] = ins_ref[:, :] + jnp.where(
                (m2io == jclip) & up, 1, 0)
        k_next = jnp.where(up, kstar + 1, kstar)
        k_ref[:, 0:1] = jnp.where(active, k_next, k_cur)


@functools.partial(jax.jit, static_argnames=("W", "M", "Bt", "interpret"))
def tb_batch_pallas(ptr, qpad, ms, ns, *, W: int, M: int, Bt: int = 256,
                    interpret: bool = False):
    """Batched traceback over the DP pointer tensor, all-Pallas path.

    ptr: [N, B, WP] int8 (dp_ptr_pallas output, rows already batch-
    major — consumed directly, no transpose/widen glue).  Returns
    (cols [B, M] int8 query bases, ins [B, M+1] int32 counts) —
    identical to the XLA _traceback_one path."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, B, WP = ptr.shape
    MP = _round_up(M, 128)
    MP2 = _round_up(M + 2, 128)
    nbt = (B + Bt - 1) // Bt
    assert B % Bt == 0 or nbt == 1, (B, Bt)
    if nbt == 1:
        Bt = B
    R = _rows_per_step(N)
    NB = N // R
    kernel = functools.partial(
        _tb_rows_kernel, W=W, WP=WP, MP=MP, MP2=MP2, N=N, R=R)
    cols_i, ins_p = pl.pallas_call(
        kernel,
        grid=(nbt, NB),
        in_specs=[
            pl.BlockSpec((R, Bt, WP), lambda bt, gi: (NB - 1 - gi, bt, 0)),
            pl.BlockSpec((Bt, 1), lambda bt, gi: (bt, 0)),
            pl.BlockSpec((Bt, 1), lambda bt, gi: (bt, 0)),
        ],
        out_specs=[
            pl.BlockSpec((Bt, MP), lambda bt, gi: (bt, 0)),
            pl.BlockSpec((Bt, MP2), lambda bt, gi: (bt, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, MP), jnp.int32),
            jax.ShapeDtypeStruct((B, MP2), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((Bt, 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ) if not interpret else None,
        interpret=interpret,
    )(ptr, ms.reshape(B, 1), ns.reshape(B, 1))
    # Resolve query indices to bases (one gather), clip padding.
    qi = jnp.clip(cols_i[:, :M], 0, qpad.shape[1] - 1)
    bases = jnp.take_along_axis(qpad, qi, axis=1)
    cols = jnp.where(cols_i[:, :M] >= 0, bases, jnp.int8(-1)).astype(jnp.int8)
    return cols, ins_p[:, : M + 1]


def _traceback_one(ptr_b, q, m, n, *, W: int, M: int, N: int,
                   unroll: int = 8):
    """XLA traceback over one pair's pointer rows (ptr_b: [N, WP] int8)
    — same semantics as ops/poa_batch._dp_one's tb_step, restructured
    SCATTER-FREE: the sequential walk only updates (i, j) and emits one
    (col, qidx, ins-bucket) record per step as scan outputs; the cols
    and ins arrays are built afterwards with ONE vectorized scatter
    each.  The original in-loop `.at[].set/.add` pair cost ~30x the
    whole Pallas DP per call on hardware; a record emit is free.  Each
    real target column is written by at most one step (the walk visits
    each (i,j) once), so the post-hoc scatter is conflict-free; masked
    steps dump into a trailing slot that is sliced away."""
    WP = ptr_b.shape[1]
    ptr_flat = ptr_b.reshape(-1)  # 1D gather lowers cheaper than 2D

    def tb_step(carry, _):
        i, j = carry
        active = (i > 0) | (j > 0)
        k = jnp.clip(j - i + W, 0, 2 * W)
        p = ptr_flat[jnp.maximum(i - 1, 0) * WP + k]
        p = jnp.where(i == 0, jnp.int8(2), p)
        p = jnp.where((j == 0) & (i > 0), jnp.int8(1), p)
        dg = active & (i > 0) & (j > 0) & (p == 0)
        up_ = active & ~dg & (i > 0) & (p == 1)
        lf = active & ~dg & ~up_
        rec_col = jnp.where(dg, j - 1, M)            # M = dump slot
        rec_qi = jnp.where(dg, i - 1, 0)
        rec_ins = jnp.where(up_, jnp.clip(j, 0, M), M + 1)
        i = i - (dg | up_).astype(i.dtype)
        j = j - (dg | lf).astype(j.dtype)
        return (i, j), (rec_col, rec_qi, rec_ins)

    (_, _), (rc, rqi, ri) = jax.lax.scan(
        tb_step, (n, m), None, length=N + M, unroll=unroll)
    cols_idx = jnp.full((M + 1,), -1, jnp.int32).at[rc].set(rqi)[:M]
    qv = q[jnp.clip(cols_idx, 0, q.shape[0] - 1)]
    cols = jnp.where(cols_idx >= 0, qv, jnp.int8(-1)).astype(jnp.int8)
    ins = jnp.zeros((M + 2,), jnp.int32).at[ri].add(1)[: M + 1]
    return cols, ins


def _tb_impl_default() -> str:
    """NOTE: resolved at TRACE time (tb is a static jit arg), so the
    SVTREK_POA_TB override must be set before the first call of a given
    shape — already-compiled executables keep their traceback impl."""
    import os

    force = os.environ.get("SVTREK_POA_TB", "")
    if force in ("pallas", "xla"):
        return force
    return "pallas"


@functools.partial(jax.jit, static_argnames=("W", "tb", "interpret"))
def dp_cols_batch_pallas(tpad, ms, qpad, ns, bands, *, W,
                         tb: str | None = None,
                         interpret: bool = False):
    """Drop-in for ops/poa_batch._dp_cols_batch (same inputs/outputs),
    all-Pallas: the row scan AND the reverse-row-sweep traceback run as
    Mosaic kernels (tb="xla" falls back to the scatter-free XLA walk;
    SVTREK_POA_TB overrides the default)."""
    B0, M = tpad.shape
    # The DP grid tiles the batch by Bt=256; pad arbitrary batch sizes
    # up to a tile multiple with zero-length pairs (m=n=0 rows cost one
    # all-masked lane block) and slice the outputs back (ADVICE r4: an
    # unpadded B=300 tripped the kernel's divisibility assert at trace
    # time and latched the whole process onto the slow path).
    Bt = 256
    B = B0 if B0 <= Bt else _round_up(B0, Bt)
    if B != B0:
        pad = B - B0
        tpad = jnp.pad(tpad, ((0, pad), (0, 0)), constant_values=5)
        qpad = jnp.pad(qpad, ((0, pad), (0, 0)), constant_values=5)
        ms = jnp.pad(ms, (0, pad))
        ns = jnp.pad(ns, (0, pad))
        bands = jnp.pad(bands, (0, pad))
    N = qpad.shape[1]
    WP = _round_up(2 * W + 1, 128)
    # Target padded: W+1 lead of 5s (as _dp_one), then tail-padded so
    # the kernel's aligned pow2-wide load [i0, i0 + WPW) at i <= N
    # stays in bounds.
    WPW = 128
    while WPW < WP + 128:
        WPW *= 2
    TP = _round_up(max(M + 2 * W + 2, N + WPW + 1), 128)
    tbig = jnp.full((B, TP), jnp.int8(5))
    tbig = jax.lax.dynamic_update_slice(tbig, tpad, (0, W + 1))
    # q padded so the aligned 128-wide load at q0 <= N-1 stays in
    # bounds.
    NPP = _round_up(N, 128) + 128
    qbig = jnp.full((B, NPP), jnp.int8(5))
    qbig = jax.lax.dynamic_update_slice(qbig, qpad, (0, 0))
    ptr = dp_ptr_pallas(tbig, qbig, ms, bands, W=W, N=N,
                        Bt=min(B, 256), interpret=interpret)
    if (tb or _tb_impl_default()) == "pallas":
        # All-Pallas traceback: the reverse-row-sweep kernel consumes
        # ptr [N, B, WP] directly (no transpose glue) and replaces the
        # XLA walk's ~(N+M) dispatch-bound scan steps with N hardware
        # grid steps of batched vector work.
        cols, ins = tb_batch_pallas(ptr, qpad, ms, ns, W=W, M=M,
                                    Bt=min(B, 256), interpret=interpret)
    else:
        # Scatter-free XLA walk (vmap over batch axis 1) — the CPU
        # fallback and the SVTREK_POA_TB=xla escape hatch.
        cols, ins = jax.vmap(
            functools.partial(_traceback_one, W=W, M=M, N=N),
            in_axes=(1, 0, 0, 0),
        )(ptr, qpad, ms, ns)
    return cols[:B0], ins[:B0]
