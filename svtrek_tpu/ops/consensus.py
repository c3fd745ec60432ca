"""Vectorized position-clustering consensus (TPU-native).

Re-derives the reference's ``consensus_pos`` (refinement.c:41-101) as a
batched, fixed-shape XLA program, bit-identical to the scalar oracle
(`svtrek_tpu.oracle.refine.consensus_pos`):

Key re-formulations (SURVEY.md §7, design translation 1):
- The C inner cluster loops walk contiguous neighbor runs of a *sorted*
  array; each anchor's cluster is a [searchsorted bound, anchor] run, so
  cluster counts and means become searchsorted + prefix sums — fully
  parallel over anchors and over the batch.
- The C accumulates cluster totals in uint64 (refinement.c:59).  On TPU
  int64 is emulated and slow, so the kernel computes the cluster mean
  int32-only: cluster values lie within ``interval`` of the anchor L, so
  total = count·L − S with S = Σ(L − value) small; S is recovered
  exactly from *wrapping* int32 prefix sums (the true S always fits),
  and candidate = L + floor((count/2 − S)/count) reproduces the C
  division exactly.
- The C outer sweeps carry a running (max_count, best_distance) state
  with a data-dependent early return — an inherently sequential fold,
  run as a `lax.scan` whose every step is elementwise over the whole
  batch.  The sweep is bounded by ``sweep_width`` steps: the C loop only
  visits anchors within ``consensus_interval_range`` of pos, which is a
  contiguous index window in the sorted array; windows with more
  in-range anchors than sweep_width are flagged for host fallback
  (exactness is never silently lost).

Inputs are padded to a static candidate capacity K with INT32_MAX
sentinels; rows are independent windows (one refine_* task each).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import constants as C

_I32_BIG = jnp.int32(0x7FFFFFFF)  # C int distance sentinel (refinement.c:49)


def _row_searchsorted(rows: jnp.ndarray, queries: jnp.ndarray, side: str) -> jnp.ndarray:
    """Rowwise searchsorted, batched over rows AND queries.

    An explicit vectorized binary search: ceil(log2(K)) unrolled steps,
    each one [B, Q] gather + compare.  An order of magnitude cheaper on
    TPU than jnp.searchsorted's sort method (bitonic sort of width Q+K
    per row) and, unlike a broadcast-compare count ([B, Q, K] → sum),
    stays cheap at large K (the grouping capacity can reach 8192).
    """
    B, K = rows.shape
    steps = max(1, K.bit_length())  # search space is [0, K]: K+1 values
    lo = jnp.zeros(queries.shape, jnp.int32)          # count of elems "before"
    hi = jnp.full(queries.shape, K, jnp.int32)
    for _ in range(steps):
        mid = (lo + hi) >> 1
        v = jnp.take_along_axis(rows, mid, axis=1)
        before = (v < queries) if side == "left" else (v <= queries)
        lo = jnp.where(before, mid + 1, lo)
        hi = jnp.where(before, hi, mid)
    return lo


def _cluster_stats(locs: jnp.ndarray, n: jnp.ndarray, interval: int):
    """Cluster count/mean for every anchor, both sweep directions.

    locs: [B, K] int32 sorted ascending, INT32_MAX padding; n: [B].
    Returns (cand_left, count_left, cand_right, count_right), each [B, K].

    Left cluster at anchor i  = {j <= i : locs[i] - locs[j] <= interval}
    (refinement.c:61-64); right cluster at anchor i =
    {j >= i : locs[j] - locs[i] <= interval} (refinement.c:83-86); both
    are contiguous runs of the sorted row.  candidate reproduces
    floor((total + count/2)/count) with uint64 total via the int32
    wrap-safe delta-sum formulation (see module docstring).
    """
    B, K = locs.shape
    # Wrapping int32 prefix sums: differences recover small true sums.
    zero = jnp.zeros((B, 1), jnp.int32)
    masked = jnp.where(locs >= _I32_BIG, 0, locs)
    prefix = jnp.concatenate([zero, jnp.cumsum(masked, axis=1, dtype=jnp.int32)], axis=1)

    idx = jnp.arange(K, dtype=jnp.int32)[None, :]
    # queries clamp: values near INT32_MAX are padding; their stats are
    # never used (anchors are restricted to < n).
    q_lo = jnp.where(locs >= _I32_BIG - interval, locs, locs - interval)
    q_hi = jnp.where(locs >= _I32_BIG - interval, locs, locs + interval)

    first = _row_searchsorted(locs, q_lo, "left").astype(jnp.int32)
    count_l = idx - first + 1
    # S = count*L − Σ values  (true value small, exact under int32 wrap)
    sum_l = jnp.take_along_axis(prefix, idx + 1, axis=1) - \
        jnp.take_along_axis(prefix, first, axis=1)
    s_l = count_l * locs - sum_l
    cand_l = locs + (count_l // 2 - s_l) // jnp.maximum(count_l, 1)

    last = _row_searchsorted(locs, q_hi, "right").astype(jnp.int32) - 1
    last = jnp.minimum(last, jnp.maximum(n[:, None] - 1, 0))
    count_r = last - idx + 1
    sum_r = jnp.take_along_axis(prefix, last + 1, axis=1) - \
        jnp.take_along_axis(prefix, idx, axis=1)
    s_r = sum_r - count_r * locs
    count_r_safe = jnp.maximum(count_r, 1)
    cand_r = locs + (s_r + count_r_safe // 2) // count_r_safe

    return cand_l, count_l, cand_r, count_r


def _sweep(anchor_idx, active, cand, count, pos, min_count: int, interval: int,
           allow: jnp.ndarray):
    """One consensus sweep (left or right) as a batched sequential fold
    (refinement.c:58-76 / 80-98). anchor_idx/active: [B, W]."""
    B, W = anchor_idx.shape

    cand_at = jnp.take_along_axis(cand, anchor_idx, axis=1)     # [B, W]
    count_at = jnp.take_along_axis(count, anchor_idx, axis=1)
    dist_at = jnp.abs(pos[:, None] - cand_at)

    def body(carry, xs):
        max_count, best_dist, best_val, returned, ret_val = carry
        step_active, c_k, n_k, d_k = xs
        live = step_active & allow & (~returned)
        bigger = live & (n_k > max_count)
        ret_now = bigger & (d_k < interval)
        upd = bigger & (~ret_now) & (d_k < best_dist)

        returned = returned | ret_now
        ret_val = jnp.where(ret_now, c_k, ret_val)
        max_count = jnp.where(upd, n_k, max_count)
        best_val = jnp.where(upd, c_k, best_val)
        best_dist = jnp.where(upd, d_k, best_dist)
        return (max_count, best_dist, best_val, returned, ret_val), None

    # Derive the carry init from `pos` (not fresh constants) so it
    # inherits the varying-manual-axes type under shard_map — fresh
    # constants would be unvarying and fail lax.scan's carry typecheck.
    z = pos * 0
    init = (
        z + (min_count - 1),
        z + _I32_BIG,
        z - 1,
        z != 0,
        z - 1,
    )
    xs = (active.T, cand_at.T, count_at.T, dist_at.T)
    # Moderate unroll: each step is a handful of elementwise [B] ops, so
    # the rolled loop is mostly per-iteration overhead; full unroll blows
    # up XLA compile time superlinearly at W>=64.
    (max_count, best_dist, best_val, returned, ret_val), _ = jax.lax.scan(
        body, init, xs, unroll=8
    )
    return returned, ret_val, best_val, best_dist


@functools.partial(
    jax.jit,
    static_argnames=("min_count", "interval", "range_", "sweep_width"),
)
def consensus_pos_batch(
    locs: jnp.ndarray,
    n: jnp.ndarray,
    pos: jnp.ndarray,
    *,
    min_count: int = C.CONSENSUS_MIN_COUNT,
    interval: int = C.CONSENSUS_INTERVAL,
    range_: int = C.CONSENSUS_INTERVAL_RANGE,
    sweep_width: int = 128,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched consensus_pos. Bit-identical to refinement.c:41-101 for
    windows without sweep overflow.

    locs: [B, K] int32, sorted ascending per row, INT32_MAX padding.
    n:    [B] int32 valid counts;  pos: [B] int32 imprecise positions.
    Returns (refined [B] int32 with -1 = NA,
             overflow [B] bool — sweep window exceeded; recompute those
             rows on the host for exactness).
    """
    B, K = locs.shape
    n = n.astype(jnp.int32)
    pos = pos.astype(jnp.int32)
    half = C.SV_MIN_LENGTH // 2
    W = min(sweep_width, K)

    cand_l, count_l, cand_r, count_r = _cluster_stats(locs, n, interval)

    k_idx = jnp.arange(W, dtype=jnp.int32)[None, :]

    # point = lower_bound(locs, pos + 25): last index <= query, clamped
    # (refinement.c:3-10, 56).
    sr = _row_searchsorted(locs, (pos + half)[:, None], "right")
    point_l = jnp.clip(sr[:, 0].astype(jnp.int32) - 1, 0, jnp.maximum(n - 1, 0))

    idx_l = point_l[:, None] - k_idx                        # descending walk
    in_bounds_l = idx_l >= 0
    idx_l_c = jnp.clip(idx_l, 0, K - 1)
    loc_at_l = jnp.take_along_axis(locs, idx_l_c, axis=1)
    ok_l = in_bounds_l & (jnp.abs(pos[:, None] - loc_at_l) < range_)
    active_l = jnp.cumsum(jnp.where(ok_l, 0, 1), axis=1) == 0  # cumulative AND

    allow_all = jnp.ones((B,), bool)
    ret_l, retv_l, best_l, dist_l = _sweep(
        idx_l_c, active_l, cand_l, count_l, pos, min_count, interval, allow_all
    )
    # Overflow: the sweep was still in-range at its last step AND more
    # anchors existed beyond the window.
    ovf_l = active_l[:, -1] & (point_l - (W - 1) > 0)

    # point = upper_bound(locs, pos - 25): 0 if locs[0] < query else size-1
    # (refinement.c:12-19, 78) — quirk mirrored.
    first_elem = locs[:, 0]
    point_r = jnp.where(
        first_elem < pos - half,
        jnp.zeros((B,), jnp.int32),
        jnp.maximum(n - 1, 0),
    )
    idx_r = point_r[:, None] + k_idx                        # ascending walk
    in_bounds_r = idx_r < n[:, None]
    idx_r_c = jnp.clip(idx_r, 0, K - 1)
    loc_at_r = jnp.take_along_axis(locs, idx_r_c, axis=1)
    ok_r = in_bounds_r & (jnp.abs(pos[:, None] - loc_at_r) < range_)
    active_r = jnp.cumsum(jnp.where(ok_r, 0, 1), axis=1) == 0

    ret_r, retv_r, best_r, dist_r = _sweep(
        idx_r_c, active_r, cand_r, count_r, pos, min_count, interval, ~ret_l
    )
    ovf_r = active_r[:, -1] & (point_r + (W - 1) < n - 1)

    # Final selection (refinement.c:100): left wins only on strictly
    # smaller distance.
    final = jnp.where(dist_l < dist_r, best_l, best_r)
    out = jnp.where(ret_l, retv_l, jnp.where(ret_r, retv_r, final))
    invalid = (n < min_count) | (n <= 0)
    out = jnp.where(invalid, jnp.int32(-1), out)
    overflow = (ovf_l | ovf_r) & (~invalid)
    return out, overflow


@functools.partial(jax.jit, static_argnames=("min_count", "interval"))
def consensus_lengths_batch(
    vals: jnp.ndarray,
    n: jnp.ndarray,
    *,
    min_count: int = C.CONSENSUS_MIN_COUNT,
    interval: int = C.CONSENSUS_INTERVAL,
) -> jnp.ndarray:
    """Batched global-max window consensus (refinement.c:21-39).

    vals: [B, K] int32 sorted ascending, INT32_MAX padding; n: [B] counts.
    The winner is the *first* anchor (ascending scan, strictly-greater
    updates; refinement.c:27-37) attaining the maximal count.
    """
    B, K = vals.shape
    idx = jnp.arange(K, dtype=jnp.int32)[None, :]
    q_hi = jnp.where(vals >= _I32_BIG - interval, vals, vals + interval)
    last = _row_searchsorted(vals, q_hi, "right").astype(jnp.int32) - 1
    last = jnp.minimum(last, jnp.maximum(n[:, None] - 1, 0))
    count = jnp.where(idx < n[:, None], last - idx + 1, 0)
    best = jnp.max(count, axis=1)
    first_best = jnp.argmax(count == best[:, None], axis=1)
    win = jnp.take_along_axis(vals, first_best[:, None].astype(jnp.int32), axis=1)[:, 0]
    ok = (best > (min_count - 1)) & (n > 0)
    return jnp.where(ok, win, jnp.int32(-1))
