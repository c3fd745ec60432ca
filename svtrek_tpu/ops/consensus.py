"""Vectorized position-clustering consensus (TPU-native).

Re-derives the reference's ``consensus_pos`` (refinement.c:41-101) as a
batched, fixed-shape XLA program, bit-identical to the scalar oracle
(`svtrek_tpu.oracle.refine.consensus_pos`):

Key re-formulation (SURVEY.md §7, design translation 1):
- The C inner cluster loops walk contiguous neighbor runs of a *sorted*
  array; on TPU each anchor's cluster is a [searchsorted bound, anchor]
  run, so cluster counts and sums become searchsorted + prefix-sum —
  fully parallel over anchors and over the batch.
- The C outer sweeps carry a running (max_count, best_distance) state with
  a data-dependent early return; that fold is inherently sequential, so it
  runs as a `lax.scan` whose every step is elementwise over the whole
  batch (the batch dimension is the vector dimension, the sweep dimension
  is the scan dimension).

Inputs are padded to a static candidate capacity K with INT32_MAX
sentinels; rows represent independent windows (one refine_* task each).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import constants as C

_I64_BIG = jnp.int64(0x7FFFFFFF)  # C int distance sentinel (refinement.c:49)


def _row_searchsorted(rows: jnp.ndarray, queries: jnp.ndarray, side: str) -> jnp.ndarray:
    """Per-row searchsorted: rows [B, K] sorted asc, queries [B, K]."""
    return jax.vmap(lambda r, q: jnp.searchsorted(r, q, side=side))(rows, queries)


def _cluster_stats(locs: jnp.ndarray, n: jnp.ndarray, interval: int):
    """Cluster count/mean for every anchor, both sweep directions.

    locs: [B, K] int32 sorted ascending, INT32_MAX padding.
    n:    [B] valid counts.
    Returns (cand_left, count_left, cand_right, count_right), each [B, K].

    Left cluster at anchor i  = {j <= i : locs[i] - locs[j] <= interval}
    (refinement.c:61-64); right cluster at anchor i =
    {j >= i : locs[j] - locs[i] <= interval} (refinement.c:83-86).  Both are
    contiguous runs because locs is sorted.  candidate = floor((total +
    count/2) / count) with a uint64 total (refinement.c:65, 87) — evidence
    values are non-negative in practice so int64 floor-division matches.
    """
    B, K = locs.shape
    locs64 = locs.astype(jnp.int64)
    prefix = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int64),
         jnp.cumsum(jnp.where(locs64 >= jnp.int64(C.I32_MAX), 0, locs64), axis=1)],
        axis=1,
    )  # [B, K+1]

    idx = jnp.arange(K, dtype=jnp.int32)[None, :]

    first = _row_searchsorted(locs64, locs64 - interval, "left").astype(jnp.int32)
    count_l = idx - first + 1
    total_l = jnp.take_along_axis(prefix, (idx + 1).astype(jnp.int32), axis=1) - \
        jnp.take_along_axis(prefix, first, axis=1)
    cand_l = (total_l + count_l.astype(jnp.int64) // 2) // count_l.astype(jnp.int64)

    last = _row_searchsorted(locs64, locs64 + interval, "right").astype(jnp.int32) - 1
    last = jnp.minimum(last, jnp.maximum(n[:, None] - 1, 0))
    count_r = last - idx + 1
    total_r = jnp.take_along_axis(prefix, last + 1, axis=1) - \
        jnp.take_along_axis(prefix, idx, axis=1)
    count_r_safe = jnp.maximum(count_r, 1)
    cand_r = (total_r + count_r_safe.astype(jnp.int64) // 2) // count_r_safe.astype(jnp.int64)

    return cand_l, count_l, cand_r, count_r


def _sweep(anchor_idx, active, cand, count, pos64, min_count: int, interval: int,
           allow: jnp.ndarray):
    """One consensus sweep (left or right) as a batched sequential fold.

    anchor_idx: [B, K] anchor index per sweep step (clamped for gather).
    active:     [B, K] step validity (cumulative in-range mask).
    cand/count: [B, K] per-anchor cluster candidate and size.
    pos64:      [B] imprecise position (int64).
    allow:      [B] windows still allowed to update (False once an earlier
                sweep already returned).

    Returns (returned, ret_val, best_val, best_dist): the early-return flag
    and value, plus the sweep's best candidate state
    (refinement.c:58-76 / 80-98).
    """
    B, K = anchor_idx.shape

    cand_at = jnp.take_along_axis(cand, anchor_idx, axis=1)     # [B, K]
    count_at = jnp.take_along_axis(count, anchor_idx, axis=1)   # [B, K]
    dist_at = jnp.abs(pos64[:, None] - cand_at)                 # [B, K] int64

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

    init = (
        jnp.full((B,), min_count - 1, jnp.int32),
        jnp.full((B,), _I64_BIG, jnp.int64),
        jnp.full((B,), -1, jnp.int64),
        jnp.zeros((B,), bool),
        jnp.full((B,), -1, jnp.int64),
    )
    xs = (active.T, cand_at.T, count_at.T, dist_at.T)
    (max_count, best_dist, best_val, returned, ret_val), _ = jax.lax.scan(
        body, init, xs
    )
    return returned, ret_val, best_val, best_dist


@functools.partial(
    jax.jit, static_argnames=("min_count", "interval", "range_")
)
def consensus_pos_batch(
    locs: jnp.ndarray,
    n: jnp.ndarray,
    pos: jnp.ndarray,
    *,
    min_count: int = C.CONSENSUS_MIN_COUNT,
    interval: int = C.CONSENSUS_INTERVAL,
    range_: int = C.CONSENSUS_INTERVAL_RANGE,
) -> jnp.ndarray:
    """Batched consensus_pos. Bit-identical to refinement.c:41-101.

    locs: [B, K] int32, sorted ascending per row, INT32_MAX padding.
    n:    [B] int32 number of valid entries per row.
    pos:  [B] int32 imprecise positions.
    Returns [B] int32 refined positions (-1 = NA).
    """
    B, K = locs.shape
    locs64 = locs.astype(jnp.int64)
    pos64 = pos.astype(jnp.int64)
    n = n.astype(jnp.int32)
    half = C.SV_MIN_LENGTH // 2

    cand_l, count_l, cand_r, count_r = _cluster_stats(locs, n, interval)

    k_idx = jnp.arange(K, dtype=jnp.int32)[None, :]

    # point = lower_bound(locs, pos + 25): last index <= query, clamped
    # (refinement.c:3-10, 56).
    sr = _row_searchsorted(locs64, jnp.broadcast_to(pos64[:, None] + half, (B, K))[:, :1], "right")
    point_l = jnp.clip(sr[:, 0].astype(jnp.int32) - 1, 0, jnp.maximum(n - 1, 0))

    idx_l = point_l[:, None] - k_idx                        # descending walk
    in_bounds_l = idx_l >= 0
    idx_l_c = jnp.clip(idx_l, 0, K - 1)
    loc_at_l = jnp.take_along_axis(locs64, idx_l_c, axis=1)
    ok_l = in_bounds_l & (jnp.abs(pos64[:, None] - loc_at_l) < range_)
    active_l = jnp.cumsum(jnp.where(ok_l, 0, 1), axis=1) == 0  # cumulative AND

    allow_all = jnp.ones((B,), bool)
    ret_l, retv_l, best_l, dist_l = _sweep(
        idx_l_c, active_l, cand_l, count_l, pos64, min_count, interval, allow_all
    )

    # point = upper_bound(locs, pos - 25): 0 if locs[0] < query else size-1
    # (refinement.c:12-19, 78) — quirk mirrored.
    first_elem = locs64[:, 0]
    point_r = jnp.where(
        first_elem < pos64 - half,
        jnp.zeros((B,), jnp.int32),
        jnp.maximum(n - 1, 0),
    )
    idx_r = point_r[:, None] + k_idx                        # ascending walk
    in_bounds_r = idx_r < n[:, None]
    idx_r_c = jnp.clip(idx_r, 0, K - 1)
    loc_at_r = jnp.take_along_axis(locs64, idx_r_c, axis=1)
    ok_r = in_bounds_r & (jnp.abs(pos64[:, None] - loc_at_r) < range_)
    active_r = jnp.cumsum(jnp.where(ok_r, 0, 1), axis=1) == 0

    ret_r, retv_r, best_r, dist_r = _sweep(
        idx_r_c, active_r, cand_r, count_r, pos64, min_count, interval, ~ret_l
    )

    # Final selection (refinement.c:100): left wins only on strictly
    # smaller distance.
    final = jnp.where(dist_l < dist_r, best_l, best_r)
    out = jnp.where(ret_l, retv_l, jnp.where(ret_r, retv_r, final))
    out = jnp.where(n < min_count, jnp.int64(-1), out)
    out = jnp.where(n <= 0, jnp.int64(-1), out)
    return out.astype(jnp.int32)


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
    For each anchor i the cluster is the run [i, last_i] within
    ``interval``; the winner is the *first* anchor (smallest value) whose
    count is maximal and exceeds min_count-1.
    """
    B, K = vals.shape
    vals64 = vals.astype(jnp.int64)
    idx = jnp.arange(K, dtype=jnp.int32)[None, :]
    last = _row_searchsorted(vals64, vals64 + interval, "right").astype(jnp.int32) - 1
    last = jnp.minimum(last, jnp.maximum(n[:, None] - 1, 0))
    count = jnp.where(idx < n[:, None], last - idx + 1, 0)
    # C scans anchors in ascending order keeping strictly-greater counts
    # (refinement.c:27-37): winner = first anchor attaining the max count.
    best = jnp.max(count, axis=1)
    first_best = jnp.argmax(count == best[:, None], axis=1)
    win = jnp.take_along_axis(vals, first_best[:, None].astype(jnp.int32), axis=1)[:, 0]
    ok = (best > (min_count - 1)) & (n > 0)
    return jnp.where(ok, win, jnp.int32(-1))
