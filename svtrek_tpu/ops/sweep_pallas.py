"""Consensus sweeps as one Pallas TPU kernel.

The reference's left/right cluster sweeps (refinement.c:58-98) are a
sequential record-chain fold: the carried (max_count, best_distance)
state only changes at steps that beat BOTH running values, so the fold
is not an associative reduction and cannot be turned into a prefix scan.
Run as `lax.scan` it costs 2·W dispatch-bound steps of tiny [B]
elementwise work — the dominant cost of the whole audit step on real
hardware (see profile_audit.py).

Here the fold runs as a single Pallas kernel instead: anchors stream
along sublanes ([W, lanes] blocks, 128 windows per lane block), both
sweeps and the final closer-of-two selection (refinement.c:100) execute
back-to-back in VMEM, one kernel launch total.  Semantics are
bit-identical to the `lax.scan` path in `ops.consensus._sweep_scan`
(property-tested against it and against the scalar oracle).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 0x7FFFFFFF  # C int distance sentinel (refinement.c:49); Python int —
# a jnp scalar here would be captured as a constant, which pallas_call rejects.
_LANES = 128


def _fold(pos, c_ref, n_ref, a_ref, allow, W: int, min_count: int,
          interval: int):
    """One sweep direction (refinement.c:58-76 / 80-98) over W anchor
    steps.  pos/allow: [1, L]; refs: [W, L] int32 blocks."""
    zero = jnp.zeros_like(pos)
    init = (
        zero + (min_count - 1),  # max_count
        zero + _BIG,             # best distance
        zero - 1,                # best value
        zero,                    # returned flag (0/1)
        zero - 1,                # early-return value
    )

    def body(k, carry):
        m, bd, bv, ret, rv = carry
        c = c_ref[pl.ds(k, 1), :]
        nn = n_ref[pl.ds(k, 1), :]
        a = a_ref[pl.ds(k, 1), :]
        d = jnp.abs(pos - c)
        live = (a != 0) & allow & (ret == 0)
        bigger = live & (nn > m)
        retn = bigger & (d < interval)      # refinement.c:68-69
        upd = bigger & (~retn) & (d < bd)   # refinement.c:70-74
        ret = jnp.where(retn, 1, ret)
        rv = jnp.where(retn, c, rv)
        m = jnp.where(upd, nn, m)
        bv = jnp.where(upd, c, bv)
        bd = jnp.where(upd, d, bd)
        return m, bd, bv, ret, rv

    return jax.lax.fori_loop(0, W, body, init)


def _kernel(pos_ref, cl_ref, nl_ref, al_ref, cr_ref, nr_ref, ar_ref,
            out_ref, *, W: int, min_count: int, interval: int):
    pos = pos_ref[0:1, :]
    always = pos == pos
    _, bdl, bvl, retl, rvl = _fold(
        pos, cl_ref, nl_ref, al_ref, always, W, min_count, interval)
    # The right sweep only runs if the left sweep did not early-return
    # (the C returns out of consensus_pos; refinement.c:68-69).
    _, bdr, bvr, retr, rvr = _fold(
        pos, cr_ref, nr_ref, ar_ref, retl == 0, W, min_count, interval)
    # Closer-of-two final selection; left wins only on strictly smaller
    # distance (refinement.c:100).
    final = jnp.where(bdl < bdr, bvl, bvr)
    out_ref[0:1, :] = jnp.where(
        retl != 0, rvl, jnp.where(retr != 0, rvr, final))


def sweep_fold_pallas(
    pos: jnp.ndarray,        # [B] int32 imprecise positions
    cand_l: jnp.ndarray,     # [B, W] int32 left-sweep anchor candidates
    count_l: jnp.ndarray,    # [B, W] int32 left-sweep cluster counts
    act_l: jnp.ndarray,      # [B, W] bool/int left-sweep anchor liveness
    cand_r: jnp.ndarray,
    count_r: jnp.ndarray,
    act_r: jnp.ndarray,
    *,
    min_count: int,
    interval: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused both-sweeps consensus fold; returns refined [B] int32
    (pre invalid-count masking)."""
    B, W = cand_l.shape
    Bp = max(_LANES, ((B + _LANES - 1) // _LANES) * _LANES)

    def prep(x):
        x = x.astype(jnp.int32).T
        return jnp.pad(x, ((0, 0), (0, Bp - B)))

    posp = jnp.pad(pos.astype(jnp.int32)[None, :], ((0, 0), (0, Bp - B)))
    args = [posp] + [prep(x) for x in
                     (cand_l, count_l, act_l, cand_r, count_r, act_r)]
    kern = functools.partial(
        _kernel, W=W, min_count=min_count, interval=interval)
    row = pl.BlockSpec((1, _LANES), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((W, _LANES), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        in_specs=[row] + [mat] * 6,
        out_specs=row,
        grid=(Bp // _LANES,),
        interpret=interpret,
    )(*args)
    return out[0, :B]
