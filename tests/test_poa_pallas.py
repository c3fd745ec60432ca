"""Pallas banded-DP row scan ≡ the XLA lax.scan formulation, bitwise.

The Pallas kernel (ops/poa_pallas.py) must reproduce ops/poa_batch's
_dp_cols_batch exactly — same scores, same tie-breaking, same pointer
rows — across randomized pair batches, length spreads, and band widths.
Runs in interpret mode on the CPU backend (tests force JAX_PLATFORMS=
cpu); the real-hardware path compiles the same kernel.
"""
import numpy as np
import pytest

from svtrek_tpu.ops.poa import banded_align_ins, encode
from svtrek_tpu.ops.poa_batch import _dp_cols_batch, _pow2
from svtrek_tpu.ops.poa_pallas import dp_cols_batch_pallas

BASES = "ACGT"


def _mutate(rng, seq, sub, ins, dele):
    out = []
    for c in seq:
        r = rng.random()
        if r < dele:
            continue
        out.append(BASES[rng.integers(4)] if r < dele + sub else c)
        if rng.random() < ins:
            out.append(BASES[rng.integers(4)])
    return "".join(out)


def _build(rng, B, M, band, sub=0.08, ins=0.04, dele=0.04, jitter=40):
    targets, queries = [], []
    for _ in range(B):
        t = "".join(BASES[i]
                    for i in rng.integers(0, 4,
                                          M + int(rng.integers(0, jitter))))
        targets.append(encode(t))
        queries.append(encode(_mutate(rng, t, sub, ins, dele)))
    Mp = _pow2(max(map(len, targets)), 16)
    Np = _pow2(max(map(len, queries)), 16)
    bands = np.array([max(band, abs(len(q) - len(t)) + 1)
                      for t, q in zip(targets, queries)], np.int32)
    W = _pow2(int(bands.max()), 16)
    tpad = np.full((B, Mp), 5, np.int8)
    qpad = np.full((B, Np), 5, np.int8)
    ms = np.array([len(t) for t in targets], np.int32)
    ns = np.array([len(q) for q in queries], np.int32)
    for i in range(B):
        tpad[i, : ms[i]] = targets[i]
        qpad[i, : ns[i]] = queries[i]
    return tpad, ms, qpad, ns, bands, W, targets, queries


@pytest.mark.parametrize("tb", ["pallas", "xla"])
@pytest.mark.parametrize("seed,B,M,band", [
    (1, 8, 200, 16),
    (2, 5, 60, 8),       # short targets, narrow band
    (3, 16, 300, 32),    # band bucket 32
    (4, 4, 500, 64),     # W = 64 storage
    (10, 2, 900, 64),    # MP=1024 >> window: windowed tb accumulators
])
def test_pallas_matches_xla(seed, B, M, band, tb):
    rng = np.random.default_rng(seed)
    tpad, ms, qpad, ns, bands, W, _, _ = _build(rng, B, M, band)
    cols_x, ins_x = (np.asarray(x) for x in _dp_cols_batch(
        tpad, ms, qpad, ns, bands, W=W))
    cols_p, ins_p = (np.asarray(x) for x in dp_cols_batch_pallas(
        tpad, ms, qpad, ns, bands, W=W, tb=tb, interpret=True))
    assert np.array_equal(cols_x, cols_p)
    assert np.array_equal(ins_x, ins_p)


@pytest.mark.parametrize("tb", ["pallas", "xla"])
def test_pallas_degenerate_pairs(tb):
    """Empty query (all-left walk), empty target (all-up walk), and a
    query far longer than the target: the traceback activation /
    boundary rules must match the XLA walk exactly."""
    rng = np.random.default_rng(5)
    B = 4
    Mp, Np = 128, 128
    tpad = np.full((B, Mp), 5, np.int8)
    qpad = np.full((B, Np), 5, np.int8)
    ms = np.array([40, 0, 10, 60], np.int32)
    ns = np.array([0, 40, 50, 55], np.int32)
    for i in range(B):
        tpad[i, : ms[i]] = rng.integers(0, 4, ms[i]).astype(np.int8)
        qpad[i, : ns[i]] = rng.integers(0, 4, ns[i]).astype(np.int8)
    bands = np.maximum(8, np.abs(ns - ms) + 1).astype(np.int32)
    W = 64
    cols_x, ins_x = (np.asarray(x) for x in _dp_cols_batch(
        tpad, ms, qpad, ns, bands, W=W))
    cols_p, ins_p = (np.asarray(x) for x in dp_cols_batch_pallas(
        tpad, ms, qpad, ns, bands, W=W, tb=tb, interpret=True))
    assert np.array_equal(cols_x, cols_p)
    assert np.array_equal(ins_x, ins_p)


def test_pallas_arbitrary_batch_size_pads():
    """B=300 (not a multiple of the 256 batch tile) must pad + slice,
    not trip the kernel's divisibility assert (ADVICE r4 medium): the
    assert fired at trace time and latched the process-wide fallback."""
    rng = np.random.default_rng(7)
    tpad, ms, qpad, ns, bands, W, _, _ = _build(rng, 300, 30, 8,
                                                jitter=4)
    cols_x, ins_x = (np.asarray(x) for x in _dp_cols_batch(
        tpad, ms, qpad, ns, bands, W=W))
    cols_p, ins_p = (np.asarray(x) for x in dp_cols_batch_pallas(
        tpad, ms, qpad, ns, bands, W=W, interpret=True))
    assert cols_p.shape == cols_x.shape == (300, tpad.shape[1])
    assert np.array_equal(cols_x, cols_p)
    assert np.array_equal(ins_x, ins_p)


def test_dispatch_latch_scoping(monkeypatch):
    """Shape-specific failures must memoize per shape, not latch the
    process-wide _PALLAS_BROKEN flag (ADVICE r4): a later valid shape
    should still try the Pallas path."""
    from svtrek_tpu.ops import poa_batch

    monkeypatch.setattr(poa_batch, "_PALLAS_BROKEN", False)
    monkeypatch.setattr(poa_batch, "_PALLAS_BAD_SHAPES", set())
    monkeypatch.setattr(poa_batch.jax, "default_backend", lambda: "tpu")
    calls = []

    def fake_pallas(tpad, ms, qpad, ns, bands, W):
        calls.append(tpad.shape)
        if tpad.shape[0] == 300:
            raise AssertionError("shape-specific")
        raise RuntimeError("Mosaic lowering failed")

    import svtrek_tpu.ops.poa_pallas as pp

    monkeypatch.setattr(pp, "dp_cols_batch_pallas", fake_pallas)
    # Stub the XLA fallback too — this test only checks dispatch.
    monkeypatch.setattr(poa_batch, "_dp_cols_batch",
                        lambda *a, **k: (None, None))
    rng = np.random.default_rng(3)
    a300 = _build(rng, 300, 20, 8, jitter=2)
    a8 = _build(rng, 8, 20, 8, jitter=2)
    big_q = np.full((300, 1024), 5, np.int8)  # pass the MIN_WORK gate
    big_q[:, :a300[2].shape[1]] = a300[2]
    poa_batch.dp_cols_dispatch(a300[0], a300[1], big_q, a300[3],
                               a300[4], W=a300[5])
    assert not poa_batch._PALLAS_BROKEN          # shape-memoized only
    assert len(poa_batch._PALLAS_BAD_SHAPES) == 1
    big_q8 = np.full((8, 131072), 5, np.int8)
    big_q8[:, :a8[2].shape[1]] = a8[2]
    poa_batch.dp_cols_dispatch(a8[0], a8[1], big_q8, a8[3], a8[4],
                               W=a8[5])
    assert len(calls) == 2                       # second shape still tried
    assert poa_batch._PALLAS_BROKEN              # RuntimeError → latched


def test_pallas_matches_scalar_anchor():
    """Straight to the scalar semantic anchor (banded_align_ins) for a
    handful of pairs, including the N-much-longer-than-M regime where
    the slice clamping/padding differs between the two device paths."""
    rng = np.random.default_rng(9)
    tpad, ms, qpad, ns, bands, W, targets, queries = _build(
        rng, 6, 120, 16, sub=0.15, ins=0.20, dele=0.02, jitter=10)
    cols_p, ins_p = (np.asarray(x) for x in dp_cols_batch_pallas(
        tpad, ms, qpad, ns, bands, W=W, interpret=True))
    for i in range(len(targets)):
        cols_s, ins_s = banded_align_ins(targets[i], queries[i],
                                         int(bands[i]))
        assert np.array_equal(cols_p[i, : ms[i]], cols_s), i
        # device path carries per-boundary COUNTS; the scalar anchor
        # carries the segments themselves
        assert [len(seg) for seg in ins_s] == list(ins_p[i, : ms[i] + 1]), i
