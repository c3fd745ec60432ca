"""Windowed INS discovery: kernel vs oracle, plus end-to-end scan mode.

The oracle (oracle/refine.py:window_scan) restates sliding_window.c:60-92
exactly (wrapping int32 sums, truncating division, strided anchors,
first-strictly-greater-support winner); the batched kernel must match
bit-for-bit.  End-to-end: planted INS reads in a synthetic BAM must be
rediscovered near the planted position.
"""
import numpy as np
import pytest

from svtrek_tpu import constants as C
from svtrek_tpu.oracle import window_scan
from svtrek_tpu.ops.window_scan import window_scan_batch

PAD = C.I32_MAX


def _pack(cases, K):
    B = len(cases)
    locs = np.full((B, K), PAD, np.int32)
    n = np.zeros(B, np.int32)
    for b, vals in enumerate(cases):
        s = np.sort(np.asarray(vals, np.int64)).astype(np.int32)
        locs[b, : len(s)] = s
        n[b] = len(s)
    return locs, n


def test_window_scan_oracle_basics():
    # 4 supporters within 1000bp → mean; default min_count 3.
    assert window_scan([1000, 1010, 1020, 1500]) == (1133, 4)
    # Too few.
    assert window_scan([1000, 1010]) == (-1, 0)
    assert window_scan([]) == (-1, 0)
    # Two clusters: bigger one wins; tie → first (leftmost anchor).
    best, sup = window_scan([100, 110, 120, 5000, 5010, 5020, 5030],
                            window_size=500)
    assert (best, sup) == ((5000 + 5010 + 5020 + 5030 + 2) // 4, 4)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("slide", [1, 2, 5])
def test_window_scan_matches_oracle(seed, slide):
    rng = np.random.default_rng(seed)
    cases = []
    for _ in range(64):
        k = int(rng.integers(0, 50))
        base = int(rng.integers(1000, 10_000_000))
        vals = [base + int(rng.integers(0, 3000)) for _ in range(k)]
        cases.append(vals)
    K = 64
    locs, n = _pack(cases, K)
    min_count, wsize = 3, 1000
    best, support = window_scan_batch(
        locs, n, min_count=min_count, window_size=wsize, slide_size=slide)
    best = np.asarray(best)
    support = np.asarray(support)
    for b, vals in enumerate(cases):
        wb, ws = window_scan(vals, min_count, wsize, slide)
        assert (int(best[b]), int(support[b])) == (wb, ws), (b, vals)


def test_window_scan_wrapping_mean():
    # Positions big enough that the C int32 sum wraps: the kernel must
    # reproduce the wrapped-and-truncated mean exactly.
    vals = [2_000_000_000, 2_000_000_100, 2_000_000_200]
    want = window_scan(vals, 3, 1000, 1)
    locs, n = _pack([vals], 16)
    best, support = window_scan_batch(
        locs, n, min_count=3, window_size=1000, slide_size=1)
    assert (int(np.asarray(best)[0]), int(np.asarray(support)[0])) == want
    # Sanity: the sum 6e9 indeed wrapped (mean is NOT the true mean).
    assert want[0] != 2_000_000_100


def test_scan_pipeline_end_to_end(tmp_path):
    from svtrek_tpu.config import ScanConfig
    from svtrek_tpu.pipeline.scan import run_scan
    from tests.fixtures import PlantedSV, write_fixture

    sv = PlantedSV(chrom=1, pos=50_000, end=50_000, svtype="INS", svlen=120)
    bam, _ = write_fixture(str(tmp_path), [sv], {1: 200_000}, seed=7,
                           depth=10, noise=20)
    cfg = ScanConfig(
        bam_file=bam, chrom=1, start=40_000, end=60_000,
        window_size=1000, slide_size=1, output_file="",
    )
    best, lines = run_scan(cfg, out=_Null())
    # The planted INS at 50_000 (1-based) → evidence at 0-based ~49_999.
    assert best != -1
    assert abs(best - 49_999) <= 10
    assert any("INS Discovery in window" in l for l in lines)

    # The all-C fast path (fetch_batch + extract_batch) and the generic
    # python-fetch path must produce identical output lines.
    import dataclasses

    best2, lines2 = run_scan(
        dataclasses.replace(cfg, use_native_io=False), out=_Null())
    assert (best2, lines2) == (best, lines)


class _Null:
    def write(self, *_a):  # pragma: no cover - trivial sink
        pass

    def flush(self):  # pragma: no cover
        pass
