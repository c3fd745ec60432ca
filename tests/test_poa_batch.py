"""Property tests: the batched TPU DP kernel (ops/poa_batch.py) must
reproduce the scalar semantic anchor (ops/poa.py) bit-for-bit."""
import numpy as np
import pytest

from svtrek_tpu.ops.poa import banded_align, consensus_sequence, encode
from svtrek_tpu.ops.poa_batch import (
    banded_cols_batch, consensus_sequence_batch,
)

BASES = "ACGT"


def _mutate(rng, seq, sub=0.05, ins=0.02, dele=0.02):
    out = []
    for c in seq:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + sub:
            out.append(BASES[rng.integers(4)])
        else:
            out.append(c)
        if rng.random() < ins:
            out.append(BASES[rng.integers(4)])
    return "".join(out)


def _rand_seq(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def test_banded_cols_matches_scalar():
    rng = np.random.default_rng(7)
    targets, queries = [], []
    for _ in range(40):
        m = int(rng.integers(5, 220))
        t = _rand_seq(rng, m)
        q = _mutate(rng, t, sub=0.1, ins=0.05, dele=0.05)
        targets.append(encode(t))
        queries.append(encode(q if q else "A"))
    # unrelated pairs + extreme length mismatch (band forced wide)
    for m, n in [(8, 200), (200, 8), (3, 3), (1, 40)]:
        targets.append(encode(_rand_seq(rng, m)))
        queries.append(encode(_rand_seq(rng, n)))
    got_cols, got_segs = banded_cols_batch(targets, queries, band=16)
    from svtrek_tpu.ops.poa import banded_align_ins, decode_ins

    for i, (t, q) in enumerate(zip(targets, queries)):
        want_cols, want_ins = banded_align_ins(t, q, 16)
        msg = f"pair {i} len(t)={len(t)} len(q)={len(q)}"
        np.testing.assert_array_equal(got_cols[i], want_cols, err_msg=msg)
        assert got_segs[i] == decode_ins(want_ins), msg


def test_banded_cols_band_cap_fallback():
    rng = np.random.default_rng(3)
    t = encode(_rand_seq(rng, 10))
    q = encode(_rand_seq(rng, 900))   # band 891 > cap → host path
    got_cols, _segs = banded_cols_batch([t], [q], band=8, band_cap=64)
    np.testing.assert_array_equal(got_cols[0], banded_align(t, q, 8))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_consensus_batch_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    clusters = []
    for _ in range(12):
        base = _rand_seq(rng, int(rng.integers(30, 300)))
        k = int(rng.integers(1, 7))
        clusters.append([_mutate(rng, base) for _ in range(k)])
    clusters.append([])                      # empty
    clusters.append(["ACGT"])                # singleton
    clusters.append(["ACGTACGT"] * 4)        # all identical to medoid
    got = consensus_sequence_batch(clusters)
    for i, seqs in enumerate(clusters):
        assert got[i] == consensus_sequence(seqs), f"cluster {i}"
