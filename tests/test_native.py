"""Native C library tests: BAM region fetch parity with the Python
reader, and scalar baseline parity with the Python oracle."""
import random

import numpy as np
import pytest

from svtrek_tpu import constants as C
from svtrek_tpu.io.bam import BamReader
from svtrek_tpu.oracle import consensus_pos, refine_task

bamlib = pytest.importorskip("svtrek_tpu.native.bamlib")

lib = bamlib.load_library()
pytestmark = pytest.mark.skipif(lib is None, reason="native build failed")


@pytest.fixture(scope="module")
def bam_fixture(tmp_path_factory):
    from test_bam_io import _random_records
    from svtrek_tpu.io.bam import BamWriter

    tmp = tmp_path_factory.mktemp("native")
    path = str(tmp / "t.bam")
    rng = random.Random(11)
    chrom_len = 1_500_000
    recs = _random_records(rng, 500, chrom_len)
    with BamWriter(path, [("1", chrom_len)]) as w:
        for r in recs:
            w.write(r)
    return path, recs, chrom_len


def test_native_fetch_matches_python(bam_fixture):
    path, recs, chrom_len = bam_fixture
    nrd = bamlib.NativeBamReader(path)
    prd = BamReader(path)
    rng = random.Random(12)
    for _ in range(60):
        beg = rng.randrange(0, chrom_len)
        end = beg + rng.randrange(1, 80000)
        want = [(r.pos, r.cigar) for r in prd.fetch(0, beg, end)]
        have = [(r.pos, r.cigar) for r in nrd.fetch(0, beg, end)]
        assert have == want, (beg, end)
    # degenerate queries
    assert nrd.fetch(0, 500, 100) == []
    assert nrd.fetch(0, 4_294_000_000, 4_294_002_000) == []
    assert nrd.fetch(-1, 0, 1000) == []
    assert nrd.fetch(7, 0, 1000) == []


def test_native_consensus_matches_oracle():
    rng = np.random.default_rng(5)
    import ctypes as ct

    for _ in range(300):
        n = int(rng.integers(0, 40))
        center = int(rng.integers(1000, 100000))
        vals = [center + int(rng.integers(-600, 600)) for _ in range(n)]
        pos = center + int(rng.integers(-100, 100))
        arr = np.asarray(vals, np.int32)
        got = lib.svbaseline_consensus(
            arr.ctypes.data_as(ct.POINTER(ct.c_int32)), n, pos, 3, 5, 500
        )
        want = consensus_pos(vals, pos)
        assert got == want, (vals, pos, got, want)


def test_native_refine_matches_oracle(bam_fixture):
    path, recs, chrom_len = bam_fixture
    nrd = bamlib.NativeBamReader(path)
    rng = random.Random(13)
    for kind in (C.KIND_DEL_START, C.KIND_DEL_END, C.KIND_INS, C.KIND_POINT):
        for _ in range(15):
            base = rng.randrange(20000, chrom_len - 20000)
            istart, iend = base - 3000, base + 3000
            packed = nrd.fetch_packed(0, istart - 1, iend - 1)
            got = bamlib.baseline_refine(
                lib, kind, packed, istart, iend, base, 3, 5, 500
            )
            reads = [(r.pos, r.cigar) for r in nrd.fetch(0, istart - 1, iend - 1)]
            want = refine_task(kind, reads, istart, iend, base)
            assert got == want, (kind, base, got, want)


def test_native_batch_pack_matches_generic(bam_fixture):
    """pack_chunk_native (one C fetch_batch + one C fill per chunk) must
    produce a batch that refines every window identically to the generic
    per-window path."""
    from svtrek_tpu.config import AudtConfig
    from svtrek_tpu.pipeline.audit import run_refinement
    from svtrek_tpu.pipeline.pack import (
        PackedReads, WindowSpec, pack_chunk, pack_chunk_native,
    )
    from svtrek_tpu.constants import (
        KIND_DEL_END, KIND_DEL_START, KIND_INS, KIND_POINT,
    )

    path, recs, chrom_len = bam_fixture
    nrd = bamlib.NativeBamReader(path)
    rng = random.Random(21)
    wins = []
    kinds = [KIND_DEL_START, KIND_DEL_END, KIND_INS, KIND_POINT]
    for i in range(37):
        p = rng.randrange(10_000, chrom_len - 10_000)
        wins.append(WindowSpec(kinds[i % 4], 1, p - 5000, p + 5000, p, i, 0))
    # one degenerate wrapped-interval window (empty query path)
    wins.append(WindowSpec(KIND_DEL_START, 1,
                           C.u32(0 - 20000), 2000, 1, 99, 0))
    cfg = AudtConfig(bam_file=path, vcf_file="x", batch_windows=64)

    def fetch(tid, beg, end):
        return PackedReads(*nrd.fetch_packed(tid, int(beg), int(end)))

    pb_gen = pack_chunk(wins, fetch, cfg, n_shards=1)
    pb_nat = pack_chunk_native(wins, nrd, cfg)
    assert pb_nat.batch.num_windows == pb_gen.batch.num_windows
    got_gen = {(w.record_index, w.slot): r
               for w, r in run_refinement(pb_gen, cfg)}
    got_nat = {(w.record_index, w.slot): r
               for w, r in run_refinement(pb_nat, cfg)}
    assert got_nat == got_gen and len(got_nat) == len(wins)


def test_audit_native_io_matches_python_io(tmp_path):
    """Full run_audit parity: native batched C I/O vs pure-Python I/O."""
    import io

    from fixtures import PlantedSV, write_fixture
    from svtrek_tpu.config import AudtConfig
    from svtrek_tpu.pipeline.audit import run_audit

    svs = [
        PlantedSV(1, 60_000, 60_300, "DEL", 300),
        PlantedSV(1, 140_000, 140_001, "INS", 90),
        PlantedSV(1, 220_000, 223_000, "INV", 3000),
        PlantedSV(2, 90_000, 90_120, "DEL", 120),
    ]
    bam, vcf = write_fixture(str(tmp_path), svs, {1: 400_000, 2: 200_000},
                             seed=5)
    py = run_audit(
        AudtConfig(bam_file=bam, vcf_file=vcf, use_native_io=False),
        out=io.StringIO(), err=io.StringIO())
    nat = run_audit(
        AudtConfig(bam_file=bam, vcf_file=vcf, use_native_io=True,
                   batch_windows=4),
        out=io.StringIO(), err=io.StringIO())
    assert nat == py


def test_fetch_batch_merged_matches_plain(bam_fixture):
    """svbam_fetch_batch_merged must give every window the exact read
    set (and file order) the per-window fetch gives it, for adversarial
    window mixes: unsorted, nested, duplicated, adjacent, wrapped,
    invalid-tid, and gap-spanning windows, at several merge_gap values —
    verified through extract_batch (the consumer), whose (locs, counts,
    refined) triple is a function of the per-window read sets."""
    from svtrek_tpu.constants import KIND_DEL_END, KIND_DEL_START, KIND_INS

    path, recs, chrom_len = bam_fixture
    nrd = bamlib.NativeBamReader(path)
    rng = random.Random(33)
    kinds_cycle = [KIND_DEL_START, KIND_DEL_END, KIND_INS]

    def build_windows():
        tids, begs, ends, kinds = [], [], [], []
        for i in range(120):
            p = rng.randrange(0, chrom_len)
            w = rng.choice([50, 500, 5_000, 40_000])
            tids.append(0)
            begs.append(max(0, p - w))
            ends.append(p + w)
            kinds.append(kinds_cycle[i % 3])
        # nested + duplicate + adjacent runs
        begs[1], ends[1] = begs[0] + 10, max(begs[0] + 20, ends[0] - 10)
        begs[2], ends[2] = begs[0], ends[0]          # exact duplicate
        begs[3], ends[3] = ends[0], ends[0] + 1000   # adjacent
        # invalid tid / wrapped interval / empty
        tids[4] = -1
        begs[5], ends[5] = 500_000, 400_000          # beg >= end
        tids[6] = 7                                  # tid out of range
        return (np.array(tids, np.int32), np.array(begs, np.int64),
                np.array(ends, np.int64), np.array(kinds, np.int32))

    for gap in (1, 1000, 10_000_000):
        tids, begs, ends, kinds = build_windows()
        istart = (begs + 1).astype(np.int64)
        iend = (ends + 1).astype(np.int64)
        ipos = ((begs + ends) // 2).astype(np.int64)
        K = 64

        _, wc_plain = nrd.fetch_batch(tids, begs, ends)
        plain = nrd.extract_batch(kinds, istart, iend, ipos, wc_plain,
                                  K, 3, 5, 500)
        tot_m, wc_merged = nrd.fetch_batch_merged(tids, begs, ends, gap)
        merged = nrd.extract_batch(kinds, istart, iend, ipos, wc_merged,
                                   K, 3, 5, 500)

        assert np.array_equal(wc_plain, wc_merged), gap
        for a, b in zip(plain, merged):
            assert np.array_equal(a, b), gap
        assert tot_m >= 0  # -1 would have raised in the binding
