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
