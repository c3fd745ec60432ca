"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import pytest

from svtrek_tpu.ops.audit_step import audit_refine_step
from svtrek_tpu.parallel.mesh import (
    make_mesh, make_sharded_demo_batch, sharded_audit_step,
)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_step_matches_single(n_devices):
    devs = jax.devices()[:n_devices]
    assert len(devs) == n_devices
    mesh = make_mesh(devs)
    b_per = 4
    B = n_devices * b_per
    args = make_sharded_demo_batch(n_devices, b_per_shard=b_per,
                                   reads_per_window=6, O=16, seed=1)
    step = sharded_audit_step(mesh, num_windows=B, K=64)
    refined, counts, overflow = step(*args)
    refined = np.asarray(refined)
    assert not np.asarray(overflow).any()

    # Single-device reference: same batch with global window ids.
    ops, lens, pos, n_ops, wid, kind, istart, iend, ipos = args
    gwid = np.asarray(wid).copy()
    reads_per_shard = len(gwid) // n_devices
    for s in range(n_devices):
        lo = s * reads_per_shard
        gwid[lo : lo + reads_per_shard] += s * b_per
    ref1, cnt1, ovf1 = audit_refine_step(
        ops, lens, pos, n_ops, gwid, kind, istart, iend, ipos,
        num_windows=B, K=64,
    )
    np.testing.assert_array_equal(refined, np.asarray(ref1))
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(cnt1))


def test_graft_entry_dryrun():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    fn, args = g.entry()
    out = fn(*args)
    assert np.asarray(out[0]).shape == (64,)


def test_sharded_csr_matches_dense():
    """--extract device + data_shards > 1 routes through the
    shard-blockwise CSR pack (pack._pack_native_sharded) and the
    shard_map'd CSR step (mesh.sharded_audit_step_csr); records must
    match the dense single-device CSR path byte for byte."""
    import io

    from svtrek_tpu.config import AudtConfig
    from svtrek_tpu.native import native_bam_reader
    from svtrek_tpu.pipeline.audit import run_audit
    from tests.fixtures import PlantedSV, write_fixture
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        svs = [PlantedSV(1, 50_000, 50_400, "DEL", 400),
               PlantedSV(1, 120_000, 120_001, "INS", 120),
               PlantedSV(1, 200_000, 200_900, "INV", 900),
               PlantedSV(1, 260_000, 260_300, "DEL", 300)]
        bam, vcf = write_fixture(str(d), svs, {1: 300_000}, seed=3)
        if native_bam_reader(bam) is None:
            pytest.skip("native reader unavailable")
        base = dict(bam_file=bam, vcf_file=vcf, extract="device",
                    batch_windows=4)  # several batches + a ragged tail
        dense = run_audit(AudtConfig(**base, data_shards=1),
                          out=io.StringIO(), err=io.StringIO())
        for n in (2, 8):
            sharded = run_audit(AudtConfig(**base, data_shards=n),
                                out=io.StringIO(), err=io.StringIO())
            assert sharded == dense
