"""Subprocess worker for the multi-process jax.distributed test
(tests/test_distributed.py).

Usage: python distributed_worker.py <coordinator> <num_procs> <proc_id>
       <out_json>

Initializes jax.distributed on the CPU backend (4 virtual devices per
process), builds the SAME deterministic global consensus problem on
every process, contributes its local block of rows to a global
mesh-sharded array, runs sharded_consensus_step over the GLOBAL mesh,
and dumps the rows it can address (its own shards) to <out_json>.  The
parent test assembles both processes' shards and checks parity with the
single-process result — proving the multi-host path computes the same
refinements (SURVEY.md §5 'distributed backend'; the multi-host
replacement for audit.c:269-293).
"""
import json
import os
import sys


def main():
    coord, nproc, pid, out_path = sys.argv[1:5]
    nproc, pid = int(nproc), int(pid)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import numpy as np
    import jax

    from svtrek_tpu.parallel.mesh import (
        init_distributed, make_global_array, make_mesh,
        sharded_consensus_step,
    )

    n_dev = init_distributed(coord, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert n_dev == 4 * nproc, n_dev

    B, K = 16, 32
    rng = np.random.default_rng(7)
    base = rng.integers(10_000, 1_000_000, B).astype(np.int64)
    counts = rng.integers(0, K + 1, B).astype(np.int32)
    locs = np.full((B, K), 0x7FFFFFFF, np.int32)
    for i in range(B):
        v = np.sort((base[i] + rng.integers(-400, 401, counts[i]))
                    .astype(np.int32))
        locs[i, : counts[i]] = v
    ipos = base.astype(np.int32)

    mesh = make_mesh()  # all 8 global devices
    rows = B // nproc
    lo = pid * rows
    g_locs = make_global_array(locs[lo : lo + rows], mesh)
    g_counts = make_global_array(counts[lo : lo + rows], mesh)
    g_ipos = make_global_array(ipos[lo : lo + rows], mesh)

    step = sharded_consensus_step(mesh, num_windows=B)
    refined, ovf = step(g_locs, g_counts, g_ipos)

    out = []
    for shard, oshard in zip(refined.addressable_shards,
                             ovf.addressable_shards):
        start = shard.index[0].start or 0
        vals = np.asarray(shard.data).tolist()
        ovfs = np.asarray(oshard.data).astype(int).tolist()
        for k, (v, o) in enumerate(zip(vals, ovfs)):
            out.append([start + k, v, o])

    with open(out_path, "w") as fh:
        json.dump({"pid": pid, "rows": out}, fh)
    print(f"[worker {pid}] ok: {len(out)} rows", flush=True)


if __name__ == "__main__":
    main()
