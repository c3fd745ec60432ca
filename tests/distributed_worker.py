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


def build_disc_problem():
    """Deterministic projected-run batch (seed 11) shared by the worker
    and the parent test: 16 reads x 16 runs with planted >=50 bp
    INS/DEL/clip signals."""
    import numpy as np

    N, O = 16, 16
    rng = np.random.default_rng(11)
    ops = np.full((N, O), 9, np.int8)
    lens = np.zeros((N, O), np.int32)
    n_runs = rng.integers(3, O, N).astype(np.int32)
    ref_start = rng.integers(1_000, 500_000, N).astype(np.int32)
    for i in range(N):
        n = n_runs[i]
        o = rng.choice([0, 1, 2, 4], n).astype(np.int8)
        l = rng.integers(1, 45, n).astype(np.int32)
        # plant a big signal in most reads (some leading/trailing S)
        if i % 4 != 3:
            k = int(rng.integers(0, n))
            o[k] = rng.choice([1, 2, 4])
            l[k] = int(rng.integers(50, 200))
        ops[i, :n] = o
        lens[i, :n] = l
    return ops, lens, n_runs, ref_start


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
        sharded_consensus_step, sharded_disc_step,
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

    # --- disc detection over the same global mesh (VERDICT r3 item 8:
    # row-for-row parity of sharded_disc_step across 2 real processes).
    d_ops, d_lens, d_nruns, d_ref = build_disc_problem()
    N = d_ops.shape[0]
    n_loc = N // mesh.size
    CAP = 8
    rows_p = N // nproc
    dlo = pid * rows_p
    g = [make_global_array(a[dlo : dlo + rows_p], mesh)
         for a in (d_ops, d_lens, d_nruns, d_ref)]
    dstep = sharded_disc_step(mesh, min_len=50, cap=CAP)
    totals, brow, btype, bref, bread, blen = dstep(*g)

    def shards(arr):
        return {(sh.index[0].start or 0): np.asarray(sh.data)
                for sh in arr.addressable_shards}

    tsh = shards(totals)
    rsh, tysh, refsh, readsh, lnsh = (shards(x) for x in
                                      (brow, btype, bref, bread, blen))
    disc_rows = []
    for s, t in tsh.items():           # totals sharded 1/device → s = shard
        n = int(t[0])
        assert n <= CAP, (s, n)
        blk = s * CAP
        for k in range(n):
            disc_rows.append([
                s * n_loc + int(rsh[blk][k]), int(tysh[blk][k]),
                int(refsh[blk][k]), int(readsh[blk][k]),
                int(lnsh[blk][k]),
            ])

    with open(out_path, "w") as fh:
        json.dump({"pid": pid, "rows": out, "disc_rows": disc_rows}, fh)
    print(f"[worker {pid}] ok: {len(out)} rows, "
          f"{len(disc_rows)} disc rows", flush=True)


if __name__ == "__main__":
    main()
