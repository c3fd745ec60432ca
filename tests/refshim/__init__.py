"""ctypes loader for the golden-parity shim.

Compiles the reference's OWN sources (/root/reference/refinement.c,
utils.c, sliding_window.c — unmodified, read straight from the read-only
reference tree) together with tests/refshim/shim.c into librefshim.so,
and exposes typed entry points so the Python oracle
(svtrek_tpu/oracle/refine.py) is property-tested against the actual
reference code rather than a re-derivation.

Build is on demand and cached by source mtimes; tests skip cleanly if no
compiler or no reference tree is present.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REF = os.environ.get("SVTREK_REFERENCE_DIR", "/root/reference")
_SO = os.path.join(_HERE, "librefshim.so")

_REF_SOURCES = ["refinement.c", "utils.c", "sliding_window.c"]
_AUDIT_SOURCES = ["audit.c", "init.c", "tpool.c"]
_AUDIT_BIN = os.path.join(_HERE, "refaudit")


class ShimUnavailable(Exception):
    pass


def _sources():
    srcs = [os.path.join(_HERE, "shim.c")]
    for s in _REF_SOURCES:
        srcs.append(os.path.join(_REF, s))
    return srcs


def _needs_build() -> bool:
    if not os.path.exists(_SO):
        return True
    so_mtime = os.path.getmtime(_SO)
    return any(os.path.getmtime(s) > so_mtime for s in _sources())


def build() -> str:
    """Compile librefshim.so if stale; returns the .so path."""
    for s in _sources():
        if not os.path.exists(s):
            raise ShimUnavailable(f"missing source {s}")
    if _needs_build():
        cmd = [
            "gcc", "-O2", "-g", "-fPIC", "-shared",
            "-I" + _HERE, "-I" + _REF,
            *_sources(),
            "-o", _SO,
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise ShimUnavailable(f"gcc failed:\n{proc.stderr}")
    return _SO


def build_audit_bin() -> str:
    """Compile the reference's full audit driver against the shim;
    returns the executable path (tests/refshim/refaudit)."""
    srcs = [os.path.join(_HERE, "audit_main.c"), os.path.join(_HERE, "shim.c")]
    for s in _REF_SOURCES + _AUDIT_SOURCES:
        srcs.append(os.path.join(_REF, s))
    for s in srcs:
        if not os.path.exists(s):
            raise ShimUnavailable(f"missing source {s}")
    if not os.path.exists(_AUDIT_BIN) or any(
            os.path.getmtime(s) > os.path.getmtime(_AUDIT_BIN) for s in srcs):
        cmd = ["gcc", "-O2", "-g", "-I" + _HERE, "-I" + _REF,
               *srcs, "-o", _AUDIT_BIN, "-lpthread"]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise ShimUnavailable(f"gcc failed:\n{proc.stderr}")
    return _AUDIT_BIN


_BENCH_BIN = os.path.join(_HERE, "refbench")


def build_bench_bin() -> str:
    """Compile the MEASURED reference baseline: the reference's own audit
    pipeline against the htslib-faithful real-file backend (htsio.c).
    Returns the executable path (tests/refshim/refbench)."""
    srcs = [os.path.join(_HERE, "refbench_main.c"),
            os.path.join(_HERE, "htsio.c")]
    for s in _REF_SOURCES + _AUDIT_SOURCES:
        srcs.append(os.path.join(_REF, s))
    for s in srcs:
        if not os.path.exists(s):
            raise ShimUnavailable(f"missing source {s}")
    if not os.path.exists(_BENCH_BIN) or any(
            os.path.getmtime(s) > os.path.getmtime(_BENCH_BIN) for s in srcs):
        cmd = ["gcc", "-O3", "-g", "-I" + _HERE, "-I" + _REF, *srcs,
               "-o", _BENCH_BIN, "-lpthread", "-lz"]
        if os.path.exists("/usr/include/libdeflate.h"):
            cmd.insert(1, "-DSVTREK_HAVE_LIBDEFLATE")
            cmd.append("-ldeflate")
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise ShimUnavailable(f"gcc failed:\n{proc.stderr}")
    return _BENCH_BIN


_SCANBENCH_BIN = os.path.join(_HERE, "scanbench")


def build_scanbench_bin() -> str:
    """Compile the MEASURED scan-mode baseline: the reference's own
    sliding_window_ins (sliding_window.c, unmodified) against the
    htslib-faithful real-file backend (htsio.c).  Returns the
    executable path (tests/refshim/scanbench)."""
    srcs = [os.path.join(_HERE, "scanbench_main.c"),
            os.path.join(_HERE, "htsio.c")]
    for s in _REF_SOURCES:
        srcs.append(os.path.join(_REF, s))
    for s in srcs:
        if not os.path.exists(s):
            raise ShimUnavailable(f"missing source {s}")
    if not os.path.exists(_SCANBENCH_BIN) or any(
            os.path.getmtime(s) > os.path.getmtime(_SCANBENCH_BIN)
            for s in srcs):
        cmd = ["gcc", "-O3", "-g", "-I" + _HERE, "-I" + _REF, *srcs,
               "-o", _SCANBENCH_BIN, "-lpthread", "-lz"]
        if os.path.exists("/usr/include/libdeflate.h"):
            cmd.insert(1, "-DSVTREK_HAVE_LIBDEFLATE")
            cmd.append("-ldeflate")
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise ShimUnavailable(f"gcc failed:\n{proc.stderr}")
    return _SCANBENCH_BIN


def write_reads_file(path: str, reads) -> None:
    """Serialize [(tid, pos, [(op, len), ...]), ...] for shim_load_reads."""
    n = len(reads)
    tids = np.asarray([r[0] for r in reads], np.int32)
    pos = np.asarray([r[1] for r in reads], np.int64)
    n_ops = np.asarray([len(r[2]) for r in reads], np.int32)
    off = (np.cumsum(n_ops, dtype=np.int64) - n_ops) if n else \
        np.empty(0, np.int64)
    words = []
    for _, _, cigar in reads:
        for op, ln in cigar:
            words.append((int(ln) << 4) | int(op))
    flat = np.asarray(words, np.uint32)
    with open(path, "wb") as fh:
        fh.write(np.int64(n).tobytes())
        fh.write(tids.tobytes())
        fh.write(pos.tobytes())
        fh.write(n_ops.tobytes())
        fh.write(off.tobytes())
        fh.write(flat.tobytes())


_DISC_SO = os.path.join(_HERE, "libdiscshim.so")
_DISC_SOURCES = ["discover.c", "utils.c", "init.c"]
_disc_lib = None


def load_disc() -> ctypes.CDLL:
    """Build + load the disc-mode parser shim (discover.c unmodified)."""
    global _disc_lib
    if _disc_lib is not None:
        return _disc_lib
    srcs = [os.path.join(_HERE, "disc_shim.c")] + [
        os.path.join(_REF, s) for s in _DISC_SOURCES]
    for s in srcs:
        if not os.path.exists(s):
            raise ShimUnavailable(f"missing source {s}")
    if not os.path.exists(_DISC_SO) or any(
            os.path.getmtime(s) > os.path.getmtime(_DISC_SO) for s in srcs):
        cmd = ["gcc", "-O2", "-g", "-fPIC", "-shared",
               "-I" + _HERE, "-I" + _REF, *srcs, "-o", _DISC_SO, "-lz"]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise ShimUnavailable(f"gcc failed:\n{proc.stderr}")
    lib = ctypes.CDLL(_DISC_SO)
    lib.disc_gfa.restype = ctypes.c_int
    lib.disc_gfa.argtypes = [ctypes.c_char_p]
    lib.disc_gaf.restype = ctypes.c_int
    lib.disc_gaf.argtypes = [ctypes.c_char_p]
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.disc_segments.restype = None
    lib.disc_segments.argtypes = [i64p, i32p, i32p, i32p, i64p]
    lib.disc_breakpoints.restype = None
    lib.disc_breakpoints.argtypes = [i32p, i32p, i32p, i32p, i32p]
    _disc_lib = lib
    return lib


def ref_parse_gfa(path: str):
    """Run the reference's parse_gfa; returns a list of dicts (or None
    on its error paths).  WARNING: invalid GFAs exit(1) the process —
    feed valid fixtures only, or call from a subprocess."""
    lib = load_disc()
    n = lib.disc_gfa(path.encode())
    if n < 0:
        return None
    ids = np.empty(n, np.int64)
    rank = np.empty(n, np.int32)
    start = np.empty(n, np.int32)
    end = np.empty(n, np.int32)
    nxt = np.empty(n, np.int64)
    lib.disc_segments(
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rank.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        start.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        end.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nxt.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return [dict(id=int(ids[i]), rank=int(rank[i]), start=int(start[i]),
                 end=int(end[i]),
                 next_id=(int(ids[nxt[i]]) if nxt[i] >= 0 else None))
            for i in range(n)]


def ref_parse_gaf(path: str):
    """Run the reference's parse_gaf against the last ref_parse_gfa
    graph; returns list of (readStart, readEnd, rc) per accepted read."""
    lib = load_disc()
    n = lib.disc_gaf(path.encode())
    rs = np.empty(n, np.int32)
    re_ = np.empty(n, np.int32)
    rc = np.empty(n, np.int32)
    off = np.empty(n, np.int32)
    typ = np.empty(n, np.int32)
    p = ctypes.POINTER(ctypes.c_int32)
    lib.disc_breakpoints(rs.ctypes.data_as(p), re_.ctypes.data_as(p),
                         rc.ctypes.data_as(p), off.ctypes.data_as(p),
                         typ.ctypes.data_as(p))
    return [(int(rs[i]), int(re_[i]), int(rc[i])) for i in range(n)]


_lib = None


def load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.lower_bound.argtypes = [i32p, ctypes.c_int, ctypes.c_int]
        lib.lower_bound.restype = ctypes.c_int
        lib.upper_bound.argtypes = [i32p, ctypes.c_int, ctypes.c_int]
        lib.upper_bound.restype = ctypes.c_int
        lib.consensus.argtypes = [i32p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int]
        lib.consensus.restype = ctypes.c_int
        lib.consensus_pos.argtypes = [i32p, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int]
        lib.consensus_pos.restype = ctypes.c_int
        lib.shim_set_reads.argtypes = [
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.shim_set_reads.restype = None
        lib.shim_refine.argtypes = [ctypes.c_int, ctypes.c_uint32,
                                    ctypes.c_uint32, ctypes.c_uint32,
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.shim_refine.restype = ctypes.c_int
        lib.shim_sliding_window.argtypes = [ctypes.c_uint32, ctypes.c_uint32,
                                            ctypes.c_int, ctypes.c_int,
                                            ctypes.c_int]
        lib.shim_sliding_window.restype = ctypes.c_int
        _lib = lib
    return _lib


def _as_i32(arr) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(arr, dtype=np.int32))


def ref_lower_bound(arr, location: int) -> int:
    a = _as_i32(arr)
    return load().lower_bound(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(a), location)


def ref_upper_bound(arr, location: int) -> int:
    a = _as_i32(arr)
    return load().upper_bound(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(a), location)


def ref_consensus(arr, min_count: int, interval: int) -> int:
    a = _as_i32(arr).copy()  # reference sorts in place
    return load().consensus(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(a),
        min_count, interval)


def ref_consensus_pos(locations, pos: int, min_count: int, interval: int,
                      interval_range: int) -> int:
    a = _as_i32(locations).copy()  # reference sorts in place
    return load().consensus_pos(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(a), pos,
        min_count, interval, interval_range)


def set_reads(reads) -> None:
    """Install the fake BAM store: reads = [(pos, [(op, len), ...]), ...]."""
    lib = load()
    n = len(reads)
    pos = np.zeros(n, dtype=np.int64)
    n_ops = np.zeros(n, dtype=np.int32)
    off = np.zeros(n, dtype=np.int64)
    words = []
    cur = 0
    for i, (p, cigar) in enumerate(reads):
        pos[i] = p
        n_ops[i] = len(cigar)
        off[i] = cur
        cur += len(cigar)
        for op, ln in cigar:
            words.append((int(ln) << 4) | int(op))
    flat = np.asarray(words or [0], dtype=np.uint32)
    lib.shim_set_reads(
        n,
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_ops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )


# which codes of shim_refine (tests/refshim/shim.c)
REFINE_DEL_START = 0
REFINE_DEL_END = 1
REFINE_POINT_INV = 2
REFINE_INS = 3


def ref_refine(which: int, inter_start: int, inter_end: int,
               imprecise_pos: int, min_count: int, interval: int,
               interval_range: int) -> int:
    return load().shim_refine(which, inter_start, inter_end, imprecise_pos,
                              min_count, interval, interval_range)


def ref_sliding_window(inter_start: int, inter_end: int, min_count: int,
                       window_size: int, slide_size: int) -> int:
    return load().shim_sliding_window(inter_start, inter_end, min_count,
                                      window_size, slide_size)
