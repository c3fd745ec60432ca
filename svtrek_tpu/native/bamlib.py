"""ctypes bindings for the native BAM reader and scalar baseline."""
from __future__ import annotations

import ctypes as ct
import os

import numpy as np

_LIB = None


def load_library():
    """Load (building on demand) the native library; None on failure."""
    global _LIB
    if _LIB is not None:
        return _LIB
    from .build import build

    path = build()
    if path is None or not os.path.exists(path):
        return None
    lib = ct.CDLL(path)
    lib.svbam_open.restype = ct.c_void_p
    lib.svbam_open.argtypes = [ct.c_char_p]
    lib.svbam_close.argtypes = [ct.c_void_p]
    lib.svbam_nref.restype = ct.c_int32
    lib.svbam_nref.argtypes = [ct.c_void_p]
    lib.svbam_fetch.restype = ct.c_int64
    lib.svbam_fetch.argtypes = [ct.c_void_p, ct.c_int32, ct.c_int64, ct.c_int64]
    for name, ty in [
        ("svbam_read_pos", ct.POINTER(ct.c_int64)),
        ("svbam_read_nops", ct.POINTER(ct.c_int32)),
        ("svbam_read_opoff", ct.POINTER(ct.c_int64)),
        ("svbam_ops", ct.POINTER(ct.c_uint8)),
        ("svbam_oplens", ct.POINTER(ct.c_int32)),
    ]:
        fn = getattr(lib, name)
        fn.restype = ty
        fn.argtypes = [ct.c_void_p]
    lib.svbam_total_ops.restype = ct.c_int64
    lib.svbam_total_ops.argtypes = [ct.c_void_p]
    lib.svbaseline_refine.restype = ct.c_int64
    lib.svbaseline_refine.argtypes = [
        ct.c_int32,
        ct.POINTER(ct.c_int64), ct.POINTER(ct.c_int32), ct.POINTER(ct.c_int64),
        ct.POINTER(ct.c_uint8), ct.POINTER(ct.c_int32),
        ct.c_int64, ct.c_int64, ct.c_int64, ct.c_int64,
        ct.c_int32, ct.c_int32, ct.c_int32,
    ]
    lib.svbaseline_consensus.restype = ct.c_int64
    lib.svbaseline_consensus.argtypes = [
        ct.POINTER(ct.c_int32), ct.c_int64, ct.c_int64,
        ct.c_int32, ct.c_int32, ct.c_int32,
    ]
    _LIB = lib
    return lib


class NativeBamReader:
    """Indexed BAM reader backed by the C library.

    fetch() mirrors the htslib iterator semantics (same contract as
    io.bam.BamReader.fetch) and returns python (pos, cigar) pairs;
    fetch_packed() returns the zero-copy-ish packed numpy arrays used by
    the device packer fast path.
    """

    def __init__(self, path: str):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.svbam_open(path.encode())
        if not self._h:
            raise IOError(f"svbam_open failed for {path}")

    def close(self):
        if self._h:
            self._lib.svbam_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def fetch_packed(self, tid: int, beg: int, end: int):
        """Returns (pos [R] i64, n_ops [R] i32, opoff [R] i64,
        ops [T] u8, lens [T] i32) — copies of the library's buffers."""
        n = self._lib.svbam_fetch(self._h, tid, beg, end)
        if n <= 0:
            return (np.empty(0, np.int64), np.empty(0, np.int32),
                    np.empty(0, np.int64), np.empty(0, np.uint8),
                    np.empty(0, np.int32))
        total = self._lib.svbam_total_ops(self._h)
        pos = np.ctypeslib.as_array(self._lib.svbam_read_pos(self._h), (n,)).copy()
        nops = np.ctypeslib.as_array(self._lib.svbam_read_nops(self._h), (n,)).copy()
        opoff = np.ctypeslib.as_array(self._lib.svbam_read_opoff(self._h), (n,)).copy()
        ops = np.ctypeslib.as_array(self._lib.svbam_ops(self._h), (total,)).copy()
        lens = np.ctypeslib.as_array(self._lib.svbam_oplens(self._h), (total,)).copy()
        return pos, nops, opoff, ops, lens

    def fetch(self, tid: int, beg: int, end: int):
        pos, nops, opoff, ops, lens = self.fetch_packed(tid, beg, end)
        out = []
        for r in range(len(pos)):
            o = int(opoff[r])
            n = int(nops[r])
            cig = list(zip(ops[o : o + n].tolist(), lens[o : o + n].tolist()))
            out.append(_Rec(int(pos[r]), cig))
        return out


class _Rec:
    """Minimal record shim matching the attrs the pipeline uses."""

    __slots__ = ("pos", "cigar")

    def __init__(self, pos, cigar):
        self.pos = pos
        self.cigar = cigar


def baseline_refine(lib, kind, reads_packed, istart, iend, ipos,
                    min_count, interval, range_):
    """Invoke the C scalar refine on packed arrays (bench baseline)."""
    pos, nops, opoff, ops, lens = reads_packed
    return lib.svbaseline_refine(
        kind,
        pos.ctypes.data_as(ct.POINTER(ct.c_int64)),
        nops.ctypes.data_as(ct.POINTER(ct.c_int32)),
        opoff.ctypes.data_as(ct.POINTER(ct.c_int64)),
        ops.ctypes.data_as(ct.POINTER(ct.c_uint8)),
        lens.ctypes.data_as(ct.POINTER(ct.c_int32)),
        len(pos), istart, iend, ipos, min_count, interval, range_,
    )
