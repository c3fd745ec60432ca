"""Native (C) fast paths: BGZF/BAM/BAI region fetch.

The reference's entire I/O backend is native (htslib; SURVEY.md §2.13).
This package holds the framework's own C implementation, loaded via
ctypes, with a graceful fallback to the pure-Python io/ stack when the
shared library has not been built (build with `python -m
svtrek_tpu.native.build`).
"""
from __future__ import annotations


def native_bam_reader(path: str):
    """Return a native-backed BAM reader, or None if unavailable."""
    try:
        from .bamlib import NativeBamReader, load_library
    except Exception:
        return None
    if load_library() is None:
        return None
    try:
        return NativeBamReader(path)
    except Exception:
        return None
