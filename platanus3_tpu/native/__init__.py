"""Native (C++) data loader bindings via ctypes.

Builds ``libp3native.so`` from ``packer.cpp`` on first use (cached next to
the source; rebuilt when the source is newer).  Falls back silently to the
numpy parser in ``io/reads.py`` when no compiler is available -- the two
paths implement the same contract and are cross-checked by
``tests/test_native.py``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "packer.cpp")
_LIB = os.path.join(_DIR, "libp3native.so")

_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread",
           "-o", _LIB + ".tmp", _SRC]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=240)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if r.returncode != 0:
        return False
    os.replace(_LIB + ".tmp", _LIB)
    return True


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.p3_open.restype = ctypes.c_void_p
    lib.p3_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    for f in ("p3_num_chunks", "p3_num_reads", "p3_all_bases"):
        getattr(lib, f).restype = ctypes.c_uint64
        getattr(lib, f).argtypes = [ctypes.c_void_p]
    lib.p3_fill.restype = None
    lib.p3_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 7 + [
        ctypes.c_int]
    lib.p3_close.restype = None
    lib.p3_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def load_reads_native(path: str, k: int, chunk_len: int, threads: int = 8):
    """Parse + pack via the native library; None if unavailable.

    Returns a ``platanus3_tpu.io.reads.ReadBatch``.
    """
    lib = get_lib()
    if lib is None:
        return None
    from platanus3_tpu.io.reads import ReadBatch

    h = lib.p3_open(path.encode(), k, chunk_len)
    if not h:
        return None
    try:
        c = int(lib.p3_num_chunks(h))
        num_reads = int(lib.p3_num_reads(h))
        all_bases = int(lib.p3_all_bases(h))
        if c == 0:
            return ReadBatch(
                packed=np.zeros((1, chunk_len // 16), np.uint32),
                valid_len=np.zeros(1, np.int32),
                read_id=np.zeros(1, np.int32),
                start=np.zeros(1, np.int32),
                read_len=np.zeros(1, np.int32),
                prev_base=np.full(1, 4, np.uint8),
                next_base=np.full(1, 4, np.uint8),
                chunk_len=chunk_len, k=k, all_bases=all_bases,
                num_reads=num_reads)
        packed = np.empty((c, chunk_len // 16), np.uint32)
        valid_len = np.empty(c, np.int32)
        read_id = np.empty(c, np.int32)
        start = np.empty(c, np.int32)
        read_len = np.empty(c, np.int32)
        prev_base = np.empty(c, np.uint8)
        next_base = np.empty(c, np.uint8)
        ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
        lib.p3_fill(h, ptr(packed), ptr(valid_len), ptr(read_id),
                    ptr(start), ptr(read_len), ptr(prev_base),
                    ptr(next_base), threads)
        return ReadBatch(
            packed=packed, valid_len=valid_len, read_id=read_id,
            start=start, read_len=read_len, prev_base=prev_base,
            next_base=next_base, chunk_len=chunk_len, k=k,
            all_bases=all_bases, num_reads=num_reads)
    finally:
        lib.p3_close(h)
