"""Native (C++) IO runtime: parallel .npy reading.

The reference has no native code (SURVEY.md §2 native-code note) and
loads every case file through single-threaded ``np.load`` in a Python
loop (``src/dataset/cavity.py:15-34``) — at the real dataset's scale
(~13 GB across thousands of case dirs) that loop is the cold-start
bottleneck. This package compiles a small C++ thread-pool reader
(``npy_reader.cc``) on first use (g++ is a baked-in dependency; the
.so is cached next to the source and rebuilt when the source is
newer) and exposes:

- ``available()`` — True when the compiled library is usable;
- ``read_npy_f32(path)`` — one file → float32 ndarray;
- ``read_npy_f32_batch(paths, n_threads)`` — many files filled in
  parallel into preallocated arrays.

Scope matches the dataset exactly (npy v1/v2, '<f4'/'<f8', C-order);
anything else raises and callers fall back to ``np.load``
(``cfdbench_tpu.data.fast_io``). Binding is ctypes — no pybind11
dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_SRC = Path(__file__).parent / "npy_reader.cc"
_LIB_PATH = Path(__file__).parent / "_libcfdnpy.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_ERRORS = {
    1: "cannot open file",
    2: "bad npy magic",
    3: "unsupported/corrupt npy header",
    4: "unsupported dtype (only <f4/<f8)",
    5: "fortran-order arrays unsupported",
    6: "file shorter than header claims",
    7: "element count mismatch",
}


def _build() -> bool:
    cxx = os.environ.get("CXX", "g++")
    cmd = [
        cxx, "-O2", "-shared", "-fPIC", "-pthread", "-std=c++17",
        str(_SRC), "-o", str(_LIB_PATH),
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=120)
    except Exception:
        return False
    if proc.returncode != 0:
        return False
    return _LIB_PATH.exists()


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        stale = (
            not _LIB_PATH.exists()
            or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime
        )
        if stale and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            _build_failed = True
            return None
        lib.cfd_npy_header.restype = ctypes.c_int
        lib.cfd_npy_header.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.cfd_npy_read_f32.restype = ctypes.c_int
        lib.cfd_npy_read_f32.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.cfd_npy_read_f32_batch.restype = ctypes.c_int
        lib.cfd_npy_read_f32_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def npy_shape(path) -> tuple:
    """Header-only shape probe via the native parser."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    shape = (ctypes.c_int64 * 8)()
    ndim = ctypes.c_int()
    dsize = ctypes.c_int()
    rc = lib.cfd_npy_header(
        str(path).encode(), shape, ctypes.byref(ndim), ctypes.byref(dsize)
    )
    if rc != 0:
        raise ValueError(f"{path}: {_ERRORS.get(rc, rc)}")
    return tuple(shape[i] for i in range(ndim.value))


def read_npy_f32(path) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native library unavailable"
    shape = npy_shape(path)
    out = np.empty(shape, np.float32)
    rc = lib.cfd_npy_read_f32(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size,
    )
    if rc != 0:
        raise ValueError(f"{path}: {_ERRORS.get(rc, rc)}")
    return out


def read_npy_f32_batch(
    paths: Sequence, n_threads: int = 16
) -> List[np.ndarray]:
    """Read many .npy files in parallel (native thread pool).

    The pool is capped at the visible CPU count — oversubscription on
    small hosts costs more than it buys (measured 14× slower with 16
    threads on a 1-CPU box)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    n_threads = max(1, min(n_threads, os.cpu_count() or 1))
    n = len(paths)
    if n == 0:
        return []
    outs = [np.empty(npy_shape(p), np.float32) for p in paths]
    c_paths = (ctypes.c_char_p * n)(
        *[str(p).encode() for p in paths]
    )
    c_outs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for o in outs]
    )
    c_ns = (ctypes.c_int64 * n)(*[o.size for o in outs])
    c_rcs = (ctypes.c_int * n)()
    rc = lib.cfd_npy_read_f32_batch(
        c_paths, c_outs, c_ns, c_rcs, n, n_threads
    )
    if rc != 0:
        bad = [
            f"{paths[i]}: {_ERRORS.get(c_rcs[i], c_rcs[i])}"
            for i in range(n) if c_rcs[i] != 0
        ]
        raise ValueError("; ".join(bad[:5]))
    return outs
