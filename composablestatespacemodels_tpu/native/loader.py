"""ctypes bindings for the native IO tier, with build-on-first-use.

The shared library is compiled once into the package directory (falling
back to a per-user cache dir if the package is not writable) and loaded
with ctypes -- no pybind11, no build-system dependency beyond a C++
compiler (SURVEY.md environment: g++ is available, pybind11 is not).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import tempfile
from typing import Optional

import numpy as np

_HERE = pathlib.Path(__file__).parent
_SRC = _HERE / "fastio.cpp"
_LIB_NAME = "libcssm_fastio.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


class _TsData(ctypes.Structure):
    _fields_ = [("ts", ctypes.POINTER(ctypes.c_double)),
                ("ys", ctypes.POINTER(ctypes.c_double)),
                ("mask", ctypes.POINTER(ctypes.c_ubyte)),
                ("n", ctypes.c_long),
                ("capacity", ctypes.c_long)]


def _build(target: pathlib.Path) -> bool:
    """Compile to a temp file and atomically rename into place: a fresh
    inode means a later ``dlopen`` is NOT served the stale cached handle
    (glibc dedupes by pathname/inode), an in-place rewrite can't corrupt
    the mapping of another live process, and two concurrent rebuilds
    resolve to whichever rename lands last."""
    tmp = target.with_name(f".{target.name}.{os.getpid()}.tmp")
    for cc in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(tmp)],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, target)
            return True
        except (OSError, subprocess.SubprocessError):
            tmp.unlink(missing_ok=True)
            continue
    return False


def _try_load(lib_path: pathlib.Path) -> Optional[ctypes.CDLL]:
    """Load and sanity-check the export surface (None if stale/unloadable)."""
    try:
        lib = ctypes.CDLL(str(lib_path))
    except OSError:
        return None
    if not hasattr(lib, "cssm_write_matrix_csv"):
        return None  # prebuilt library older than fastio.cpp
    return lib


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True

    candidates = [_HERE / _LIB_NAME,
                  pathlib.Path(tempfile.gettempdir())
                  / f"cssm_fastio_{os.getuid()}" / _LIB_NAME]
    lib = None
    for cand in candidates:
        if cand.exists():
            lib = _try_load(cand)
            if lib is not None:
                break
        # absent, unloadable, or stale: (re)build this candidate; on
        # failure (e.g. read-only package dir) fall through to the next
        try:
            cand.parent.mkdir(parents=True, exist_ok=True)
        except OSError:
            continue
        if _build(cand):
            lib = _try_load(cand)
            if lib is not None:
                break
    if lib is None:
        return None

    lib.cssm_parse_timeseries_csv.restype = ctypes.POINTER(_TsData)
    lib.cssm_parse_timeseries_csv.argtypes = [ctypes.c_char_p]
    lib.cssm_parse_timeseries_json.restype = ctypes.POINTER(_TsData)
    lib.cssm_parse_timeseries_json.argtypes = [ctypes.c_char_p]
    lib.cssm_free_tsdata.argtypes = [ctypes.POINTER(_TsData)]
    lib.cssm_write_timeseries_csv.restype = ctypes.c_int
    lib.cssm_write_timeseries_csv.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_long]
    lib.cssm_write_matrix_csv.restype = ctypes.c_int
    lib.cssm_write_matrix_csv.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_long, ctypes.c_long]
    _lib = lib
    return _lib


def available() -> bool:
    """True if the native tier compiled and loaded."""
    return _load() is not None


def _extract(ptr):
    lib = _load()
    d = ptr.contents
    n = int(d.n)
    ts = np.ctypeslib.as_array(d.ts, shape=(n,)).copy()
    ys = np.ctypeslib.as_array(d.ys, shape=(n,)).copy()
    mask = np.ctypeslib.as_array(d.mask, shape=(n,)).astype(bool).copy()
    lib.cssm_free_tsdata(ptr)
    return ts, ys, mask


def parse_timeseries_csv(path: str):
    """Native CSV parse -> (ts, ys, mask) numpy arrays, or None if the
    native tier is unavailable / the file can't be opened."""
    lib = _load()
    if lib is None:
        return None
    ptr = lib.cssm_parse_timeseries_csv(str(path).encode())
    if not ptr:
        return None
    return _extract(ptr)


def parse_timeseries_json(path: str):
    lib = _load()
    if lib is None:
        return None
    ptr = lib.cssm_parse_timeseries_json(str(path).encode())
    if not ptr:
        return None
    return _extract(ptr)


def write_timeseries_csv(path: str, ts, ys, mask) -> bool:
    lib = _load()
    if lib is None:
        return False
    ts = np.ascontiguousarray(np.asarray(ts, dtype=np.float64))
    ys = np.ascontiguousarray(np.asarray(ys, dtype=np.float64))
    mask = np.ascontiguousarray(np.asarray(mask).astype(np.uint8))
    return lib.cssm_write_timeseries_csv(str(path).encode(), ts, ys, mask,
                                         len(ts)) == 0


def write_matrix_csv(path: str, header: str, vals) -> bool:
    """Native dense-matrix CSV writer for posterior chains (the hot path
    of the reference JsonToCSV app, DetermineParameters.scala:90-101 /
    Streaming.jsonToCSV, Streaming.scala:148-161)."""
    lib = _load()
    if lib is None:
        return False
    vals = np.ascontiguousarray(np.asarray(vals, dtype=np.float64))
    rows, cols = vals.shape
    return lib.cssm_write_matrix_csv(str(path).encode(), header.encode(),
                                     vals, rows, cols) == 0
