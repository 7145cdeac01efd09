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
    for cc in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(target)],
                check=True, capture_output=True, timeout=120)
            return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True

    candidates = [_HERE / _LIB_NAME,
                  pathlib.Path(tempfile.gettempdir())
                  / f"cssm_fastio_{os.getuid()}" / _LIB_NAME]
    lib_path = None
    for cand in candidates:
        if cand.exists():
            lib_path = cand
            break
    if lib_path is None:
        for cand in candidates:
            try:
                cand.parent.mkdir(parents=True, exist_ok=True)
                if _build(cand):
                    lib_path = cand
                    break
            except OSError:
                continue
    if lib_path is None:
        return None

    try:
        lib = ctypes.CDLL(str(lib_path))
    except OSError:
        return None

    # a stale prebuilt library (older than fastio.cpp's export surface)
    # is rebuilt in place
    if not hasattr(lib, "cssm_write_matrix_csv"):
        if not _build(lib_path):
            return None
        try:
            lib = ctypes.CDLL(str(lib_path))
        except OSError:
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
    """Native dense-matrix CSV writer (posterior chains)."""
    lib = _load()
    if lib is None:
        return False
    vals = np.ascontiguousarray(np.asarray(vals, dtype=np.float64))
    rows, cols = vals.shape
    return lib.cssm_write_matrix_csv(str(path).encode(), header.encode(),
                                     vals, rows, cols) == 0
