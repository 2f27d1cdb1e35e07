"""ctypes bindings for the native host-pipeline library (native/fastpipe.cpp).

Lazily compiles ``libfastpipe.so`` with g++ on first use (no pybind11 in this
image — plain C ABI via ctypes) and caches it next to the source. All entry
points fall back to the numpy implementation in ``data/filters.py`` when the
toolchain or the build is unavailable, so the framework never hard-depends on
the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "fastpipe.cpp")
_SO = os.path.join(_NATIVE_DIR, "libfastpipe.so")


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", "-o", _SO, _SRC, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return _SO
    except (subprocess.SubprocessError, FileNotFoundError, OSError) as e:
        print(f"[fastpipe] native build unavailable ({e}); using numpy path")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    with _LIB_LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        so = _build()
        if so is None:
            _LIB_FAILED = True
            return None
        lib = ctypes.CDLL(so)
        lib.fastpipe_bandsplit_batch.restype = ctypes.c_int
        lib.fastpipe_bandsplit_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
        lib.fastpipe_matrix_batch.restype = ctypes.c_int
        lib.fastpipe_matrix_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
        lib.fastpipe_nifti_batch.restype = ctypes.c_int
        lib.fastpipe_nifti_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int]
        _LIB = lib
        return _LIB


def _pack_paths(paths: List[str]) -> Tuple[bytes, np.ndarray]:
    blobs = [p.encode() + b"\0" for p in paths]
    offsets = np.zeros(len(paths) + 1, dtype=np.int64)
    for i, b in enumerate(blobs):
        offsets[i + 1] = offsets[i] + len(b)
    return b"".join(blobs), offsets


def native_available() -> bool:
    return get_lib() is not None


def bandsplit_batch_native(
    paths: List[str], taps: np.ndarray, *, skip_tr: int = 20,
    t_max: int = 368, n_rois: int = 84, nthreads: int = 0,
) -> Optional[Dict[str, np.ndarray]]:
    """Parallel npy load + FIR band split + zscore + pad for a batch of
    subjects; returns dict of (n, t_max, n_rois) float32 ('raw'/'low'/
    'ultralow') + 'lengths', or None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    blob, offsets = _pack_paths(paths)
    taps = np.ascontiguousarray(taps, dtype=np.float64)
    raw = np.empty((n, t_max, n_rois), np.float32)
    low = np.empty((n, t_max, n_rois), np.float32)
    ul = np.empty((n, t_max, n_rois), np.float32)
    lengths = np.empty((n,), np.int32)
    errbuf = ctypes.create_string_buffer(512)
    rc = lib.fastpipe_bandsplit_batch(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        taps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(taps),
        skip_tr, t_max, n_rois,
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        low.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ul.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nthreads, errbuf, len(errbuf))
    if rc != 0:
        raise RuntimeError(f"fastpipe_bandsplit_batch: {errbuf.value.decode()}")
    return {"raw": raw, "low": low, "ultralow": ul, "lengths": lengths}


def nifti_batch_native(paths: List[str], shape: Tuple[int, ...],
                       nthreads: int = 0) -> Optional[np.ndarray]:
    """Parallel NIfTI-1 (.nii/.nii.gz) load for a batch of equally-shaped
    volumes; returns (n, *shape) float32 (C-order logical layout, matching
    np.stack over data/nifti.read_nifti items), or None when the native
    lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    blob, offsets = _pack_paths(paths)
    shape_arr = np.asarray(shape, dtype=np.int64)
    out = np.empty((n,) + tuple(int(s) for s in shape), np.float32)
    errbuf = ctypes.create_string_buffer(512)
    rc = lib.fastpipe_nifti_batch(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        shape_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(shape_arr), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nthreads, errbuf, len(errbuf))
    if rc != 0:
        raise RuntimeError(f"fastpipe_nifti_batch: {errbuf.value.decode()}")
    return out


def matrix_batch_native(paths: List[str], rows: int = 84, cols: int = 84,
                        nthreads: int = 0) -> Optional[np.ndarray]:
    """Parallel npy load + global zscore for (rows, cols) matrices."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    blob, offsets = _pack_paths(paths)
    out = np.empty((n, rows, cols), np.float32)
    errbuf = ctypes.create_string_buffer(512)
    rc = lib.fastpipe_matrix_batch(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        rows, cols, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nthreads, errbuf, len(errbuf))
    if rc != 0:
        raise RuntimeError(f"fastpipe_matrix_batch: {errbuf.value.decode()}")
    return out
