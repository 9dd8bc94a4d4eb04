"""ctypes bindings for the native data-path library (native/mft_native.cpp).

Loaded lazily and entirely optional: every entry point has a numpy
fallback, so the framework runs without the .so (build it with
``make -C native``). Set MFT_NATIVE_LIB to an explicit path, or
MFT_DISABLE_NATIVE=1 to force the fallbacks.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB = None
_TRIED = False


def _candidates():
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return [
        os.environ.get("MFT_NATIVE_LIB", ""),
        os.path.join(here, "native", "libmft_native.so"),
        os.path.join(os.getcwd(), "native", "libmft_native.so"),
    ]


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("MFT_DISABLE_NATIVE"):
        return None
    for path in _candidates():
        if path and os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                lib.mft_native_version.restype = ctypes.c_int32
                if lib.mft_native_version() >= 1:
                    _configure(lib)
                    _LIB = lib
                    break
            except OSError:
                continue
    return _LIB


def _configure(lib) -> None:
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.gather_pad.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, i64p, i64p, i64p,
        ctypes.c_int32, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
    ]
    lib.gather_pad.restype = None
    lib.dirichlet_partition.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_double, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.dirichlet_partition.restype = None
    lib.read_idx.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), i64p,
        ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.read_idx.restype = ctypes.c_int32


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------


def gather_pad(src: np.ndarray, client_indices: List[np.ndarray],
               n_max: int, num_threads: int = 0) -> np.ndarray:
    """Stack dataset rows into [C, n_max, ...] with zero padding.

    Uses the multithreaded native path when available, else numpy.
    """
    c = len(client_indices)
    out_shape = (c, n_max) + src.shape[1:]
    lib = _load()
    if lib is None or not src.flags.c_contiguous:
        out = np.zeros(out_shape, dtype=src.dtype)
        for i, ix in enumerate(client_indices):
            out[i, : len(ix)] = src[ix]
        return out

    out = np.empty(out_shape, dtype=src.dtype)
    row_bytes = int(src.dtype.itemsize * np.prod(src.shape[1:], dtype=np.int64)) \
        if src.ndim > 1 else src.dtype.itemsize
    counts = np.array([len(ix) for ix in client_indices], np.int64)
    offsets = np.zeros(c, np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    flat_idx = (np.concatenate(client_indices).astype(np.int64)
                if counts.sum() else np.zeros(0, np.int64))
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.gather_pad(
        src.ctypes.data_as(ctypes.c_void_p), row_bytes,
        flat_idx.ctypes.data_as(i64p), offsets.ctypes.data_as(i64p),
        counts.ctypes.data_as(i64p), c, n_max,
        out.ctypes.data_as(ctypes.c_void_p), num_threads,
    )
    return out


def dirichlet_assign(labels: np.ndarray, num_clients: int, alpha: float,
                     seed: int) -> Optional[np.ndarray]:
    """Per-sample client assignment via the native partitioner (or None)."""
    lib = _load()
    if lib is None:
        return None
    labels32 = np.ascontiguousarray(labels, np.int32)
    out = np.empty(len(labels32), np.int32)
    lib.dirichlet_partition(
        labels32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(labels32), int(labels32.max()) + 1, num_clients,
        float(alpha), seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def read_idx(path: str) -> Optional[np.ndarray]:
    """Parse an IDX file natively (or None if the lib is unavailable)."""
    lib = _load()
    if lib is None:
        return None
    ndim = ctypes.c_int32(0)
    dims = (ctypes.c_int64 * 4)()
    rc = lib.read_idx(path.encode(), ctypes.byref(ndim), dims, None, 0)
    if rc != 0:
        raise OSError(f"read_idx({path}) failed: {rc}")
    shape = tuple(dims[i] for i in range(ndim.value))
    out = np.empty(shape, np.uint8)
    rc = lib.read_idx(path.encode(), ctypes.byref(ndim), dims,
                      out.ctypes.data_as(ctypes.c_void_p), out.size)
    if rc != 0:
        raise OSError(f"read_idx({path}) payload failed: {rc}")
    return out
