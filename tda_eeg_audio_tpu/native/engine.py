"""ctypes binding + on-demand build of the native persistence engine.

Roles (mirroring the reference's use of the ripser C++ library,
scripts/utils.py:11): host fallback for device-kernel overflow windows, fast
oracle for tests, and the compute path for CPU-only environments.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SO = _HERE / "libtda_engine.so"
_LOCK = threading.Lock()
_LIB = None


def _build() -> None:
    src = _HERE / "tda_engine.cpp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", str(_SO), str(src), "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)


def _lib():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not _SO.exists() or _SO.stat().st_mtime < (_HERE / "tda_engine.cpp").stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_SO))
        lib.rips_persistence_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.rips_persistence_batch.restype = None
        _LIB = lib
        return lib


def rips_persistence_batch(dm: np.ndarray, thresh: float = 2.0,
                           max_bars: int = 256,
                           n_threads: int | None = None) -> dict:
    """Exact H0+H1 persistence for a batch of distance matrices.

    dm: (B, n, n) float32.  Returns dict of padded diagram arrays matching the
    device kernel's output convention.
    """
    dm = np.ascontiguousarray(dm, dtype=np.float32)
    B, n, _ = dm.shape
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)
    h1_b = np.zeros((B, max_bars), np.float32)
    h1_d = np.zeros((B, max_bars), np.float32)
    h1_count = np.zeros(B, np.int32)
    h0_deaths = np.zeros((B, n - 1), np.float32)
    h0_count = np.zeros(B, np.int32)
    h0_ess = np.zeros(B, np.int32)
    h1_ess = np.zeros(B, np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    _lib().rips_persistence_batch(
        dm.ctypes.data_as(fp), B, n, thresh, max_bars, n_threads,
        h1_b.ctypes.data_as(fp), h1_d.ctypes.data_as(fp),
        h1_count.ctypes.data_as(ip), h0_deaths.ctypes.data_as(fp),
        h0_count.ctypes.data_as(ip), h0_ess.ctypes.data_as(ip),
        h1_ess.ctypes.data_as(ip))
    k = np.arange(max_bars)[None, :]
    mask = k < h1_count[:, None]
    h0k = np.arange(n - 1)[None, :]
    h0_mask = h0k < h0_count[:, None]
    deaths = np.where(mask, h1_d, 0.0)
    return dict(births=np.where(mask, h1_b, 0.0), deaths=deaths, mask=mask,
                n_essential=h1_ess, h0_deaths=np.where(h0_mask, h0_deaths, np.inf),
                h0_mask=h0_mask, n_tree=(n - h0_ess).astype(np.int32),
                overflow=np.zeros(B, bool))


def wasserstein_batch(b1: np.ndarray, d1: np.ndarray, m1: np.ndarray,
                      b2: np.ndarray, d2: np.ndarray, m2: np.ndarray,
                      n_threads: int | None = None) -> np.ndarray:
    """Exact persim-semantics Wasserstein for batched padded diagram pairs.

    Masks select finite bars; valid bars must be a prefix or are compacted
    here.  Empty diagrams use the (0,0) sentinel (reference safe_wasserstein).
    """
    lib = _lib()
    if not hasattr(lib, "_wass_ready"):
        lib.wasserstein_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.wasserstein_batch.restype = None
        lib._wass_ready = True

    def compact(b, d, m):
        B, K = b.shape
        order = np.argsort(~m, axis=1, kind="stable")
        bs = np.take_along_axis(b, order, 1).astype(np.float32)
        ds = np.take_along_axis(d, order, 1).astype(np.float32)
        counts = m.sum(1).astype(np.int32)
        return np.ascontiguousarray(bs), np.ascontiguousarray(ds), counts

    b1c, d1c, c1 = compact(b1, d1, m1)
    b2c, d2c, c2 = compact(b2, d2, m2)
    B = len(b1c)
    out = np.zeros(B, np.float32)
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.wasserstein_batch(
        b1c.ctypes.data_as(fp), d1c.ctypes.data_as(fp), c1.ctypes.data_as(ip),
        b1c.shape[1], b2c.ctypes.data_as(fp), d2c.ctypes.data_as(fp),
        c2.ctypes.data_as(ip), b2c.shape[1], B, n_threads,
        out.ctypes.data_as(fp))
    return out
