"""Native (C++) runtime components, loaded via ctypes.

Build happens transparently on first use (g++ -O3 -shared); if no compiler is
available the callers fall back to pure-numpy paths.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "frame_reader.cpp")
_LIB_PATH = os.path.join(_DIR, "libframereader.so")
_lock = threading.Lock()
_lib = None
_build_failed = False

_DTYPE_CODES = {
    np.dtype(np.float32): 0, np.dtype(np.float64): 1,
    np.dtype(np.int32): 2, np.dtype(np.uint16): 3, np.dtype(np.int16): 4,
}


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or \
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-pthread", _SRC, "-o", _LIB_PATH],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.read_frames.restype = ctypes.c_int
            lib.read_frames.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            _lib = lib
        except OSError:
            _build_failed = True
        return _lib


_CC_SRC = os.path.join(_DIR, "cc_interp.cpp")
_CC_LIB_PATH = os.path.join(_DIR, "libccinterp.so")
_cc_lib = None
_cc_build_failed = False


def _load_cc():
    global _cc_lib, _cc_build_failed
    with _lock:
        if _cc_lib is not None or _cc_build_failed:
            return _cc_lib
        if not os.path.exists(_CC_LIB_PATH) or \
                os.path.getmtime(_CC_LIB_PATH) < os.path.getmtime(_CC_SRC):
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-pthread", _CC_SRC, "-o", _CC_LIB_PATH],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                _cc_build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_CC_LIB_PATH)
            lib.interp_masked_cc.restype = ctypes.c_int
            lib.interp_masked_cc.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ]
            _cc_lib = lib
        except OSError:
            _cc_build_failed = True
        return _cc_lib


def interp_masked_rows(cc_rows: np.ndarray, mask_rows: np.ndarray,
                       n_threads: int = None) -> bool:
    """In-place periodic linear interpolation of masked entries, row-wise.

    cc_rows: C-contiguous float64 (n_rows, n_phi); mask_rows: bool/uint8 of
    the same shape (True = keep). Returns False if the native library is
    unavailable (caller falls back to numpy)."""
    lib = _load_cc()
    if lib is None:
        return False
    assert cc_rows.dtype == np.float64 and cc_rows.flags.c_contiguous
    m = np.ascontiguousarray(mask_rows, dtype=np.uint8)
    if n_threads is None:
        n_threads = min(32, os.cpu_count() or 1)
    lib.interp_masked_cc(
        cc_rows.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cc_rows.shape[0], cc_rows.shape[1], int(n_threads))
    return True


def read_frame_batch(paths, frame_shape, dtype=np.float32, n_threads=8,
                     out=None):
    """Read len(paths) raw frames into a (B, *frame_shape) float32 array with
    a C++ thread pool; numpy fallback if the native library is unavailable.
    → (batch, ok) where ok is a (B,) bool mask of successfully read frames
    (failed/short reads are zero-filled AND flagged, so callers exclude them
    from accumulation instead of averaging in zeros)."""
    frame_elems = int(np.prod(frame_shape))
    batch = out if out is not None else \
        np.empty((len(paths),) + tuple(frame_shape), dtype=np.float32)
    ok = np.zeros(len(paths), dtype=np.uint8)
    lib = _load()
    dtype = np.dtype(dtype)
    if lib is not None and dtype in _DTYPE_CODES:
        arr = (ctypes.c_char_p * len(paths))(
            *[os.fsencode(p) for p in paths])
        lib.read_frames(
            arr, len(paths),
            batch.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frame_elems, _DTYPE_CODES[dtype], int(n_threads),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return batch, ok.astype(bool)
    # fallback: sequential numpy reads
    for i, p in enumerate(paths):
        try:
            data = np.fromfile(p, dtype=dtype, count=frame_elems)
            if len(data) == frame_elems:
                batch[i] = data.reshape(frame_shape).astype(np.float32)
                ok[i] = 1
            else:
                batch[i] = 0
        except OSError:
            batch[i] = 0
    return batch, ok.astype(bool)


class PrefetchingFrameLoader:
    """Double-buffered batch iterator: the next batch is read by the C++
    thread pool while the current one is being consumed (on device)."""

    def __init__(self, paths, frame_shape, dtype=np.float32, batch_size=64,
                 n_threads=8):
        self.paths = list(paths)
        self.frame_shape = tuple(frame_shape)
        self.dtype = np.dtype(dtype)
        self.batch_size = int(batch_size)
        self.n_threads = int(n_threads)

    def __iter__(self):
        """Yields (batch, ok) pairs; ok flags frames that actually loaded."""
        import concurrent.futures as cf
        chunks = [self.paths[i: i + self.batch_size]
                  for i in range(0, len(self.paths), self.batch_size)]
        with cf.ThreadPoolExecutor(max_workers=1) as pool:
            pending = pool.submit(read_frame_batch, chunks[0],
                                  self.frame_shape, self.dtype,
                                  self.n_threads) if chunks else None
            for i in range(len(chunks)):
                batch, ok = pending.result()
                pending = pool.submit(
                    read_frame_batch, chunks[i + 1], self.frame_shape,
                    self.dtype, self.n_threads) \
                    if i + 1 < len(chunks) else None
                yield batch, ok
