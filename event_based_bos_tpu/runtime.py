"""ctypes bindings for the native C++ host runtime (``native/ebt_runtime.cpp``).

Provides memory-speed implementations of the host-side event-stream paths
(timestamp search, padded window extraction, exact BAF / hot-pixel filters,
Prophesee EVT3 .raw decoding).  Falls back to numpy transparently when the
shared library is unavailable; ``ensure_built()`` compiles it on demand with
the in-image toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libebt_runtime.so")
_lib: Optional[ctypes.CDLL] = None


def ensure_built(force: bool = False) -> bool:
    """Build the shared library if missing; returns availability."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception as e:  # noqa: BLE001
        logger.warning("native runtime build failed: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not ensure_built():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64, i32, f32, f64, u8, u16, i16 = (
        ctypes.c_int64, ctypes.c_int32, ctypes.c_float, ctypes.c_double,
        ctypes.c_uint8, ctypes.c_uint16, ctypes.c_int16)
    P = ctypes.POINTER
    lib.ebt_searchsorted_i32.restype = i64
    lib.ebt_searchsorted_i32.argtypes = [P(i32), i64, i32]
    lib.ebt_searchsorted_f64.restype = i64
    lib.ebt_searchsorted_f64.argtypes = [P(f64), i64, f64]
    lib.ebt_window_padded.restype = i64
    lib.ebt_window_padded.argtypes = [P(i16), P(i16), P(i32), P(u8),
                                      i64, i64, i64,
                                      P(f32), P(f32), P(f32), P(f32), P(u8)]
    lib.ebt_baf_filter.restype = None
    lib.ebt_baf_filter.argtypes = [P(f64), i64, i64, i64, f64, i64, i64,
                                   P(f64), P(u8)]
    lib.ebt_hot_pixel_filter.restype = None
    lib.ebt_hot_pixel_filter.argtypes = [P(f64), i64, i64, i64, f64,
                                         P(i32), P(u8)]
    lib.ebt_decode_evt3.restype = i64
    lib.ebt_decode_evt3.argtypes = [P(u16), i64, i64, P(i16), P(i16),
                                    P(i32), P(u8)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def searchsorted(t: np.ndarray, query) -> int:
    """First index with ``t[i] >= query`` (native when possible)."""
    lib = _load()
    if lib is None or not t.flags.c_contiguous:
        return int(np.searchsorted(t, query))
    if t.dtype == np.int32:
        return int(lib.ebt_searchsorted_i32(_ptr(t, ctypes.c_int32), len(t),
                                            int(query)))
    if t.dtype == np.float64:
        return int(lib.ebt_searchsorted_f64(_ptr(t, ctypes.c_double), len(t),
                                            float(query)))
    return int(np.searchsorted(t, query))


def window_padded(x: np.ndarray, y: np.ndarray, t: np.ndarray, p: np.ndarray,
                  i0: int, i1: int, capacity: int):
    """Extract events [i0, i1) into padded float32 SoA (x/y swap, µs→s).

    Returns ``(out_x, out_y, out_t, out_p, valid, n_live)``; numpy fallback
    mirrors the native path exactly.
    """
    lib = _load()
    out = [np.empty(capacity, np.float32) for _ in range(4)]
    valid = np.empty(capacity, np.uint8)
    if (lib is not None and x.dtype == np.int16 and y.dtype == np.int16
            and t.dtype == np.int32 and p.dtype == np.uint8):
        n = lib.ebt_window_padded(
            _ptr(x, ctypes.c_int16), _ptr(y, ctypes.c_int16),
            _ptr(t, ctypes.c_int32), _ptr(p, ctypes.c_uint8),
            int(i0), int(i1), int(capacity),
            _ptr(out[0], ctypes.c_float), _ptr(out[1], ctypes.c_float),
            _ptr(out[2], ctypes.c_float), _ptr(out[3], ctypes.c_float),
            _ptr(valid, ctypes.c_uint8))
        return (*out, valid, int(n))
    n = min(i1 - i0, capacity)
    for buf in out:
        buf[:] = 0
    valid[:] = 0
    out[0][:n] = y[i0:i0 + n]
    out[1][:n] = x[i0:i0 + n]
    out[2][:n] = t[i0:i0 + n] * 1e-6
    out[3][:n] = p[i0:i0 + n]
    valid[:n] = 1
    return (*out, valid, int(n))


def baf_filter(events: np.ndarray, image_shape: Tuple[int, int], dt: float,
               ksize: int = 1, num_support: int = 1,
               time_map: Optional[np.ndarray] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Exact sequential BAF; returns (keep_mask bool, time_map)."""
    h, w = image_shape
    ev = np.ascontiguousarray(events, np.float64)
    if time_map is None:
        time_map = np.zeros((h, w), np.float64)
    keep = np.empty(len(ev), np.uint8)
    lib = _load()
    if lib is not None:
        lib.ebt_baf_filter(_ptr(ev, ctypes.c_double), len(ev), h, w,
                           float(dt), int(ksize), int(num_support),
                           _ptr(time_map, ctypes.c_double),
                           _ptr(keep, ctypes.c_uint8))
        return keep.astype(bool), time_map
    # numpy fallback (slow, exact)
    for i, e in enumerate(ev):
        x = min(max(int(e[0]), 0), h - 1)
        y = min(max(int(e[1]), 0), w - 1)
        ts = e[2]
        time_map[x, y] = max(time_map[x, y], ts)
        win = time_map[max(0, x - ksize):min(h, x + ksize + 1),
                       max(0, y - ksize):min(w, y + ksize + 1)].ravel()
        k = min(num_support, win.size - 1)
        last = np.partition(win, win.size - 1 - k)[win.size - 1 - k]
        keep[i] = (ts - last) < dt
    return keep.astype(bool), time_map


def hot_pixel_filter(events: np.ndarray, image_shape: Tuple[int, int],
                     thresh: float) -> np.ndarray:
    """Hot-pixel keep mask (native when possible)."""
    h, w = image_shape
    ev = np.ascontiguousarray(events, np.float64)
    lib = _load()
    if lib is not None:
        count = np.zeros((h, w), np.int32)
        keep = np.empty(len(ev), np.uint8)
        lib.ebt_hot_pixel_filter(_ptr(ev, ctypes.c_double), len(ev), h, w,
                                 float(thresh), _ptr(count, ctypes.c_int32),
                                 _ptr(keep, ctypes.c_uint8))
        return keep.astype(bool)
    xi = np.clip(ev[:, 0].astype(int), 0, h - 1)
    yi = np.clip(ev[:, 1].astype(int), 0, w - 1)
    count = np.zeros((h, w), np.int64)
    np.add.at(count, (xi, yi), 1)
    return count[xi, yi] <= thresh


def decode_evt3(raw: bytes, capacity: Optional[int] = None) -> dict:
    """Decode a Prophesee EVT3 .raw payload into the HDF5-equivalent SoA.

    The reference cannot read .raw directly (``ccs.py:19-20`` disables the
    Metavision path); this decoder removes that offline-conversion step.
    Skips the ASCII header (lines starting with ``%``).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable — build native/ first")
    # strip header
    offset = 0
    while raw[offset:offset + 1] == b"%":
        nl = raw.index(b"\n", offset)
        offset = nl + 1
    payload = np.frombuffer(raw, np.uint16, offset=offset + (len(raw) - offset) % 2 * 0)
    payload = np.frombuffer(raw[offset + ((len(raw) - offset) % 2):], np.uint16) \
        if (len(raw) - offset) % 2 else np.frombuffer(raw, np.uint16,
                                                      offset=offset)
    cap = capacity or len(payload) * 12  # generous upper bound
    out_x = np.empty(cap, np.int16)
    out_y = np.empty(cap, np.int16)
    out_t = np.empty(cap, np.int32)
    out_p = np.empty(cap, np.uint8)
    n = lib.ebt_decode_evt3(_ptr(np.ascontiguousarray(payload), ctypes.c_uint16),
                            len(payload), cap,
                            _ptr(out_x, ctypes.c_int16),
                            _ptr(out_y, ctypes.c_int16),
                            _ptr(out_t, ctypes.c_int32),
                            _ptr(out_p, ctypes.c_uint8))
    return {"x": out_x[:n], "y": out_y[:n], "t": out_t[:n],
            "p": out_p[:n].astype(bool)}
