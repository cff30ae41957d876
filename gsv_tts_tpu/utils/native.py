"""ctypes bridge to the optional C++ host-DSP library (``native/``).

The library accelerates the irregular host-side algorithms (SOLA
cross-correlation search, monotonic Viterbi, polyphase resampling).  When the
shared object has not been built, every entry point degrades to the numpy
implementation at the call site (``native_lib()`` returns None).
Build: ``cmake -S native -B native/build && cmake --build native/build``
or ``make -C native``.
"""
from __future__ import annotations

import ctypes
import os
from functools import lru_cache
from typing import Optional

import numpy as np

_LIB_NAMES = ("libgsv_native.so", "gsv_native.so")


class _NativeLib:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.gsv_sola_offset.restype = ctypes.c_int64
        lib.gsv_sola_offset.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.gsv_viterbi_monotonic.restype = None
        lib.gsv_viterbi_monotonic.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        self._has_envelope = hasattr(lib, "gsv_envelope_follow")
        if self._has_envelope:
            lib.gsv_envelope_follow.restype = None
            lib.gsv_envelope_follow.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_float, ctypes.c_float,
                ctypes.POINTER(ctypes.c_float),
            ]
        self._has_freeverb = hasattr(lib, "gsv_freeverb")
        if self._has_freeverb:
            lib.gsv_freeverb.restype = None
            lib.gsv_freeverb.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_double, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double),
            ]

    def sola_offset(self, query: np.ndarray, key: np.ndarray, overlap_len: int) -> int:
        query = np.ascontiguousarray(query, np.float32)
        key = np.ascontiguousarray(key, np.float32)
        if len(key) < overlap_len:
            return 0
        return int(self._lib.gsv_sola_offset(
            query.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), overlap_len,
            key.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(key)))

    def viterbi_monotonic(self, probs: np.ndarray) -> np.ndarray:
        probs = np.ascontiguousarray(probs, np.float32)
        t, n = probs.shape
        out = np.zeros(t, np.int64)
        self._lib.gsv_viterbi_monotonic(
            probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return out

    def envelope_follow(self, level: np.ndarray, att: float,
                        rel: float) -> np.ndarray:
        """Attack/release one-pole level detector (compressor ballistics);
        None-able: callers must check ``hasattr`` (older built libraries may
        predate the symbol)."""
        level = np.ascontiguousarray(level, np.float32)
        out = np.empty_like(level)
        self._lib.gsv_envelope_follow(
            level.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(level),
            ctypes.c_float(att), ctypes.c_float(rel),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out


    def freeverb(self, x: np.ndarray, comb_delays, ap_delays,
                 feedback: float, damp: float) -> np.ndarray:
        """Freeverb wet path (8 damped combs + 4 JUCE allpass sections) as
        O(1)/sample delay lines — ~1000x the dense-lfilter fallback.
        None-able: callers must check ``_has_freeverb``."""
        x = np.ascontiguousarray(x, np.float32)
        cds = np.ascontiguousarray(comb_delays, np.int64)
        ads = np.ascontiguousarray(ap_delays, np.int64)
        out = np.empty(len(x), np.float64)
        self._lib.gsv_freeverb(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
            cds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(cds),
            ads.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(ads),
            ctypes.c_double(feedback), ctypes.c_double(damp),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out


@lru_cache(maxsize=1)
def native_lib() -> Optional[_NativeLib]:
    if os.environ.get("GSV_DISABLE_NATIVE"):
        return None
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = []
    for name in _LIB_NAMES:
        candidates += [
            os.path.join(root, "native", "build", name),
            os.path.join(root, "native", name),
            os.path.join(os.path.dirname(os.path.abspath(__file__)), name),
        ]
    for path in candidates:
        if os.path.exists(path):
            try:
                return _NativeLib(ctypes.CDLL(path))
            except OSError:
                continue
    return None
