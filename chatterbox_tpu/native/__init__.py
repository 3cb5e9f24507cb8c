"""ctypes binding for the native audiokit (libaudiokit.so).

Loads the shared library if present, builds it with `make` on first use if a
toolchain is available, and degrades to None so pure-Python fallbacks take
over (audio/pcm.py chooses the implementation).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libaudiokit.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "libaudiokit.so"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ck_float_to_pcm16.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.POINTER(ctypes.c_int16)]
        lib.ck_pcm16_to_float.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
        lib.ck_crossfade_mix.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
        lib.ck_resample_poly.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float)]
        lib.ck_resample_poly.restype = ctypes.c_int64
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def float_to_pcm16(audio: np.ndarray) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(audio, dtype=np.float32)
    out = np.empty(x.shape[0], dtype=np.int16)
    lib.ck_float_to_pcm16(_fptr(x), x.shape[0], out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
    return out.tobytes()


def crossfade_mix(prev_tail: np.ndarray, cur_head: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(prev_tail, dtype=np.float32)
    b = np.ascontiguousarray(cur_head, dtype=np.float32)
    out = np.empty(a.shape[0], dtype=np.float32)
    lib.ck_crossfade_mix(_fptr(a), _fptr(b), a.shape[0], _fptr(out))
    return out


def resample_poly(audio: np.ndarray, up: int, down: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(audio, dtype=np.float32)
    n_out = (x.shape[0] * up + down - 1) // down
    out = np.empty(n_out + 1, dtype=np.float32)
    written = lib.ck_resample_poly(_fptr(x), x.shape[0], up, down, _fptr(out))
    return out[:written]
