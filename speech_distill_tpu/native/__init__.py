"""Native C++ audio kernels: build-on-first-use + ctypes bindings.

The compiled .so is cached next to the source; set SDT_NATIVE=0 to force
the pure-numpy fallbacks (speech_distill_tpu/audio/*). Every native path
has a numpy twin and tests assert they agree.
"""
from __future__ import annotations

import ctypes
import math
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "audio_kernels.cc")
_LIB_PATH = os.path.join(_HERE, "libsdt_audio.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        if (os.path.exists(_LIB_PATH)
                and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
            return True
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _LIB_PATH + ".tmp"],
            check=True, capture_output=True)
        os.replace(_LIB_PATH + ".tmp", _LIB_PATH)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("SDT_NATIVE", "1") == "0":
        return None
    if not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.resample_f32.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_int32]
    lib.volume_normalize_f32.argtypes = [f32p, ctypes.c_int64,
                                         ctypes.c_float]
    lib.fbank_frames_f32.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, ctypes.c_int32, f32p, ctypes.c_int64]
    _lib = lib
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resample_native(audio: np.ndarray, orig_freq: int,
                    new_freq: int) -> Optional[np.ndarray]:
    """Native path for audio.resample.resample (1-D input)."""
    lib = get_lib()
    if lib is None or audio.ndim != 1:
        return None
    from speech_distill_tpu.audio.resample import _kernel
    kernels, width = _kernel(orig_freq, new_freq)
    gcd = math.gcd(orig_freq, new_freq)
    orig = orig_freq // gcd
    new = new_freq // gcd
    x = np.ascontiguousarray(audio, np.float32)
    out_len = int(math.ceil(new_freq * len(x) / orig_freq))
    out = np.zeros((out_len,), np.float32)
    kern = np.ascontiguousarray(kernels, np.float32)
    lib.resample_f32(_ptr(x), len(x), _ptr(kern), kern.shape[0],
                     kern.shape[1], orig, width, _ptr(out), out_len,
                     os.cpu_count() or 1)
    return out


def volume_normalize_native(audio: np.ndarray,
                            coeff: float = 0.1) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(audio, np.float32).copy()
    lib.volume_normalize_f32(_ptr(x), len(x), coeff)
    return x


def fbank_frames_native(audio: np.ndarray, window: np.ndarray, hop: int,
                        preemph: float = 0.97,
                        remove_dc: bool = True) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(audio, np.float32)
    w = np.ascontiguousarray(window, np.float32)
    win = len(w)
    n_frames = 1 + (len(x) - win) // hop if len(x) >= win else 0
    out = np.zeros((max(n_frames, 0), win), np.float32)
    if n_frames > 0:
        lib.fbank_frames_f32(_ptr(x), len(x), _ptr(w), win, hop,
                             preemph, int(remove_dc), _ptr(out), n_frames)
    return out
