"""ctypes bindings for the native audio runtime (native/sopro_audio.cpp).

Builds on demand with `make -C native` (g++ is part of the image toolchain);
every entry point has a numpy/scipy fallback so the pure-Python path keeps
working where no compiler is available. `SOPRO_NATIVE=0` disables the
native path entirely.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsopro_audio.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if os.environ.get("SOPRO_NATIVE", "1") == "0":
        return None
    with _LIB_LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_LIB_PATH) and os.path.exists(
            os.path.join(_NATIVE_DIR, "Makefile")
        ):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s"],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        u = ctypes.c_size_t
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
        lib.sopro_f32_to_pcm16.argtypes = [f32p, i16p, u]
        lib.sopro_pcm16_to_f32.argtypes = [i16p, f32p, u]
        lib.sopro_resample_out_len.restype = u
        lib.sopro_resample_out_len.argtypes = [u, ctypes.c_int, ctypes.c_int]
        lib.sopro_resample_poly_f32.argtypes = [
            f32p, u, ctypes.c_int, ctypes.c_int, f32p,
        ]
        lib.sopro_trim_silence_bounds.restype = ctypes.c_int
        lib.sopro_trim_silence_bounds.argtypes = [
            f32p, u, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_size_t),
        ]
        if hasattr(lib, "sopro_decode_file"):  # older cached .so lacks it
            lib.sopro_decode_file.restype = ctypes.c_int
            lib.sopro_decode_file.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.sopro_buf_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def f32_to_pcm16(wav: np.ndarray) -> np.ndarray:
    wav = np.ascontiguousarray(wav, np.float32).ravel()
    lib = _load()
    if lib is None:
        return np.round(np.clip(wav, -1.0, 1.0) * 32767.0).astype(np.int16)
    out = np.empty(wav.shape, np.int16)
    lib.sopro_f32_to_pcm16(wav, out, wav.size)
    return out


def pcm16_to_f32(pcm: np.ndarray) -> np.ndarray:
    pcm = np.ascontiguousarray(pcm, np.int16).ravel()
    lib = _load()
    if lib is None:
        return pcm.astype(np.float32) / 32768.0
    out = np.empty(pcm.shape, np.float32)
    lib.sopro_pcm16_to_f32(pcm, out, pcm.size)
    return out


def resample_poly(wav: np.ndarray, up: int, down: int) -> np.ndarray:
    """Kaiser-windowed polyphase resampling; same filter family/alignment as
    scipy.signal.resample_poly(window=("kaiser", 5.0))."""
    wav = np.ascontiguousarray(wav, np.float32).ravel()
    lib = _load()
    if lib is None:
        from scipy.signal import resample_poly as sp

        return sp(wav.astype(np.float64), up, down).astype(np.float32)
    n_out = lib.sopro_resample_out_len(wav.size, up, down)
    out = np.empty(n_out, np.float32)
    lib.sopro_resample_poly_f32(wav, wav.size, up, down, out)
    return out


def decode_file(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """Decode a compressed audio file (mp3 via the system libmpg123, ogg
    vorbis via libvorbisfile — dlopen'd at runtime, no build deps) to
    (mono float32 [S], sr). Returns None when the native lib, the codec
    library, or the format is unavailable; raises ValueError for a file the
    decoder recognized but could not decode."""
    lib = _load()
    if lib is None or not hasattr(lib, "sopro_decode_file"):
        return None
    buf = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_size_t()
    sr = ctypes.c_int()
    rc = lib.sopro_decode_file(
        path.encode(), ctypes.byref(buf), ctypes.byref(n), ctypes.byref(sr)
    )
    if rc == 2:  # codec library not installed on this system
        return None
    if rc != 0:
        return None
    try:
        out = np.ctypeslib.as_array(buf, shape=(n.value,)).astype(np.float32)
    finally:
        lib.sopro_buf_free(buf)
    return out, int(sr.value)


def trim_silence_bounds(
    wav: np.ndarray, sr: int,
    frame_ms: float = 25.0, hop_ms: float = 10.0,
    thresh_db_floor: float = -40.0, prepad_ms: float = 30.0,
    postpad_ms: float = 30.0, min_keep_sec: float = 0.5,
) -> Optional[Tuple[int, int]]:
    """[start, end) bounds per the reference VAD, or None to keep all.
    Returns None as well when the native lib is unavailable (callers fall
    back to the numpy implementation in audio.py)."""
    lib = _load()
    if lib is None:
        return None
    wav = np.ascontiguousarray(wav, np.float32).ravel()
    s, e = ctypes.c_size_t(), ctypes.c_size_t()
    ok = lib.sopro_trim_silence_bounds(
        wav, wav.size, int(sr), frame_ms, hop_ms, thresh_db_floor,
        prepad_ms, postpad_ms, min_keep_sec, ctypes.byref(s), ctypes.byref(e),
    )
    if not ok:
        return (0, wav.size)
    return (int(s.value), int(e.value))
