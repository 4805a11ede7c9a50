"""Native (C++) host-side ingest kernels with transparent numpy fallback.

Builds ``native/libingest.so`` on first use (g++ -O3), exposing the
per-utterance CPU hot spots of corpus export — RMS silence trim, mu-law
encode, peak normalization — as ctypes calls over shared numpy buffers.
The reference's equivalent work runs as Python/numpy inside DataLoader
worker processes (reference src/dataset/vctk_dataset.py:102-152).

Public API mirrors the numpy versions and is used by data/audio.py when
available; `available()` reports whether the native path is active.
"""
import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libingest.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "ingest.cpp")

_lib = None
_tried = False


def _build():
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC",
         "-o", _SO_PATH, _SRC_PATH],
        check=True, capture_output=True)


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.isfile(_SO_PATH)
                or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)):
            _build()
        lib = ctypes.CDLL(_SO_PATH)
        lib.rms_trim_bounds.restype = ctypes.c_int
        lib.rms_trim_bounds.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.mu_law_encode.restype = None
        lib.mu_law_encode.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32)]
        lib.peak_normalize.restype = ctypes.c_float
        lib.peak_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        # tempo/win_ms/tol_ms cross as doubles: wsola_time_stretch_native
        # sizes the output buffer from float64 arithmetic, and the C++ side
        # must reproduce the exact same n_frames (a float32-degraded tempo
        # can truncate to one MORE frame and write past the buffer)
        lib.wsola_time_stretch.restype = ctypes.c_int64
        lib.wsola_time_stretch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_double,
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rms_trim_bounds(y: np.ndarray, frame_length: int = 2048,
                    hop_length: int = 512, top_db: float = 20.0):
    """(start, end) sample bounds of the non-silent region."""
    lib = _load()
    y = np.ascontiguousarray(y, np.float32)
    if lib is None:
        from vqvae_speech_tpu.data.audio import trim_silence

        _, bounds = trim_silence(y, top_db, frame_length, hop_length)
        return bounds
    start = ctypes.c_int64()
    end = ctypes.c_int64()
    lib.rms_trim_bounds(_fptr(y), y.size, frame_length, hop_length,
                        ctypes.c_float(top_db), ctypes.byref(start),
                        ctypes.byref(end))
    return int(start.value), int(end.value)


def mu_law_encode_native(x: np.ndarray, mu: int = 256) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    if lib is None:
        import jax.numpy as jnp
        from vqvae_speech_tpu.ops.mu_law import mu_law_encode

        return np.asarray(mu_law_encode(jnp.asarray(x), mu))
    out = np.empty(x.shape, np.int32)
    lib.mu_law_encode(_fptr(x), x.size, mu,
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def peak_normalize(x: np.ndarray) -> np.ndarray:
    """Returns a peak-normalized copy."""
    lib = _load()
    x = np.ascontiguousarray(x, np.float32).copy()
    if lib is None:
        peak = np.abs(x).max()
        return x / peak if peak > 0 else x
    lib.peak_normalize(_fptr(x), x.size)
    return x


def wsola_time_stretch_native(x: np.ndarray, tempo: float,
                              sample_rate: int = 16000,
                              win_ms: float = 25.0, tol_ms: float = 7.5):
    """Native WSOLA; returns None when the native lib is unavailable (the
    caller falls back to the numpy implementation in data/noise_injector)."""
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    N = max(int(round(win_ms * sample_rate / 1000.0)) & ~1, 4)
    if abs(tempo - 1.0) < 1e-6 or x.size <= N:
        return x.copy()
    Hs = N // 2
    Ha = Hs * tempo
    tol = max(int(round(tol_ms * sample_rate / 1000.0)), 1)
    n_frames = max(int((x.size - N - tol) / Ha), 1)
    out = np.zeros((n_frames - 1) * Hs + N, np.float32)
    produced = lib.wsola_time_stretch(
        _fptr(x), x.size, ctypes.c_double(tempo), sample_rate,
        ctypes.c_double(win_ms), ctypes.c_double(tol_ms), _fptr(out))
    if produced < 0:
        return x.copy()
    return out[:produced]
