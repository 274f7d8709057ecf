"""Native host-side data kernels (ctypes-loaded C, built on first use).

The TPU compute path is JAX/XLA/Pallas; the host input pipeline around it
uses this small native layer for the per-sample work that Python does slowly
on the data-loading core: WAV PCM decode with mono downmix, the int16
round-trip quantisation, and pad/truncate collation. Python fallbacks are
kept in :mod:`audio_residual_tpu.data.datasets` — everything degrades
gracefully if no C compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "pcm16_to_float32_mono", "quantize_roundtrip", "pad_or_truncate"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_wavio.so")
_LIB = None


def _build() -> bool:
    src = os.path.join(_DIR, "wavio.c")
    try:
        subprocess.run(
            ["gcc", "-O3", "-shared", "-fPIC", "-o", _SO, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) and not _build():
        _LIB = False
        return False
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _LIB = False
        return False
    lib.wav_pcm16_to_float32_mono.restype = ctypes.c_long
    lib.wav_pcm16_to_float32_mono.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.quantize_roundtrip_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.POINTER(ctypes.c_float),
    ]
    lib.pad_or_truncate_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return bool(_load())


def pcm16_to_float32_mono(raw: bytes, channels: int) -> np.ndarray:
    lib = _load()
    data = np.frombuffer(raw, dtype=np.int16)
    n_frames = len(data) // channels
    if not lib:
        x = data.reshape(-1, channels).astype(np.float32) / 32768.0
        return x.mean(axis=1)
    out = np.empty(n_frames, np.float32)
    lib.wav_pcm16_to_float32_mono(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        n_frames, channels, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def quantize_roundtrip(x: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    if not lib:
        return (np.clip(x, -1, 1) * 32767.0).astype(np.int16).astype(np.float32) / 32767.0
    out = np.empty_like(x)
    lib.quantize_roundtrip_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def pad_or_truncate(x: np.ndarray, target_len: int) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    if not lib:
        out = np.zeros(target_len, np.float32)
        out[: min(len(x), target_len)] = x[:target_len]
        return out
    out = np.empty(target_len, np.float32)
    lib.pad_or_truncate_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), target_len,
    )
    return out
