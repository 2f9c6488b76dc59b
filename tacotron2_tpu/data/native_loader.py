"""ctypes bindings for the native (C++) batch WAV loader.

The preprocessing host path — decode WAV, PCM->float, downmix, reflect-pad,
pack padded batches — runs in a C++ thread pool (native/wavio.cc) when the
shared library is available; callers fall back to the pure-Python path
otherwise.  Build with ``native/build.sh`` (or it is built on demand if a
compiler is present).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libt2x_wavio.so"))

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _try_build() -> bool:
    script = os.path.join(_NATIVE_DIR, "build.sh")
    if not os.path.isfile(script):
        return False
    try:
        subprocess.run(["sh", script], check=True, capture_output=True,
                       timeout=120)
        return os.path.isfile(_LIB_PATH)
    except Exception:
        return False


def get_library() -> Optional[ctypes.CDLL]:
    """Load (building on demand) the native library; None if unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.isfile(_LIB_PATH) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.t2x_decode_wav.restype = ctypes.c_int64
    lib.t2x_decode_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32)]
    lib.t2x_decode_batch.restype = None
    lib.t2x_decode_batch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32]
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_library() is not None


def decode_wav(path: str) -> Tuple[np.ndarray, int]:
    """Decode one WAV with the native decoder. Raises if unavailable.

    The scratch buffer starts at half the file's byte size (exact for the
    common PCM16-mono case, 2-8x oversized for multi-channel/32-bit); if
    the decoder reports it too small (8-bit mono files), it retries once
    with the exact size — truncation cannot occur (the C side returns
    ``-needed`` instead of clamping)."""
    lib = get_library()
    if lib is None:
        raise RuntimeError("native loader not available")
    size = os.path.getsize(path) if os.path.isfile(path) else 0
    max_samples = max(size // 2, 64)
    rate = ctypes.c_int32(0)
    for _ in range(2):
        out = np.empty(max_samples, np.float32)
        n = lib.t2x_decode_wav(
            path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_samples, ctypes.byref(rate))
        if n > 0:
            return out[:n].copy(), int(rate.value)
        if n < 0:
            max_samples = -n
            continue
        break
    raise IOError(f"native WAV decode failed: {path}")


def decode_batch_padded(paths: Sequence[str], pad: int, total_len: int,
                        n_threads: int = 0
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Threaded decode of many WAVs into one reflect-padded batch.

    Returns (batch (N, total_len) float32, lengths (N,) int64 [0 = failed
    or didn't fit], rates (N,) int32).  Rows are reflect-padded by ``pad``
    on both sides (librosa center=True semantics) and zero-padded to
    ``total_len`` — exactly the layout
    :func:`tacotron2_tpu.dsp.mel.batched_log_mel_with_lengths` expects.
    """
    lib = get_library()
    if lib is None:
        raise RuntimeError("native loader not available")
    enc = [p.encode() for p in paths]
    offsets = np.zeros(len(enc), np.int64)
    pos = 0
    blob_parts: List[bytes] = []
    for i, e in enumerate(enc):
        offsets[i] = pos
        blob_parts.append(e + b"\0")
        pos += len(e) + 1
    blob = b"".join(blob_parts)

    n = len(paths)
    out = np.zeros((n, total_len), np.float32)
    lengths = np.zeros(n, np.int64)
    rates = np.zeros(n, np.int32)
    lib.t2x_decode_batch(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pad, total_len, n_threads)
    return out, lengths, rates
