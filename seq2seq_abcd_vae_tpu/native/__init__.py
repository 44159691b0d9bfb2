"""ctypes bindings for the native data-loading runtime (libwavseg.so).

Builds lazily with make on first use; every entry point degrades to the
pure-Python path when the toolchain or library is unavailable, so the
framework never hard-depends on the native component.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libwavseg.so")
_lock = threading.Lock()
_lib = None
_tried = False


class _WavInfo(ctypes.Structure):
    _fields_ = [("sample_rate", ctypes.c_int32),
                ("channels", ctypes.c_int32),
                ("bits_per_sample", ctypes.c_int32),
                ("format", ctypes.c_int32),
                ("num_frames", ctypes.c_int64)]


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.isfile(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.wavseg_info.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(_WavInfo)]
        lib.wavseg_info.restype = ctypes.c_int
        lib.wavseg_read.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_int64]
        lib.wavseg_read.restype = ctypes.c_int
        lib.wavseg_read_i16.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                        ctypes.POINTER(ctypes.c_int16),
                                        ctypes.c_int64]
        lib.wavseg_read_i16.restype = ctypes.c_int
        lib.wavseg_assemble_i16.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int16),
            ctypes.c_int64, ctypes.c_int32]
        lib.wavseg_assemble_i16.restype = None
        lib.wavseg_assemble.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int32]
        lib.wavseg_assemble.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def read_wav(path: str, channel: int = 0):
    """Decode one channel via the native reader.

    PCM16 files stay int16 (exact, and half the host->device transfer;
    the device frontend casts — matching the reference's astype(float32),
    data_utils.py:94); float wavs come back float32.  Returns
    (sample_rate, samples) or None when the caller should fall back to
    scipy."""
    lib = get_lib()
    if lib is None:
        return None
    info = _WavInfo()
    if lib.wavseg_info(path.encode(), ctypes.byref(info)) != 0:
        return None
    if info.format == 1 and info.bits_per_sample == 16:
        out = np.empty(info.num_frames, np.int16)
        rc = lib.wavseg_read_i16(
            path.encode(), channel,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            info.num_frames)
    else:
        out = np.empty(info.num_frames, np.float32)
        rc = lib.wavseg_read(
            path.encode(), channel,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            info.num_frames)
    if rc != 0:
        return None
    return int(info.sample_rate), out


def assemble_batch(wavs: list[np.ndarray], onsets: np.ndarray,
                   offsets: np.ndarray, pad: int, out: np.ndarray,
                   num_threads: int = 4) -> bool:
    """Fill the pre-zeroed (B, L) batch buffer (float32 or int16) with
    centered segments, multithreaded in C++. Returns False if
    unavailable or on a dtype mismatch."""
    lib = get_lib()
    if lib is None:
        return False
    if out.dtype == np.int16:
        ctype, fn = ctypes.c_int16, lib.wavseg_assemble_i16
    elif out.dtype == np.float32:
        ctype, fn = ctypes.c_float, lib.wavseg_assemble
    else:
        return False
    if any(w.dtype != out.dtype for w in wavs):
        return False
    n = len(wavs)
    ptrs = (ctypes.POINTER(ctype) * n)(*[
        w.ctypes.data_as(ctypes.POINTER(ctype)) for w in wavs])
    on = np.ascontiguousarray(onsets, np.int64)
    off = np.ascontiguousarray(offsets, np.int64)
    fn(ptrs, on.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
       off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
       np.int32(n), np.int64(pad),
       out.ctypes.data_as(ctypes.POINTER(ctype)),
       np.int64(out.shape[1]), np.int32(num_threads))
    return True
