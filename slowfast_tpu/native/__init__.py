"""Native host-side components (C++): the batch JPEG decode service.

Built lazily with g++ on first use; falls back to cv2 when the toolchain
or libjpeg is unavailable.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsfdecode.so")


def _build():
    # Temp + atomic rename: concurrent worker processes building the same
    # output path would corrupt the .so (the lock is per-process only).
    src = os.path.join(_DIR, "decode.cc")
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
        "-o", tmp, "-ljpeg", "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, _SO)


def get_lib():
    """Load (building if needed) the native decode library, or None."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB if _LIB is not False else None
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
                os.path.join(_DIR, "decode.cc")
            ):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.sf_decode_init.argtypes = [ctypes.c_int]
            lib.sf_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.sf_decode_batch.restype = ctypes.c_int
            lib.sf_probe.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.sf_probe.restype = ctypes.c_int
            # Thread count defaults to the host's CPUs: oversubscribing a
            # small host REGRESSES (8 pool threads on 1 CPU measured 2.3x
            # slower than sequential cv2; 1 thread beats cv2 by ~10-20%).
            default_threads = max(1, min(os.cpu_count() or 1, 8))
            lib.sf_decode_init(
                int(os.environ.get("SF_DECODE_THREADS", default_threads))
            )
            _LIB = lib
            return lib
        except Exception:
            _LIB = False
            return None


def probe_jpeg(path):
    """(h, w) of a JPEG, or None."""
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.sf_probe(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def decode_jpeg_batch(paths, height, width):
    """Decode JPEG files into one (N, H, W, 3) uint8 RGB array.

    Returns None on any failure (caller falls back to cv2).
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, height, width, 3), np.uint8)
    results = (ctypes.c_int * n)()
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.sf_decode_batch(
        c_paths,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        height,
        width,
        results,
    )
    if failures:
        return None
    return out
