"""ctypes bindings for the native FFmpeg video decode service.

Lazily builds ``video_decode.cc`` into ``libsfvideo.so`` with g++ on first
use; every entry point returns None when FFmpeg dev libraries or the
toolchain are unavailable, and callers fall back to the cv2 path in
``data/decoder.py``.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsfvideo.so")


def _build():
    # Build to a per-pid temp path and atomically rename: concurrent
    # DataLoader worker PROCESSES (the lock below is per-process only)
    # would otherwise interleave writes into one .so and corrupt it.
    src = os.path.join(_DIR, "video_decode.cc")
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
        "-o", tmp, "-lavformat", "-lavcodec", "-lavutil", "-lswscale",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, _SO)


def get_lib():
    """Load (building if needed) the native video decode library, or None."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB if _LIB is not False else None
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
                os.path.join(_DIR, "video_decode.cc")
            ):
                _build()
            lib = ctypes.CDLL(_SO)
            c_u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.svd_decode.argtypes = [
                c_u8p, ctypes.c_int64, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.svd_decode.restype = ctypes.c_void_p
            lib.svd_decode2.argtypes = [
                c_u8p, ctypes.c_int64, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.c_double, ctypes.c_double,
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.svd_decode2.restype = ctypes.c_void_p
            lib.svd_result_free.argtypes = [ctypes.c_void_p]
            lib.svd_result_data.argtypes = [ctypes.c_void_p]
            lib.svd_result_data.restype = ctypes.c_void_p
            lib.svd_result_index.argtypes = [ctypes.c_void_p]
            lib.svd_result_index.restype = ctypes.c_void_p
            for name in ("svd_result_n", "svd_result_w", "svd_result_h"):
                getattr(lib, name).argtypes = [ctypes.c_void_p]
                getattr(lib, name).restype = ctypes.c_int
            lib.svd_result_fps.argtypes = [ctypes.c_void_p]
            lib.svd_result_fps.restype = ctypes.c_double
            lib.svd_result_nb_frames.argtypes = [ctypes.c_void_p]
            lib.svd_result_nb_frames.restype = ctypes.c_int64
            lib.svd_probe.argtypes = [
                c_u8p, ctypes.c_int64, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.svd_probe.restype = ctypes.c_int
            _LIB = lib
        except Exception:
            _LIB = False
            return None
        return _LIB


def _src_args(source):
    if isinstance(source, (bytes, bytearray)):
        buf = np.frombuffer(source, dtype=np.uint8)
        return (
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(source),
            None,
            buf,  # keepalive
        )
    return None, 0, os.fsencode(source), None


def probe(source):
    """(fps, nb_frames, width, height) for a path or bytes, or None."""
    lib = get_lib()
    if lib is None:
        return None
    mem, size, path, keep = _src_args(source)
    fps = ctypes.c_double()
    nb = ctypes.c_int64()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.svd_probe(mem, size, path, ctypes.byref(fps), ctypes.byref(nb),
                       ctypes.byref(w), ctypes.byref(h))
    del keep
    if rc != 0:
        return None
    return fps.value, int(nb.value), int(w.value), int(h.value)


class DecodedWindows:
    """Zero-copy view over a native decode result.

    ``data``/``frame_idx`` alias the C-owned buffer: consume (slice /
    fancy-index, which copies only the sampled frames) then ``close()``.
    Host memcpy bandwidth is the loader bottleneck on small hosts, so the
    full (N,H,W,3) buffer is never duplicated wholesale.
    """

    def __init__(self, lib, res):
        self._lib = lib
        self._res = res
        n = lib.svd_result_n(res)
        w = lib.svd_result_w(res)
        h = lib.svd_result_h(res)
        self.fps = lib.svd_result_fps(res)
        self.nb_frames = int(lib.svd_result_nb_frames(res))
        self.data = np.ctypeslib.as_array(
            ctypes.cast(lib.svd_result_data(res),
                        ctypes.POINTER(ctypes.c_uint8)),
            shape=(n, h, w, 3),
        )
        self.frame_idx = np.ctypeslib.as_array(
            ctypes.cast(lib.svd_result_index(res),
                        ctypes.POINTER(ctypes.c_int64)),
            shape=(n,),
        )

    def close(self):
        if self._res is not None:
            self.data = None
            self.frame_idx = None
            self._lib.svd_result_free(self._res)
            self._res = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        self.close()


def decode_windows_view(source, windows, short_side=0, wanted=None, crop=None):
    """Decode frame-index windows from a path or in-memory bytes.

    One packet sweep covers all windows (the reference's multi-clip
    single-pass, slowfast/datasets/decoder.py:228-370). ``windows`` is a
    list of (start_idx, end_idx) floats in the frame-index domain; an
    empty list decodes the whole video.

    ``wanted`` (sorted unique int frame indices): emit only the first
    decoded frame at-or-after each target — the linspace temporal
    sampling pushed down into C, skipping the sws_scale of frames the
    sampler would drop.

    ``crop`` = (crop_w, crop_h, fx, fy): fuse the random crop into the
    decode-time scale (one sws_scale from the matching source
    sub-rectangle to exactly crop_w x crop_h; fx/fy in [0,1] place the
    crop). Requires short_side > 0. Falls back silently to the plain
    scaled output for unsupported pixel formats — check the result dims.

    Returns a DecodedWindows (caller must close) or None on failure.
    """
    lib = get_lib()
    if lib is None:
        return None
    mem, size, path, keep = _src_args(source)
    flat = np.ascontiguousarray(
        np.asarray(windows, dtype=np.float64).reshape(-1)
    )
    err = ctypes.c_int()
    wanted_ptr, n_wanted, wkeep = None, 0, None
    if wanted is not None and len(wanted):
        wkeep = np.ascontiguousarray(np.asarray(wanted, dtype=np.int64))
        wanted_ptr = wkeep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        n_wanted = len(wkeep)
    cw, ch, fx, fy = (0, 0, 0.0, 0.0) if crop is None else crop
    res = lib.svd_decode2(
        mem, size, path,
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(windows), int(short_side),
        wanted_ptr, n_wanted, int(cw), int(ch), float(fx), float(fy),
        ctypes.byref(err),
    )
    del keep, wkeep
    if not res:
        return None
    return DecodedWindows(lib, res)


def decode_windows(source, windows, short_side=0):
    """Copying variant of decode_windows_view.

    Returns (frames uint8 (N,H,W,3), frame_idx int64 (N,), fps,
    nb_frames) or None on failure.
    """
    view = decode_windows_view(source, windows, short_side=short_side)
    if view is None:
        return None
    with view:
        return (
            view.data.copy(), view.frame_idx.copy(), view.fps,
            view.nb_frames,
        )
