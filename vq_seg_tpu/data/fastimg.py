"""ctypes bindings for the native PNG decode/resample path (_fastimg.c).

The shared library is built on first use with the system compiler (libpng
and zlib are standard on the image) and cached under
``~/.cache/vq_seg_tpu/`` keyed by a hash of the C source, so editing the
source triggers a rebuild.  Every entry point degrades gracefully: if the
compiler, libpng, or the build is unavailable, ``load()`` returns None and
``dataset._load_pair`` stays on its PIL path.

ctypes foreign calls release the GIL, so the Loader's decode thread pool
scales with host cores through this module (PIL releases it only inside
zlib chunks).  Set ``VQ_SEG_NO_FASTIMG=1`` to force the PIL path.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_fastimg.c")
_lock = threading.Lock()
_lib = None
_tried = False

_u8p = ctypes.POINTER(ctypes.c_ubyte)
_f32p = ctypes.POINTER(ctypes.c_float)
_i32p = ctypes.POINTER(ctypes.c_int)


_FLAG_SETS = (
    # -march=native is safe: the .so is built and cached per host
    ["-O3", "-march=native", "-fPIC", "-shared"],
    ["-O3", "-fPIC", "-shared"],  # fallback for compilers without it
)


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        src = f.read()
    cache = os.path.join(os.path.expanduser("~"), ".cache", "vq_seg_tpu")
    for flags in _FLAG_SETS:
        tag = hashlib.sha256(src + " ".join(flags).encode()).hexdigest()[:16]
        so = os.path.join(cache, f"_fastimg_{tag}.so")
        if os.path.exists(so):
            return so
        os.makedirs(cache, exist_ok=True)
        tmp = so + f".tmp{os.getpid()}"
        for cc in ("cc", "gcc", "g++"):
            try:
                r = subprocess.run(
                    [cc, *flags, _SRC, "-o", tmp, "-ldeflate", "-lpng", "-lm"],
                    capture_output=True, timeout=120)
            except (OSError, subprocess.TimeoutExpired):
                continue
            if r.returncode == 0:
                os.replace(tmp, so)  # atomic vs concurrent builders
                return so
        try:
            os.unlink(tmp)
        except OSError:
            pass
    return None


def load():
    """The loaded CDLL, building if needed; None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("VQ_SEG_NO_FASTIMG"):
            return None
        try:
            so = _build()
            if so is None:
                return None
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.fi_decode.argtypes = [ctypes.c_char_p, ctypes.POINTER(_u8p),
                                  _i32p, _i32p, _i32p]
        lib.fi_decode.restype = ctypes.c_int
        lib.fi_free.argtypes = [_u8p]
        lib.fi_free.restype = None
        lib.fi_resize_bilinear_f32.argtypes = [
            _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.fi_resize_bilinear_f32.restype = ctypes.c_int
        lib.fi_resize_nearest_gray_u8.argtypes = [
            _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _u8p, ctypes.c_int, ctypes.c_int]
        lib.fi_resize_nearest_gray_u8.restype = ctypes.c_int
        lib.fi_to_rgb_f32.argtypes = [_u8p, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, _f32p]
        lib.fi_to_rgb_f32.restype = ctypes.c_int
        lib.fi_to_gray_u8.argtypes = [_u8p, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, _u8p]
        lib.fi_to_gray_u8.restype = ctypes.c_int
        _lib = lib
        return _lib


class _Decoded:
    """RAII holder for a decoded buffer (fi_free on gc)."""

    __slots__ = ("lib", "ptr", "h", "w", "c")

    def __init__(self, lib, ptr, h, w, c):
        self.lib, self.ptr, self.h, self.w, self.c = lib, ptr, h, w, c

    def __del__(self):
        if self.ptr:
            self.lib.fi_free(self.ptr)
            self.ptr = None


def _decode(lib, path: str) -> _Decoded | None:
    data = _u8p()
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    if lib.fi_decode(path.encode(), ctypes.byref(data), ctypes.byref(h),
                     ctypes.byref(w), ctypes.byref(c)) != 0:
        return None
    return _Decoded(lib, data, h.value, w.value, c.value)


def load_rgb_f32(path: str, resize=None) -> np.ndarray | None:
    """PNG -> float32 HWC RGB in [0,1]; PIL-convention BILINEAR when
    ``resize=(w, h)`` is given (PIL size order).  None on any failure."""
    lib = load()
    if lib is None:
        return None
    d = _decode(lib, path)
    if d is None:
        return None
    if resize is None:
        out = np.empty((d.h, d.w, 3), np.float32)
        lib.fi_to_rgb_f32(d.ptr, d.h, d.w, d.c, out.ctypes.data_as(_f32p))
        return out
    ow, oh = int(resize[0]), int(resize[1])
    out = np.empty((oh, ow, 3), np.float32)
    rc = lib.fi_resize_bilinear_f32(d.ptr, d.h, d.w, d.c,
                                    out.ctypes.data_as(_f32p), oh, ow, 3)
    return out if rc == 0 else None


def load_gray_u8(path: str, resize=None) -> np.ndarray | None:
    """PNG -> uint8 HW (PIL convert("L")); NEAREST resize for masks."""
    lib = load()
    if lib is None:
        return None
    d = _decode(lib, path)
    if d is None:
        return None
    if resize is None:
        out = np.empty((d.h, d.w), np.uint8)
        lib.fi_to_gray_u8(d.ptr, d.h, d.w, d.c, out.ctypes.data_as(_u8p))
        return out
    ow, oh = int(resize[0]), int(resize[1])
    out = np.empty((oh, ow), np.uint8)
    rc = lib.fi_resize_nearest_gray_u8(d.ptr, d.h, d.w, d.c,
                                       out.ctypes.data_as(_u8p), oh, ow)
    return out if rc == 0 else None
