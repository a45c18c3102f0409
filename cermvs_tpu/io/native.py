"""ctypes bindings for the native data-path runtime (native/dataio.cpp).

Provides C++ implementations of the host-side hot path — PFM codec and
multithreaded resampling — with automatic build-on-first-use and graceful
fallback (callers check :func:`available` or use the ``*_or_fallback``
wrappers in ``cermvs_tpu.io`` / ``cermvs_tpu.data.augment``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libcermvs_dataio.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.pfm_read_header.argtypes = [ctypes.c_char_p, i32p, i32p, i32p,
                                    ctypes.POINTER(ctypes.c_float)]
    lib.pfm_read_header.restype = ctypes.c_int
    lib.pfm_read_data.argtypes = [ctypes.c_char_p, f32p]
    lib.pfm_read_data.restype = ctypes.c_int
    lib.pfm_write.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int, ctypes.c_int]
    lib.pfm_write.restype = ctypes.c_int
    for name in ("resize_bilinear", "resize_nearest"):
        fn = getattr(lib, name)
        fn.argtypes = [f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                       f32p, ctypes.c_int, ctypes.c_int]
        fn.restype = None
    lib.scale_and_crop.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, f32p]
    lib.scale_and_crop.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_pfm(path) -> np.ndarray:
    lib = _load()
    assert lib is not None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    s = ctypes.c_float()
    rc = lib.pfm_read_header(str(path).encode(), ctypes.byref(w),
                             ctypes.byref(h), ctypes.byref(c), ctypes.byref(s))
    if rc != 0:
        raise IOError(f"pfm_read_header({path}) -> {rc}")
    shape = (h.value, w.value) if c.value == 1 else (h.value, w.value, 3)
    out = np.empty(shape, np.float32)
    rc = lib.pfm_read_data(str(path).encode(), _fptr(out))
    if rc != 0:
        raise IOError(f"pfm_read_data({path}) -> {rc}")
    return out


def write_pfm(path, image: np.ndarray) -> None:
    lib = _load()
    assert lib is not None
    if image.dtype != np.float32 or image.ndim != 2:
        raise ValueError("native write_pfm: HxW float32 only")
    image = np.ascontiguousarray(image)
    rc = lib.pfm_write(str(path).encode(), _fptr(image),
                       image.shape[1], image.shape[0])
    if rc != 0:
        raise IOError(f"pfm_write({path}) -> {rc}")


def resize(img: np.ndarray, oh: int, ow: int, nearest: bool = False
           ) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float32)
    if img.ndim == 2:
        h, w = img.shape
        c = 1
        out = np.empty((oh, ow), np.float32)
    else:
        h, w, c = img.shape
        out = np.empty((oh, ow, c), np.float32)
    fn = lib.resize_nearest if nearest else lib.resize_bilinear
    fn(_fptr(img), h, w, c, _fptr(out), oh, ow)
    return out


def scale_and_crop(frames: np.ndarray, rh: int, rw: int, y0: int, x0: int,
                   ch: int, cw: int, nearest: bool) -> np.ndarray:
    """frames (n, h, w, c) -> resized to (rh, rw) then cropped to (ch, cw)."""
    lib = _load()
    assert lib is not None
    frames = np.ascontiguousarray(frames, np.float32)
    n, h, w = frames.shape[:3]
    c = frames.shape[3] if frames.ndim == 4 else 1
    out = np.empty((n, ch, cw) + ((c,) if frames.ndim == 4 else ()), np.float32)
    lib.scale_and_crop(_fptr(frames), n, h, w, c, rh, rw, y0, x0, ch, cw,
                       int(nearest), _fptr(out))
    return out
