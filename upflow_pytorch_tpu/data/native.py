"""ctypes bindings for the native C++ data path (``native/upflow_native.cc``).

Builds on demand with ``make -C native`` (g++ + zlib); every entry point
has a pure-python fallback in ``flow_io`` / ``image_io``, so the package
works without a compiler — the native path just makes the host input
pipeline faster (PNG inflate+unfilter and normalization in C++).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libupflow_native.so")

_lib = None
_lib_lock = threading.Lock()


class _PngInfo(ctypes.Structure):
    _fields_ = [("width", ctypes.c_uint32), ("height", ctypes.c_uint32),
                ("channels", ctypes.c_uint32), ("bitdepth", ctypes.c_uint32)]


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.isfile(_SO_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib if _lib is not False else None
    with _lib_lock:
        if _lib is not None:
            return _lib if _lib is not False else None
        if not os.path.isfile(_SO_PATH) and not _build():
            _lib = False
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _lib = False
            return None
        lib.un_decode_png.restype = ctypes.c_int
        lib.un_decode_png.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(_PngInfo),
            ctypes.c_void_p, ctypes.c_size_t]
        lib.un_decode_flow_png.restype = ctypes.c_int
        lib.un_decode_flow_png.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(_PngInfo),
            ctypes.c_void_p, ctypes.c_void_p]
        lib.un_preprocess_image.restype = None
        lib.un_preprocess_image.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p]
        _lib = lib
        return lib


def available() -> bool:
    return get_lib() is not None


def decode_png(path: str) -> np.ndarray:
    """PNG file -> (H, W, C) uint8/uint16 via the C++ decoder."""
    lib = get_lib()
    if lib is None:
        from upflow_pytorch_tpu.data.flow_io import read_png
        return read_png(path)
    with open(path, "rb") as f:
        data = f.read()
    info = _PngInfo()
    rc = lib.un_decode_png(data, len(data), ctypes.byref(info), None, 0)
    if rc != 0:
        raise IOError("native PNG parse failed (%d): %s" % (rc, path))
    dtype = np.uint16 if info.bitdepth == 16 else np.uint8
    out = np.empty((info.height, info.width, info.channels), dtype)
    rc = lib.un_decode_png(data, len(data), ctypes.byref(info),
                           out.ctypes.data_as(ctypes.c_void_p), out.nbytes)
    if rc != 0:
        raise IOError("native PNG decode failed (%d): %s" % (rc, path))
    return out


def decode_flow_png(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """KITTI flow PNG -> (flow (H,W,2) f32, valid (H,W,1) u8) via C++."""
    lib = get_lib()
    if lib is None:
        from upflow_pytorch_tpu.data.flow_io import read_flow_png
        return read_flow_png(path)
    with open(path, "rb") as f:
        data = f.read()
    info = _PngInfo()
    rc = lib.un_decode_png(data, len(data), ctypes.byref(info), None, 0)
    if rc != 0:
        raise IOError("native PNG parse failed (%d): %s" % (rc, path))
    flow = np.empty((info.height, info.width, 2), np.float32)
    valid = np.empty((info.height, info.width, 1), np.uint8)
    rc = lib.un_decode_flow_png(data, len(data), ctypes.byref(info),
                                flow.ctypes.data_as(ctypes.c_void_p),
                                valid.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise IOError("native flow decode failed (%d): %s" % (rc, path))
    return flow, valid


def preprocess_image(img: np.ndarray, horizontal_flip: bool = False
                     ) -> np.ndarray:
    """uint8 RGB HWC -> UnFlow-normalized float32 HWC via C++."""
    lib = get_lib()
    if lib is None:
        from upflow_pytorch_tpu.data.image_io import normalize_image
        return normalize_image(img, True, horizontal_flip)
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    out = np.empty((h, w, 3), np.float32)
    lib.un_preprocess_image(img.ctypes.data_as(ctypes.c_void_p), h, w,
                            1 if horizontal_flip else 0,
                            out.ctypes.data_as(ctypes.c_void_p))
    return out
