"""Native (C++) host-pipeline kernels: build, load, and ctypes bindings.

Compiled on demand with the system toolchain into the package dir (cached by
source hash); every entry point degrades gracefully to the numpy
implementations when a compiler is unavailable. ctypes calls release the
GIL, so these scale across the input pipeline's worker threads.

Public API (all mirror the Python implementations exactly — the Python
versions are the test oracle):
  - resize_bilinear_f32(src_hwc_f32, (oh, ow), align_corners) -> f32
  - resize_nearest(src_hw[c]_any, (oh, ow), align_corners) -> same dtype
  - rasterize_bboxes(cids_i32, boxes_f32, h, w, ncls) -> (h, w, ncls) f32
  - u8_to_f32(img_u8, center) -> f32 ([0,1) or [-1,1))
  - map_lut_i32(label_u8, table_i32) -> i32
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = [
    "available",
    "decode_available",
    "resize_bilinear_f32",
    "resize_nearest",
    "rasterize_bboxes",
    "u8_to_f32",
    "map_lut_i32",
    "decode_image",
]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastops.cpp")
_DECODE_SRC = os.path.join(_DIR, "decode.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_DECODE_LIB: Optional[ctypes.CDLL] = None
_DECODE_TRIED = False


def _compile(src: str, stem: str, extra_flags=()) -> Optional[ctypes.CDLL]:
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_DIR, f"_{stem}_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + ".tmp"
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             "-o", tmp, src, *extra_flags],
            check=True, capture_output=True,
        )
        os.replace(tmp, so_path)
    return ctypes.CDLL(so_path)


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            lib = _compile(_SRC, "fastops")
            _declare(lib)
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def _build_and_load_decode() -> Optional[ctypes.CDLL]:
    """decode.cpp links the system libjpeg/libpng; built separately so a
    box without those dev packages still gets the dependency-free fastops."""
    global _DECODE_LIB, _DECODE_TRIED
    with _LOCK:
        if _DECODE_LIB is not None or _DECODE_TRIED:
            return _DECODE_LIB
        _DECODE_TRIED = True
        try:
            lib = _compile(_DECODE_SRC, "fastdecode", ("-ljpeg", "-lpng"))
            c_u8p = ctypes.POINTER(ctypes.c_uint8)
            c_ip = ctypes.POINTER(ctypes.c_int)
            lib.decode_info.argtypes = [
                c_u8p, ctypes.c_int64, ctypes.c_int, c_ip, c_ip, c_ip,
            ]
            lib.decode_info.restype = ctypes.c_int
            lib.decode_u8.argtypes = [c_u8p, ctypes.c_int64, ctypes.c_int, c_u8p]
            lib.decode_u8.restype = ctypes.c_int
            _DECODE_LIB = lib
        except Exception:
            _DECODE_LIB = None
        return _DECODE_LIB


def _declare(lib: ctypes.CDLL) -> None:
    c_f32p = ctypes.POINTER(ctypes.c_float)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    lib.resize_bilinear_f32.argtypes = [
        c_f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        c_f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.resize_nearest_bytes.argtypes = [
        c_u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        c_u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.rasterize_bboxes.argtypes = [
        c_i32p, c_f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, c_f32p,
    ]
    lib.u8_to_f32.argtypes = [c_u8p, ctypes.c_int64, c_f32p, ctypes.c_int]
    lib.map_lut_i32.argtypes = [
        c_u8p, ctypes.c_int64, c_i32p, ctypes.c_int, c_i32p,
    ]


def available() -> bool:
    return _build_and_load() is not None


def decode_available() -> bool:
    return _build_and_load_decode() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def resize_bilinear_f32(src: np.ndarray, size, align_corners: bool = False):
    """(H, W, C) f32 -> (oh, ow, C) f32; None if native unavailable."""
    lib = _build_and_load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.float32)
    h, w, c = src.shape
    oh, ow = int(size[0]), int(size[1])
    out = np.empty((oh, ow, c), np.float32)
    lib.resize_bilinear_f32(
        _ptr(src, ctypes.c_float), h, w, c,
        _ptr(out, ctypes.c_float), oh, ow, int(align_corners),
    )
    return out


def resize_nearest(src: np.ndarray, size, align_corners: bool = False):
    """NN resize over leading 2 dims of (H, W[, C]); dtype preserved."""
    lib = _build_and_load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src)
    h, w = src.shape[:2]
    elem = int(np.prod(src.shape[2:], dtype=np.int64)) * src.dtype.itemsize
    oh, ow = int(size[0]), int(size[1])
    out = np.empty((oh, ow, *src.shape[2:]), src.dtype)
    lib.resize_nearest_bytes(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, elem,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), oh, ow,
        int(align_corners),
    )
    return out


def rasterize_bboxes(cids: np.ndarray, boxes: np.ndarray, h: int, w: int,
                     ncls: int):
    lib = _build_and_load()
    if lib is None:
        return None
    cids = np.ascontiguousarray(cids, np.int32)
    boxes = np.ascontiguousarray(boxes, np.float32).reshape(-1, 4)
    out = np.empty((h, w, ncls), np.float32)
    lib.rasterize_bboxes(
        _ptr(cids, ctypes.c_int32), _ptr(boxes, ctypes.c_float),
        len(cids), h, w, ncls, _ptr(out, ctypes.c_float),
    )
    return out


def u8_to_f32(src: np.ndarray, center: bool = False):
    lib = _build_and_load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    out = np.empty(src.shape, np.float32)
    lib.u8_to_f32(
        _ptr(src, ctypes.c_uint8), src.size, _ptr(out, ctypes.c_float),
        int(center),
    )
    return out


def decode_image(buf: bytes, force_rgb: bool = False):
    """Decode PNG/JPEG bytes GIL-free via the system libjpeg/libpng.

    Parity contract (oracle = PIL, tests/test_native.py): raw mode returns
    exactly ``np.asarray(Image.open(buf))`` for 8-bit images — palette PNGs
    stay index maps (labels depend on this); ``force_rgb`` returns (H, W, 3)
    like ``Image.open(buf).convert("RGB")`` (alpha dropped). Returns None for
    anything unsupported (16-bit PNG, ppm, missing libs) — callers fall back
    to PIL, so this path is never correctness-bearing.
    """
    lib = _build_and_load_decode()
    if lib is None:
        return None
    data = np.frombuffer(buf, np.uint8)
    h, w, c = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    rc = lib.decode_info(
        _ptr(data, ctypes.c_uint8), data.size, int(force_rgb),
        ctypes.byref(h), ctypes.byref(w), ctypes.byref(c),
    )
    if rc != 0 or h.value <= 0 or w.value <= 0 or c.value <= 0:
        return None
    out = np.empty((h.value, w.value, c.value), np.uint8)
    rc = lib.decode_u8(
        _ptr(data, ctypes.c_uint8), data.size, int(force_rgb),
        _ptr(out, ctypes.c_uint8),
    )
    if rc != 0:
        return None
    # PIL returns 2-D arrays for single-channel images
    return out[..., 0] if c.value == 1 else out


def map_lut_i32(src: np.ndarray, table: np.ndarray):
    lib = _build_and_load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    table = np.ascontiguousarray(table, np.int32)
    out = np.empty(src.shape, np.int32)
    lib.map_lut_i32(
        _ptr(src, ctypes.c_uint8), src.size, _ptr(table, ctypes.c_int32),
        len(table), _ptr(out, ctypes.c_int32),
    )
    return out
