"""ctypes bindings for the C++ data core (runtime/data_core.cpp).

The library is built lazily on first use (g++ -O3 -fopenmp) and cached
next to the package. Every entry point has a pure-numpy fallback so the
framework works without a compiler; `available()` reports which path is
active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_REPO_ROOT, "runtime", "data_core.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libdatacore.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    # Link to a temp path and rename into place: the rename gives the
    # library a fresh inode, so a later dlopen cannot be deduplicated
    # against an already-loaded stale handle (glibc caches by dev/inode),
    # and other processes never see a half-written .so.
    tmp = _LIB_PATH + ".tmp"
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB_PATH)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        ):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        if not hasattr(lib, "gather_u8"):  # stale prebuilt .so: rebuild
            if not os.path.exists(_SRC) or not _build():
                return None
            lib = ctypes.CDLL(_LIB_PATH)  # fresh inode (see _build)
            if not hasattr(lib, "gather_u8"):
                return None  # degrade to the numpy fallbacks

        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i64 = ctypes.c_int64
        i32 = ctypes.c_int

        lib.gather_normalize_u8.argtypes = [u8p, i64p, i64, i64, f32p]
        lib.gather_f32.argtypes = [f32p, i64p, i64, i64, f32p]
        lib.resize_bicubic_f32.argtypes = [f32p, i64, i32, i32, i32, f32p, i32, i32]
        lib.flip_horizontal_f32.argtypes = [f32p, i64, i32, i32, i32, u8p]
        lib.gather_u8.argtypes = [u8p, i64p, i64, i64, u8p]
        lib.flip_horizontal_u8.argtypes = [u8p, i64, i32, i32, i32, u8p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def gather_normalize(imgs_u8: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """imgs[indices] / 255 -> float32, native when possible."""
    lib = _load()
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    if lib is None:
        return imgs_u8[indices].astype(np.float32) / 255.0
    imgs_u8 = np.ascontiguousarray(imgs_u8)
    elems = int(np.prod(imgs_u8.shape[1:]))
    out = np.empty((len(indices),) + imgs_u8.shape[1:], np.float32)
    lib.gather_normalize_u8(
        _ptr(imgs_u8, ctypes.c_uint8), _ptr(indices, ctypes.c_int64),
        len(indices), elems, _ptr(out, ctypes.c_float),
    )
    return out


def gather(imgs_f32: np.ndarray, indices: np.ndarray) -> np.ndarray:
    lib = _load()
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    if lib is None:
        return np.ascontiguousarray(imgs_f32[indices])
    imgs_f32 = np.ascontiguousarray(imgs_f32, dtype=np.float32)
    elems = int(np.prod(imgs_f32.shape[1:]))
    out = np.empty((len(indices),) + imgs_f32.shape[1:], np.float32)
    lib.gather_f32(
        _ptr(imgs_f32, ctypes.c_float), _ptr(indices, ctypes.c_int64),
        len(indices), elems, _ptr(out, ctypes.c_float),
    )
    return out


def gather_u8(imgs_u8: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """imgs[indices] -> uint8 (raw gather for the uint8-transfer path)."""
    lib = _load()
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    if lib is None:
        return np.ascontiguousarray(imgs_u8[indices])
    imgs_u8 = np.ascontiguousarray(imgs_u8)
    elems = int(np.prod(imgs_u8.shape[1:]))
    out = np.empty((len(indices),) + imgs_u8.shape[1:], np.uint8)
    lib.gather_u8(
        _ptr(imgs_u8, ctypes.c_uint8), _ptr(indices, ctypes.c_int64),
        len(indices), elems, _ptr(out, ctypes.c_uint8),
    )
    return out


def resize_bicubic(batch: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Batched PIL-compatible bicubic resize [N,H,W,C] -> [N,out_h,out_w,C]."""
    lib = _load()
    batch = np.ascontiguousarray(batch, dtype=np.float32)
    n, h, w, c = batch.shape
    if lib is None:
        from PIL import Image

        out = np.empty((n, out_h, out_w, c), np.float32)
        for i in range(n):
            img = Image.fromarray((batch[i] * 255).astype(np.uint8).squeeze())
            img = img.resize((out_w, out_h), Image.BICUBIC)
            arr = np.asarray(img, np.float32) / 255.0
            out[i] = arr[..., None] if arr.ndim == 2 else arr
        return out
    out = np.empty((n, out_h, out_w, c), np.float32)
    lib.resize_bicubic_f32(
        _ptr(batch, ctypes.c_float), n, h, w, c,
        _ptr(out, ctypes.c_float), out_h, out_w,
    )
    return out


def flip_horizontal(batch: np.ndarray, flags: np.ndarray) -> np.ndarray:
    """In-place horizontal flip of batch[i] where flags[i] (returns batch).

    Dispatches on dtype: float32 and uint8 batches are both supported
    (flipping is a pure permutation, so uint8-then-normalize is
    bit-identical to normalize-then-flip).
    """
    lib = _load()
    flags = np.ascontiguousarray(flags, dtype=np.uint8)
    if lib is None:
        batch[flags.astype(bool)] = batch[flags.astype(bool), :, ::-1, :]
        return batch
    n, h, w, c = batch.shape
    if batch.dtype == np.uint8:
        batch = np.ascontiguousarray(batch)
        lib.flip_horizontal_u8(
            _ptr(batch, ctypes.c_uint8), n, h, w, c, _ptr(flags, ctypes.c_uint8)
        )
    else:
        batch = np.ascontiguousarray(batch, dtype=np.float32)
        lib.flip_horizontal_f32(
            _ptr(batch, ctypes.c_float), n, h, w, c, _ptr(flags, ctypes.c_uint8)
        )
    return batch
