"""ctypes binding for the native (C++) augmentation backend.

The reference delegates its per-image transform work to native code inside
PIL/torchvision (SURVEY.md §2.2); this framework's equivalent is a small
multithreaded C++ library (native/augment.cpp) driven through ctypes —
no pybind11 dependency.  The library is compiled on demand with g++ the
first time it is needed and cached next to the source; every entry point
degrades gracefully to the PIL path (data/augment.py) when a compiler is
unavailable.

Semantics are bit-exact with the PIL implementations per op (verified in
tests/test_native_aug.py); only the random parameter *streams* differ, since
numpy Generator streams are not reproducible from C.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["native_available", "augment_batch_native",
           "normalize_batch_native", "apply_op_native", "OP_IDS"]

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SRC = os.path.join(_DIR, "augment.cpp")
_SO = os.path.join(_DIR, "libgllaug.so")

_lock = threading.Lock()
_lib = None
_tried = False

# RandAugment op ids, matching augment.py _AUGMENT_LIST order (reference
# config/augmentations.py:155-174).
OP_IDS = {
    "autocontrast": 0, "brightness": 1, "color": 2, "contrast": 3,
    "equalize": 4, "identity": 5, "posterize": 6, "rotate": 7,
    "sharpness": 8, "shear_x": 9, "shear_y": 10, "solarize": 11,
    "translate_x": 12, "translate_y": 13,
}

_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")


def _build() -> bool:
    if os.path.exists(_SO) and (os.path.getmtime(_SO)
                                >= os.path.getmtime(_SRC)):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC,
             "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        lib = ctypes.CDLL(_SO)
        i, d = ctypes.c_int, ctypes.c_double
        lib.gll_apply_op.argtypes = [_u8p, _u8p, i, i, i, i, d, i]
        lib.gll_rotate.argtypes = [_u8p, _u8p, i, i, i, d]
        lib.gll_mirror.argtypes = [_u8p, _u8p, i, i, i]
        lib.gll_pad_crop.argtypes = [_u8p, _u8p, i, i, i, i, i, i, i]
        lib.gll_cutout_rect.argtypes = [_u8p, i, i, i, i, i, i, i]
        lib.gll_augment_batch.argtypes = [_u8p, _u8p, i, i, i, i, _u64p,
                                          i, i, i, i, i, i]
        lib.gll_normalize_batch.argtypes = [_u8p, _f32p, ctypes.c_int64, i,
                                            _f32p, _f32p, i]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def apply_op_native(img: np.ndarray, op: str | int, v: float,
                    sign: bool = False) -> np.ndarray:
    """Apply one RandAugment op to a uint8 HWC image (parity-test entry)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native augmentation library unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    out = np.empty_like(img)
    op_id = OP_IDS[op] if isinstance(op, str) else int(op)
    lib.gll_apply_op(img, out, h, w, c, op_id, float(v), int(sign))
    return out


def augment_batch_native(batch: np.ndarray, seeds: np.ndarray, rand_n: int,
                         rotation: int, flip: bool, pad: int,
                         pad_reflect: bool, threads: int = 0) -> np.ndarray:
    """Full weak/strong transform for a uint8 NHWC batch (one seed per
    image): [rotate] -> [flip] -> pad+crop -> RandAugment(rand_n) -> cutout.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native augmentation library unavailable")
    batch = np.ascontiguousarray(batch, np.uint8)
    n, h, w, c = batch.shape
    seeds = np.ascontiguousarray(seeds, np.uint64)
    if seeds.shape != (n,):
        raise ValueError("seeds must have shape (n,)")
    out = np.empty_like(batch)
    threads = threads or min(n, os.cpu_count() or 1)
    lib.gll_augment_batch(batch, out, n, h, w, c, seeds, int(rand_n),
                          int(rotation), int(flip), int(pad),
                          int(pad_reflect), int(threads))
    return out


def normalize_batch_native(batch: np.ndarray, mean, std,
                           threads: int = 0) -> np.ndarray:
    """uint8 NHWC -> float32 normalized NHWC ((x/255 - mean) / std)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native augmentation library unavailable")
    batch = np.ascontiguousarray(batch, np.uint8)
    c = batch.shape[-1]
    npix = batch.size // c
    out = np.empty(batch.shape, np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    threads = threads or (os.cpu_count() or 1)
    lib.gll_normalize_batch(batch.reshape(-1), out.reshape(-1), npix, c,
                            mean, std, int(threads))
    return out
