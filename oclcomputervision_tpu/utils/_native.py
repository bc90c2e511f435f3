"""ctypes bindings to the native host runtime (native/ocv_native.cpp).

Every entry point has a NumPy fallback elsewhere in the package; import
failure here is never fatal. The library is built lazily on first
import if g++ is available (a few hundred ms), else ImportError.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_libocv_native.so")


def _load() -> ctypes.CDLL:
    if not os.path.isfile(_SO):
        import importlib.util

        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        spec = importlib.util.spec_from_file_location(
            "ocv_native_build", os.path.join(repo_root, "native", "build.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.build(verbose=False)
    return ctypes.CDLL(_SO)


_lib = _load()

_lib.flo_probe.restype = ctypes.c_int
_lib.flo_decode.restype = ctypes.c_int

_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_i64 = ctypes.c_int64

_lib.flo_decode.argtypes = [ctypes.c_char_p, _i64, _f32p]
_lib.flo_probe.argtypes = [
    ctypes.c_char_p,
    _i64,
    ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_int32),
]
_lib.hist_grid_u8.argtypes = [_u8p, _i64, _i64, _i64, _i64, _u32p]
_lib.calc_transfer_func.argtypes = [
    _f64p,
    _i64,
    ctypes.c_double,
    ctypes.c_double,
    ctypes.c_double,
    _f32p,
]
_lib.apply_lut_u8.argtypes = [_u8p, _u8p, _u8p, _i64]
_lib.block_match.argtypes = [
    _u8p,
    _u8p,
    _i64,
    _i64,
    ctypes.c_void_p,
    _i64,
    _i64,
    ctypes.c_int,
    _f32p,
]
_lib.tile_pack_u8.argtypes = [_u8p, _i64, _i64, _i64, _i64, ctypes.c_uint8, _i64, _i64, _u8p]


def decode_flo(raw: bytes) -> np.ndarray:
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    rc = _lib.flo_probe(raw, len(raw), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise ValueError(f"invalid .flo data (rc={rc})")
    out = np.empty((h.value, w.value, 2), np.float32)
    rc = _lib.flo_decode(raw, len(raw), out)
    if rc != 0:
        raise ValueError(f"flo decode failed (rc={rc})")
    return out


def hist_grid(gray: np.ndarray, tile=(32, 256)) -> np.ndarray:
    gray = np.ascontiguousarray(gray, np.uint8)
    h, w = gray.shape
    th, tw = tile
    out = np.empty((h // th, w // tw, 256), np.uint32)
    _lib.hist_grid_u8(gray, h, w, th, tw, out)
    return out


def calc_transfer_func(hist, alpha, punch, clip) -> np.ndarray:
    hist = np.ascontiguousarray(hist, np.float64)
    out = np.empty(hist.shape[0], np.float32)
    _lib.calc_transfer_func(hist, hist.shape[0], alpha, punch, clip, out)
    return out


def apply_lut(img: np.ndarray, lut: np.ndarray) -> np.ndarray:
    img = np.ascontiguousarray(img, np.uint8)
    lut = np.ascontiguousarray(lut, np.uint8)
    out = np.empty_like(img)
    _lib.apply_lut_u8(img, lut, out.reshape(-1), img.size)
    return out


def block_match(
    f0: np.ndarray,
    f1: np.ndarray,
    search_size: int = 15,
    patch_size: int = 5,
    seed: np.ndarray | None = None,
    seed_mode: str = "shipped",
) -> np.ndarray:
    f0 = np.ascontiguousarray(f0, np.uint8)
    f1 = np.ascontiguousarray(f1, np.uint8)
    h, w = f0.shape
    out = np.empty((h, w, 2), np.float32)
    if seed is not None:
        seed = np.ascontiguousarray(seed, np.float32)
        seed_ptr = seed.ctypes.data_as(ctypes.c_void_p)
    else:
        seed_ptr = None
    _lib.block_match(
        f0, f1, h, w, seed_ptr, search_size, patch_size,
        1 if seed_mode == "shipped" else 0, out,
    )
    return out


def tile_pack(img: np.ndarray, tile=(8, 2048), pad_value: int = 0) -> np.ndarray:
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape
    th, tw = tile
    gh = -(-h // th)
    gw = -(-w // tw)
    out = np.empty((gh, gw, th, tw), np.uint8)
    _lib.tile_pack_u8(img, h, w, th, tw, pad_value, gh, gw, out)
    return out
