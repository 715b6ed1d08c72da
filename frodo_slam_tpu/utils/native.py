"""ctypes bindings for the native host kernels (native/asmk_kernels.cpp).

Build with ``make -C native`` (g++, no extra deps). All entry points
gracefully fall back to numpy in retrieval/asmk.py when the .so is absent.
"""

from __future__ import annotations

import ctypes
import pathlib

import numpy as np

_SO = pathlib.Path(__file__).parent / "_asmk_native.so"
if not _SO.exists():
    raise ImportError(f"native library not built: {_SO} (run `make -C native`)")

_lib = ctypes.CDLL(str(_SO))

_lib.hamming_cdist_packed.argtypes = [
    ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
    ctypes.POINTER(ctypes.c_float),
    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
]
_lib.binarize_and_pack_2d.argtypes = [
    ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint32),
    ctypes.c_int64, ctypes.c_int64,
]
_lib.asmk_accumulate_word.argtypes = [
    ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
    ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
    ctypes.c_float, ctypes.c_float,
    ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
]


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def hamming_cdist_packed(a: np.ndarray, b: np.ndarray, dim_bits: int) -> np.ndarray:
    a = np.ascontiguousarray(a, np.uint32)
    b = np.ascontiguousarray(b, np.uint32)
    out = np.empty((a.shape[0], b.shape[0]), np.float32)
    _lib.hamming_cdist_packed(
        _ptr(a, ctypes.c_uint32), _ptr(b, ctypes.c_uint32), _ptr(out, ctypes.c_float),
        a.shape[0], b.shape[0], a.shape[1], float(dim_bits),
    )
    return out


def binarize_and_pack_2d(vecs: np.ndarray) -> np.ndarray:
    vecs = np.ascontiguousarray(vecs, np.float32)
    n, d = vecs.shape
    out = np.zeros((n, (d + 31) // 32), np.uint32)
    _lib.binarize_and_pack_2d(_ptr(vecs, ctypes.c_float), _ptr(out, ctypes.c_uint32), n, d)
    return out


def asmk_accumulate_word(q: np.ndarray, vecs: np.ndarray, imids: np.ndarray,
                         dim_bits: int, sim_threshold: float,
                         norm_factor: np.ndarray, scores: np.ndarray) -> None:
    q = np.ascontiguousarray(q, np.uint32)
    vecs = np.ascontiguousarray(vecs, np.uint32)
    imids = np.ascontiguousarray(imids, np.int64)
    _lib.asmk_accumulate_word(
        _ptr(q, ctypes.c_uint32), _ptr(vecs, ctypes.c_uint32), _ptr(imids, ctypes.c_int64),
        vecs.shape[0], vecs.shape[1], float(dim_bits), float(sim_threshold),
        _ptr(norm_factor, ctypes.c_double), _ptr(scores, ctypes.c_double),
    )
