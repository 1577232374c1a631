"""ctypes bindings for the native host library (``dexnerf_host.cc``).

Builds the shared library on first use (g++ -O3) and caches it next to the
source. No pybind11 dependency — plain C ABI + ctypes, numpy arrays passed
as pointers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dexnerf_host.cc")
_SO = os.path.join(_HERE, "libdexnerf_host.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.check_call(
        [
            "g++",
            "-O3",
            "-march=native",
            "-shared",
            "-fPIC",
            "-std=c++17",
            _SRC,
            "-o",
            _SO,
        ]
    )


def load_library() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            _build()
        lib = ctypes.CDLL(_SO)

        i32 = ctypes.c_int32
        i64 = ctypes.c_int64
        pf = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        pi = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

        lib.searchsorted_right_f32.argtypes = [pf, pf, i32, i32, i32, pi]
        lib.sample_pdf_interp_f32.argtypes = [pf, pf, pf, pi, i32, i32, i32, pf]
        lib.pack_rays_f32.argtypes = [pf, pf, pf, i64, pf]
        lib.gather_random_rows_f32.argtypes = [pf, i64, i32, i64, i32, pf]
        _LIB = lib
        return lib


def searchsorted_right(cdf: np.ndarray, u: np.ndarray) -> np.ndarray:
    """Batched ``searchsorted(cdf, u, side="right")`` (native).

    cdf: [B, M] ascending per row (float32); u: [B, N]. Returns int32 [B, N].
    """
    lib = load_library()
    cdf = np.ascontiguousarray(cdf, np.float32)
    u = np.ascontiguousarray(u, np.float32)
    B, M = cdf.shape
    N = u.shape[1]
    out = np.empty((B, N), np.int32)
    lib.searchsorted_right_f32(cdf, u, B, M, N, out)
    return out


def sample_pdf_interp(
    cdf: np.ndarray, bins: np.ndarray, u: np.ndarray, inds: np.ndarray
) -> np.ndarray:
    """Clamped below/above gather + guarded lerp (native)."""
    lib = load_library()
    cdf = np.ascontiguousarray(cdf, np.float32)
    bins = np.ascontiguousarray(bins, np.float32)
    u = np.ascontiguousarray(u, np.float32)
    inds = np.ascontiguousarray(inds, np.int32)
    B, M = cdf.shape
    N = u.shape[1]
    out = np.empty((B, N), np.float32)
    lib.sample_pdf_interp_f32(cdf, bins, u, inds, B, M, N, out)
    return out


def sample_pdf_host(
    bins: np.ndarray, weights: np.ndarray, u: np.ndarray
) -> np.ndarray:
    """Full host-side sample_pdf (reference ``sample_pdf_2`` semantics) on
    the native kernels: CDF (numpy) + native searchsorted + native interp."""
    weights = np.asarray(weights, np.float32) + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.concatenate(
        [np.zeros_like(pdf[:, :1]), np.cumsum(pdf, -1)], axis=-1
    ).astype(np.float32)
    inds = searchsorted_right(cdf, u)
    return sample_pdf_interp(cdf, np.asarray(bins, np.float32), u, inds)


def pack_rays(ro: np.ndarray, rd: np.ndarray, rgb: np.ndarray) -> np.ndarray:
    """Pack (origins, directions, rgb) into [N, 12] store rows (native);
    viewdirs (normalized directions) computed in the kernel."""
    lib = load_library()
    ro = np.ascontiguousarray(ro.reshape(-1, 3), np.float32)
    rd = np.ascontiguousarray(rd.reshape(-1, 3), np.float32)
    rgb = np.ascontiguousarray(rgb.reshape(-1, 3), np.float32)
    n = ro.shape[0]
    out = np.empty((n, 12), np.float32)
    lib.pack_rays_f32(ro, rd, rgb, n, out)
    return out


def gather_random_rows(
    store: np.ndarray, seed: int, batch: int
) -> np.ndarray:
    """Random row gather from a packed store (native host batch assembly)."""
    lib = load_library()
    store = np.ascontiguousarray(store, np.float32)
    n, width = store.shape
    out = np.empty((batch, width), np.float32)
    lib.gather_random_rows_f32(store, n, width, seed, batch, out)
    return out
