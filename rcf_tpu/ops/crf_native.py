"""ctypes bridge to the native permutohedral dense-CRF (native/crf/).

The C++ lattice is the exact O(N) counterpart of the reference's CUDA
torchCRF (`tools/torchCRF/`), built on demand with g++ (`native/Makefile`).
Used as a host-side post-processing path without an accelerator and as an
independent cross-check of the attention-based engine in `crf.py`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO_PATH = os.path.join(_REPO, "native", "build", "libpermutohedral_crf.so")
_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO_PATH):
        subprocess.run(["make", "-C", os.path.join(_REPO, "native")], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_SO_PATH)
    lib.rcf_crf_soft.restype = None
    lib.rcf_crf_soft.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def crf_soft_native(rgb_u8: np.ndarray, mask01: np.ndarray, srgb: float = 5.0,
                    scomp: float = 5.0, sxy: float = 60.0, scomp_smooth: float = 0.0,
                    sxy_smooth: float = 0.0, refine_iters: int = 50,
                    crf_scale: float = 0.7) -> np.ndarray:
    """[H, W, 3] uint8 + [H, W] float mask -> [H, W] binary refined mask."""
    lib = _load()
    h, w = mask01.shape
    rgb_c = np.ascontiguousarray(rgb_u8, dtype=np.uint8)
    mask_c = np.ascontiguousarray(mask01, dtype=np.float32)
    out = np.empty((h, w), np.float32)
    lib.rcf_crf_soft(
        rgb_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mask_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(h), ctypes.c_int(w),
        ctypes.c_float(scomp_smooth), ctypes.c_float(sxy_smooth),
        ctypes.c_float(scomp), ctypes.c_float(sxy), ctypes.c_float(srgb),
        ctypes.c_int(refine_iters), ctypes.c_float(crf_scale),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
