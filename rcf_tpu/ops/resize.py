"""Separable image resize as two small matmuls (MXU-friendly).

The reference resizes masks/flows with ``F.interpolate`` (bilinear, both
align_corners modes: `models/rcf_model.py:213-220` uses align_corners=False,
`utils/eval_utils.py:5-12` uses align_corners=True) and `nearest` for
seg-fields during augmentation (`dataset/transforms.py:212-217`).

On TPU, gather-based interpolation is slow and `jax.image.resize`
anti-aliases on downscale (unlike torch). Instead we build static 1-D
interpolation matrices at trace time and apply them as two contractions:

    out[b, o, p, c] = Mh[o, h] * img[b, h, w, c] * Mw[p, w]

Static shapes mean the matrices are compile-time constants; XLA maps the
contractions onto the MXU and fuses neighbours. Matches torch's
``F.interpolate`` exactly (no antialiasing) for bilinear/nearest.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _linear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """[out_size, in_size] row-stochastic linear interpolation matrix."""
    out = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = out * ((in_size - 1) / (out_size - 1)) if out_size > 1 else np.zeros_like(out)
    else:
        src = (out + 0.5) * (in_size / out_size) - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, lo), (1.0 - frac).astype(np.float32))
    np.add.at(mat, (rows, hi), frac.astype(np.float32))
    return mat


@functools.lru_cache(maxsize=256)
def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] one-hot nearest-neighbour matrix (torch 'nearest')."""
    out = np.arange(out_size, dtype=np.float64)
    src = np.minimum(np.floor(out * (in_size / out_size)), in_size - 1).astype(np.int64)
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    mat[np.arange(out_size), src] = 1.0
    return mat


def _apply_separable(x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray) -> jnp.ndarray:
    """Apply row/col matrices over the (-3, -2) spatial axes of ``x`` (...HWC)."""
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    x = jnp.einsum("oh,...hwc->...owc", jnp.asarray(mh), x)
    x = jnp.einsum("pw,...owc->...opc", jnp.asarray(mw), x)
    return x.astype(orig_dtype)


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int], align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of a channel-last image batch ``[..., H, W, C]``."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    return _apply_separable(x, _linear_matrix(h, oh, align_corners), _linear_matrix(w, ow, align_corners))


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize of ``[..., H, W, C]`` (torch 'nearest' grid)."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    return _apply_separable(x, _nearest_matrix(h, oh), _nearest_matrix(w, ow))
