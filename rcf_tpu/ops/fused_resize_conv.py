"""Exact fused bilinear-upsample -> dilated-conv (the resize_concat hot path).

The RCF mask head (reference `models/fcn_head.py:100-141`,
`models/decode_head.py:141-170` input_transform="resize_concat") upsamples
stage-3 features 2x (48^2 -> 96^2, 2048 channels) and then runs a 3x3
dilation-6 conv over the concat — the single most expensive conv in the
model (~98 GFLOPs/frame at 384^2 inputs).

TPU-first identity: with a 2-phase-periodic linear upsample U (bilinear,
align_corners=False, integer scale s) and a conv whose dilation d is a
multiple of s, every conv tap lands on the *same* upsampling phase, so

    conv_d(U(x)) == U(conv_{d/s}(x))

exactly — except on a small static set of output lines where U's edge
clamping and the conv's zero padding interact. That set is derived here
*numerically* from the actual interpolation matrices (`ops/resize.py`
`_linear_matrix`): for each tap shift t, the commutator
``E_t = shift_{d t} @ R - R @ shift_{(d/s) t}`` is a sparse matrix whose
non-zero rows are the only outputs where the identity fails (6 rows of 96
for the RCF head). Those lines are recomputed exactly from gathered
upsampled taps and spliced in, preserving bit-level semantics of the
direct path up to float re-association while cutting the conv FLOPs by
s^2 (4x for the 2048-channel slice).

Returns ``None`` when the algebra does not apply (non-integer scale,
dilation not divisible, align_corners=True whose matrix is not phase
periodic, ...) so callers can fall back to resize-then-conv.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from jax import lax

from .resize import _linear_matrix, resize_bilinear

_DIMS = ("NHWC", "HWIO", "NHWC")


def _shift_matrix(n: int, k: int) -> np.ndarray:
    """[n, n] matrix of y[p] = x[p + k] with zeros outside (conv zero pad)."""
    m = np.zeros((n, n))
    p = np.arange(max(0, -k), min(n, n - k))
    m[p, p + k] = 1.0
    return m


@functools.lru_cache(maxsize=256)
def _wrong_lines(
    in_size: int, out_size: int, dilation: int, align_corners: bool, kernel_size: int
) -> tuple[int, ...] | None:
    """Output lines where conv-of-upsample != upsample-of-conv, or None if
    the factorization is ineligible / the mismatch set is dense."""
    if out_size % in_size or out_size == in_size:
        return None
    s = out_size // in_size
    if dilation % s:
        return None
    R = _linear_matrix(in_size, out_size, align_corners).astype(np.float64)
    wrong: set[int] = set()
    for t in range(-(kernel_size // 2), kernel_size // 2 + 1):
        if t == 0:
            continue
        e = _shift_matrix(out_size, dilation * t) @ R - R @ _shift_matrix(
            in_size, dilation // s * t
        )
        wrong.update(np.where(np.abs(e).sum(axis=1) > 1e-9)[0].tolist())
    if len(wrong) > 4 * kernel_size:  # dense mismatch (e.g. align_corners=True)
        return None
    return tuple(sorted(wrong))


@functools.lru_cache(maxsize=256)
def _tap_gather_matrix(
    in_size: int,
    out_size: int,
    dilation: int,
    align_corners: bool,
    kernel_size: int,
    lines: tuple[int, ...],
) -> np.ndarray:
    """[len(lines)*k, in_size]: row i*k+j reads upsampled line ``lines[i] +
    d*(j - k//2)`` directly from the source (zero row = conv zero pad)."""
    R = _linear_matrix(in_size, out_size, align_corners)
    a = np.zeros((len(lines) * kernel_size, in_size), np.float32)
    for i, p in enumerate(lines):
        for j in range(kernel_size):
            q = p + dilation * (j - kernel_size // 2)
            if 0 <= q < out_size:
                a[i * kernel_size + j] = R[q]
    return a


def same_conv(x: jnp.ndarray, kernel: jnp.ndarray, dilation: int) -> jnp.ndarray:
    """NHWC conv with flax nn.Conv's SAME-style int padding, no bias."""
    k = kernel.shape[0]
    pad = (k - 1) // 2 * dilation
    return lax.conv_general_dilated(
        x, kernel, (1, 1), ((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation), dimension_numbers=_DIMS,
    )


def fused_resize_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    target_hw: tuple[int, int],
    dilation: int,
    align_corners: bool,
) -> jnp.ndarray | None:
    """``same_conv(resize_bilinear(x, target_hw), kernel, dilation)`` computed
    at source resolution + exact border splice; None if ineligible.

    The splice itself also runs at source resolution: wrong *rows* are
    tap-gathered along H (exact) and conv'd/upsampled along W (factorized,
    so wrong at cols in the W mismatch set), wrong *cols* symmetrically,
    and the (rows x cols) corner block is recomputed exactly from direct
    2D tap gathers last — every output pixel ends up exact while all heavy
    convs stay at the source grid."""
    ht, wt = target_hw
    n, h, w, _ = x.shape
    k = kernel.shape[0]
    if kernel.shape[1] != k:
        return None
    rows = _wrong_lines(h, ht, dilation, align_corners, k)
    cols = _wrong_lines(w, wt, dilation, align_corners, k)
    if rows is None or cols is None:
        return None
    f = kernel.shape[-1]
    dl_h, dl_w = dilation // (ht // h), dilation // (wt // w)
    pad_h, pad_w = (k - 1) // 2 * dl_h, (k - 1) // 2 * dl_w

    lo = lax.conv_general_dilated(
        x, kernel, (1, 1), ((pad_h, pad_h), (pad_w, pad_w)),
        rhs_dilation=(dl_h, dl_w), dimension_numbers=_DIMS,
    )
    main = resize_bilinear(lo, target_hw, align_corners).astype(lo.dtype)

    a_h = jnp.asarray(
        _tap_gather_matrix(h, ht, dilation, align_corners, k, rows), x.dtype
    ) if rows else None
    a_w = jnp.asarray(
        _tap_gather_matrix(w, wt, dilation, align_corners, k, cols), x.dtype
    ) if cols else None

    if rows:
        # Exact along H (direct tap gather); factorized along W (lo-res conv
        # + upsample — wrong at cols in the W set, corner pass fixes those).
        taps = jnp.einsum("rh,nhwc->nrwc", a_h, x).reshape(n * len(rows), k, w, -1)
        ex = lax.conv_general_dilated(
            taps, kernel, (1, 1), ((0, 0), (pad_w, pad_w)),
            rhs_dilation=(1, dl_w), dimension_numbers=_DIMS,
        ).reshape(n, len(rows), w, f)
        rw = jnp.asarray(_linear_matrix(w, wt, align_corners), ex.dtype)
        ex = jnp.einsum("Ww,nrwf->nrWf", rw, ex)
        main = main.at[:, jnp.asarray(rows)].set(ex)

    if cols:
        taps = (
            jnp.einsum("cw,nhwk->nhck", a_w, x)
            .reshape(n, h, len(cols), k, -1)
            .transpose(0, 2, 1, 3, 4)
            .reshape(n * len(cols), h, k, -1)
        )
        ex = lax.conv_general_dilated(
            taps, kernel, (1, 1), ((pad_h, pad_h), (0, 0)),
            rhs_dilation=(dl_h, 1), dimension_numbers=_DIMS,
        ).reshape(n, len(cols), h, f)
        rh = jnp.asarray(_linear_matrix(h, ht, align_corners), ex.dtype)
        ex = jnp.einsum("Hh,nchf->nHcf", rh, ex)
        main = main.at[:, :, jnp.asarray(cols)].set(ex)

    if rows and cols:
        corner_taps = jnp.einsum("rh,cw,nhwk->nrck", a_h, a_w, x).reshape(
            n, len(rows), k, len(cols), k, -1
        )
        corners = jnp.einsum("naibjc,ijcf->nabf", corner_taps, kernel)
        main = main.at[
            :, jnp.asarray(rows)[:, None], jnp.asarray(cols)[None, :]
        ].set(corners)

    return main
