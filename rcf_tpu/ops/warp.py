"""Flow warping, occlusion masks, cost volume (NHWC, pure jnp).

Parity targets:
* ``flow_warp``              — `utils/warp_utils.py:84-94` (grid_sample,
  align_corners=True, border/zeros padding);
* ``occu_mask_backward``     — `utils/warp_utils.py:27-113` (scatter-add
  correspondence map, threshold 0.2);
* ``occu_mask_bidirection``  — `utils/warp_utils.py:97-104`;
* ``correlation``            — `models/amd/correlation_native.py:6-23`
  (81-displacement cost volume; here as 81 static shifts over a padded
  tensor — static shapes, fused by XLA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                    pad: str = "border") -> jnp.ndarray:
    """Sample img [B, H, W, C] at float coords (x, y) [B, H', W'] each.

    Matches grid_sample(align_corners=True) with 'border' or 'zeros' padding.
    """
    b, h, w, c = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    def gather(yy, xx):
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        batch_idx = jnp.arange(b)[:, None, None]
        vals = img[batch_idx, yc, xc]
        if pad == "zeros":
            inside = ((xx >= 0) & (xx <= w - 1) & (yy >= 0) & (yy <= h - 1))[..., None]
            vals = jnp.where(inside, vals, 0.0)
        return vals

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def bilinear_sample_patch(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                          pad: str = "border") -> jnp.ndarray:
    """`bilinear_sample` with ONE [2, 2, C] patch gather per output pixel.

    Four scalar-granularity gathers per pixel are the TPU-hostile part of
    bilinear warping; a single lax.gather with slice_sizes (2, 2, C) moves
    4C contiguous elements per index instead. Border semantics are exact:
    grid_sample(border) == sampling at coordinates clamped to the image
    box, so coords are pre-clamped and the patch start clipped to H-2/W-2
    with the fraction re-derived (weight 1 lands on the second tap at the
    far edge). Zeros mode masks the output exactly like `bilinear_sample`.
    """
    b, h, w, c = img.shape
    out_shape = x.shape
    if pad == "border":
        # grid_sample(border) == sampling at box-clamped coordinates.
        x = jnp.clip(x, 0, w - 1)
        y = jnp.clip(y, 0, h - 1)
    # Patch start clipped so the 2x2 window is in-bounds; per-tap triangle
    # weights at the ABSOLUTE tap positions then reproduce both padding
    # modes exactly (an out-of-image true tap gets triangle weight 0, which
    # is grid_sample's zeros semantics; border was handled by the clamp).
    x0 = jnp.clip(jnp.floor(x), 0, w - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, h - 2).astype(jnp.int32)
    xf = x.reshape(b, -1)
    yf = y.reshape(b, -1)
    x0f = x0.reshape(b, -1)
    y0f = y0.reshape(b, -1)
    wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(xf - x0f))
    wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(xf - (x0f + 1)))
    wy0 = jnp.maximum(0.0, 1.0 - jnp.abs(yf - y0f))
    wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(yf - (y0f + 1)))

    starts = jnp.stack([y0f, x0f], axis=-1)  # [B, P, 2]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1))

    def gather_one(im, st):
        return jax.lax.gather(im, st, dnums, (2, 2, c), mode="clip")

    patches = jax.vmap(gather_one)(img, starts)  # [B, P, 2, 2, C]
    top = patches[:, :, 0, 0] * wx0[..., None] + patches[:, :, 0, 1] * wx1[..., None]
    bot = patches[:, :, 1, 0] * wx0[..., None] + patches[:, :, 1, 1] * wx1[..., None]
    vals = top * wy0[..., None] + bot * wy1[..., None]
    return vals.reshape(*out_shape, c)


def bilinear_sample_mxu(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                        pad: str = "border", chunk: int = 512) -> jnp.ndarray:
    """`bilinear_sample` as two chunked MXU contractions — no gather at all.

    The bilinear kernel factorizes per axis:
    ``out[p] = sum_{y,x} tri(yp - y) * tri(xp - x) * img[y, x]`` with
    ``tri(d) = max(0, 1 - |d|)`` (the same identity `corresponding_map`
    uses for the forward splat). Sampling P output pixels is therefore

        z[p, y, c] = sum_x TRI_X[p, x] * img[y, x, c]     (matmul, MXU)
        out[p, c]  = sum_y TRI_Y[p, y] * z[p, y, c]       (weight + reduce)

    chunked over p so the dense [chunk, W] hat factors stay small. XLA's
    per-element gather runs at ~56M indices/s on TPU (the round-1 AMD
    bottleneck); this form runs at MXU/HBM speed and — crucial for
    training — autodiffs to MORE einsums (d/img and d/flow are
    contractions), not the pathological scatter-add VJP of a gather.

    Border semantics == grid_sample(align_corners=True, border): sampling
    at box-clamped coordinates. Zeros mode needs no masking: an
    out-of-image tap has no column in the hat matrix, so its weight is
    simply dropped — exactly grid_sample's per-tap zeros semantics.

    Hat weights are computed in f32 and cast to the image dtype for the
    contraction; with bf16 images the weights quantize to ~2^-9 relative
    (the 4-tap gather path keeps f32 weights), which is inside the noise
    of the photometric losses that consume warped images.
    """
    b, h, w, c = img.shape
    out_shape = x.shape
    xf = x.reshape(b, -1).astype(jnp.float32)
    yf = y.reshape(b, -1).astype(jnp.float32)
    if pad == "border":
        xf = jnp.clip(xf, 0.0, float(w - 1))
        yf = jnp.clip(yf, 0.0, float(h - 1))
    p = xf.shape[1]
    chunk = min(chunk, p)
    padn = (-p) % chunk
    if padn:
        # Padded pixels sample at (-2, -2): zero weight in every column.
        xf = jnp.pad(xf, ((0, 0), (0, padn)), constant_values=-2.0)
        yf = jnp.pad(yf, ((0, 0), (0, padn)), constant_values=-2.0)
    n = (p + padn) // chunk
    xc = jnp.moveaxis(xf.reshape(b, n, chunk), 1, 0)  # [n, B, chunk]
    yc = jnp.moveaxis(yf.reshape(b, n, chunk), 1, 0)
    cols_x = jnp.arange(w, dtype=jnp.float32)
    cols_y = jnp.arange(h, dtype=jnp.float32)
    # Contract x first: the [chunk, H*C] intermediate is smaller than the
    # y-first [chunk, W*C] one (H < W on wide video frames).
    img_x = jnp.moveaxis(img, 2, 1).reshape(b, w, h * c)

    # checkpoint: without it the scan VJP stashes every chunk's dense hat
    # factors and [chunk, H, C] intermediate as residuals (~19 GB at AMD
    # full-res) — rematerializing them in the backward is almost free.
    # (dots_saveable was measured SLOWER: saving the f32 first-einsum
    # outputs costs more HBM traffic than recomputing them.)
    @jax.checkpoint
    def body(xy):
        xi, yi = xy
        tri_x = jnp.maximum(0.0, 1.0 - jnp.abs(xi[..., None] - cols_x))
        tri_y = jnp.maximum(0.0, 1.0 - jnp.abs(yi[..., None] - cols_y))
        z = jnp.einsum("bpx,bxk->bpk", tri_x.astype(img.dtype), img_x,
                       preferred_element_type=jnp.float32)
        z = z.reshape(b, chunk, h, c)
        out = jnp.einsum("bph,bphc->bpc", tri_y, z,
                         preferred_element_type=jnp.float32)
        return out.astype(img.dtype)

    out = jax.lax.map(body, (xc, yc))  # [n, B, chunk, C]
    out = jnp.moveaxis(out, 0, 1).reshape(b, n * chunk, c)[:, :p]
    return out.reshape(*out_shape, c)


def _flow_warp_banded(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                      pad: str, band: int) -> jnp.ndarray:
    """Row-banded MXU warp: exact when every output row's source rows fit
    in a `band`-row window, guarded by a global `lax.cond` dense fallback.

    `bilinear_sample_mxu` contracts the full H*C columns of the image for
    every output chunk even though one output ROW only ever reads source
    rows within its flow's vertical span — typically a few dozen. Chunking
    by output row and dynamic-slicing a [band, W, C] window per chunk cuts
    the dominant matmul's N dimension from H*C to band*C (4x at AMD
    full-res with band=96) at identical results. The window start is
    data-dependent (fine: dynamic_slice start may be traced; its size is
    static) and derived under stop_gradient. When ANY chunk's span exceeds
    the band — large vertical shear, not large uniform motion, since the
    window follows each row's own flow — a global cond switches to the
    exact dense path, so semantics never depend on the band choice.
    """
    b, h, w, c = img.shape
    if band >= h:
        return bilinear_sample_mxu(img, x, y, pad=pad)
    xf = x.reshape(b, h, w).astype(jnp.float32)
    yf = y.reshape(b, h, w).astype(jnp.float32)
    if pad == "border":
        xf = jnp.clip(xf, 0.0, float(w - 1))
        yf = jnp.clip(yf, 0.0, float(h - 1))
        yspan = yf
    else:
        # Taps outside the image contribute nothing in zeros mode, so the
        # window only has to cover the valid-row extent.
        yspan = jnp.clip(yf, -1.0, float(h))
    ys = jax.lax.stop_gradient(yspan)
    lo = jnp.floor(jnp.min(ys, axis=2))          # [B, H] per output row
    hi = jnp.floor(jnp.max(ys, axis=2)) + 1.0
    fits = jnp.max(hi - lo) + 1.0 <= float(band)
    start = jnp.clip(lo.astype(jnp.int32), 0, h - band)  # [B, H]

    cols_x = jnp.arange(w, dtype=jnp.float32)
    rows = jnp.arange(band, dtype=jnp.float32)

    def banded(_):
        def body(args):
            xi, yi, st = args  # [B, W], [B, W], [B]
            win = jax.vmap(
                lambda im, s: jax.lax.dynamic_slice(im, (s, 0, 0), (band, w, c))
            )(img, st)                                   # [B, band, W, C]
            win_x = jnp.moveaxis(win, 2, 1).reshape(b, w, band * c)
            tri_x = jnp.maximum(0.0, 1.0 - jnp.abs(xi[..., None] - cols_x))
            abs_rows = st[:, None].astype(jnp.float32) + rows     # [B, band]
            tri_y = jnp.maximum(
                0.0, 1.0 - jnp.abs(yi[..., None] - abs_rows[:, None, :]))
            z = jnp.einsum("bpx,bxk->bpk", tri_x.astype(img.dtype), win_x,
                           preferred_element_type=jnp.float32)
            z = z.reshape(b, w, band, c)
            out = jnp.einsum("bpy,bpyc->bpc", tri_y, z,
                             preferred_element_type=jnp.float32)
            return out.astype(img.dtype)

        xr = jnp.moveaxis(xf, 1, 0)   # [H, B, W]: one output row per step
        yr = jnp.moveaxis(yf, 1, 0)
        sr = jnp.moveaxis(start, 1, 0)
        out = jax.lax.map(jax.checkpoint(body), (xr, yr, sr))  # [H, B, W, C]
        return jnp.moveaxis(out, 0, 1)

    def dense(_):
        return bilinear_sample_mxu(img, xf, yf, pad=pad).reshape(b, h, w, c)

    return jax.lax.cond(fits, banded, dense, None)


def _mxu_backend() -> bool:
    """MXU-style dense-contraction resampling only pays off where matmuls
    are ~free relative to gathers (TPU/GPU). On the CPU test backend the
    4-tap gather is orders of magnitude cheaper than the hat einsums."""
    return jax.default_backend() != "cpu"


# Pixel count at and above which the MXU hat-matmul sampler beats XLA's
# per-element gather on TPU (measured; gather wins only on tiny images
# where einsum padding overhead dominates).
_MXU_SAMPLE_MIN_PIXELS = 64 * 64

# Source-row window for the banded warp; spans beyond this fall back to
# the dense sampler inside the op (exactness is never band-dependent).
_WARP_BAND = 96

# Below this size the dense MXU sampler's single big einsum beats the
# banded scan's per-row step overhead (measured: at 192x320 dense is
# ~2 ms in-jit vs ~190 scan steps for banded).
_WARP_BANDED_MIN_PIXELS = 200_000


def _pallas_spans_fit(x: jnp.ndarray, y: jnp.ndarray, h: int, w: int,
                      band: int | None = None) -> jnp.ndarray:
    """True when every row's vertical tap span fits the Pallas kernel's
    band window and every TILE-column tile's horizontal span fits XBAND.

    Spans are measured on [-1, dim]-clipped coordinates (out-of-image
    taps beyond that range carry zero weight), matching the window
    placement inside `pallas.warp_pallas._windows`; the kernel aligns
    window starts DOWN to Mosaic's tile grid (8 rows / 128 cols), so the
    budget reserves that worst-case high-side loss.
    """
    from .pallas.warp_pallas import BAND, TILE, XBAND

    if band is None:
        band = BAND
    b = x.shape[0]
    ys = jax.lax.stop_gradient(jnp.clip(y, -1.0, float(h)))
    lo = jnp.floor(jnp.min(ys, axis=2))
    hi = jnp.floor(jnp.max(ys, axis=2)) + 1.0
    fits_y = jnp.max(hi - lo) + 1.0 <= float(band - 7)
    xs = jax.lax.stop_gradient(jnp.clip(x, -1.0, float(w))).reshape(b, -1, w // TILE, TILE)
    xlo = jnp.floor(jnp.min(xs, axis=3)) - 1.0
    xhi = jnp.floor(jnp.max(xs, axis=3)) + 1.0
    fits_x = jnp.max(xhi - xlo) + 1.0 <= float(XBAND - 127)
    return jnp.logical_and(fits_y, fits_x)


def _flow_warp_pallas(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                      pad: str, grad_img: bool = True) -> jnp.ndarray:
    """VMEM-resident Pallas sampler with a global dense fallback cond.

    The kernel (`ops/pallas/warp_pallas.py`) generates the hat factors
    on-chip — the XLA banded path's dominant HBM traffic — and windows
    the source columns as well as rows. Exactness never depends on the
    window sizes: any span overflow switches the whole call to the dense
    MXU sampler.
    """
    from .pallas.warp_pallas import warp_pallas

    b, h, w, c = img.shape
    xf = x.reshape(b, h, w).astype(jnp.float32)
    yf = y.reshape(b, h, w).astype(jnp.float32)
    if pad == "border":
        xf = jnp.clip(xf, 0.0, float(w - 1))
        yf = jnp.clip(yf, 0.0, float(h - 1))
    fits = _pallas_spans_fit(xf, yf, h, w)
    return jax.lax.cond(
        fits,
        lambda _: warp_pallas(img, xf, yf, False, grad_img),
        lambda _: bilinear_sample_mxu(img, xf, yf, pad=pad).reshape(b, h, w, c),
        None)


def flow_warp(x: jnp.ndarray, flow: jnp.ndarray, pad: str = "border",
              grad_img: bool = True) -> jnp.ndarray:
    """Backward-warp x [B, H, W, C] by flow [B, H, W, 2] (u=x, v=y).

    Dispatches on size: large images use the gather-free MXU hat-matmul
    sampler (`bilinear_sample_mxu`); tiny ones keep the 4-tap gather form
    (measured faster there than the [2,2,C] patch-gather variant — XLA
    lowers small-slice gathers per element either way).
    Coordinates are always f32 — bf16 spacing at 512 is 2.0, so bf16 pixel
    coordinates would be off by whole pixels on 640-wide AMD frames; only
    the image VALUES follow the caller's dtype."""
    b, h, w, _ = x.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
                          indexing="ij")
    fl = flow.astype(jnp.float32)
    cx = xs[None] + fl[..., 0]
    cy = ys[None] + fl[..., 1]
    # Hat-einsum cost scales with C while gather cost is per-index
    # (taps move C contiguous elements), so wide FEATURE maps (PWC-Lite
    # warps 32-128-channel pyramids) stay on the gather path; the MXU
    # paths cover images/flows/masks (C <= 8).
    c = x.shape[-1]
    if h * w < _MXU_SAMPLE_MIN_PIXELS or c > 8 or not _mxu_backend():
        return bilinear_sample(x, cx, cy, pad=pad)
    from .pallas.warp_pallas import shapes_supported

    # grad_img=False (image is pure data, e.g. photometric-loss warps)
    # lets the Pallas backward skip its dimg third; the XLA paths below
    # are transparent and autodiff prunes the dead cotangent by itself.
    if h * w >= _WARP_BANDED_MIN_PIXELS and shapes_supported(h, w):
        return _flow_warp_pallas(x, cx, cy, pad=pad, grad_img=grad_img)
    if h * w >= _WARP_BANDED_MIN_PIXELS and h > _WARP_BAND:
        return _flow_warp_banded(x, cx, cy, pad=pad, band=_WARP_BAND)
    return bilinear_sample_mxu(x, cx, cy, pad=pad)


def _corresponding_map_banded(flow: jnp.ndarray, band: int) -> jnp.ndarray:
    """Row-banded forward splat: the transpose of `_flow_warp_banded`.

    A source row's bilinear mass lands on target rows within its flow's
    vertical span, so per source row the [B, W, H] tri_y factor shrinks to
    [B, W, band] and the contribution is overlap-added into the density
    via a per-batch dynamic_update_slice. Guarded by the same global cond:
    any row whose span exceeds the band falls back to the dense splat.
    """
    b, h, w, _ = flow.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    fl = flow.astype(jnp.float32)
    tx = xs[None] + fl[..., 0]          # [B, H, W] target coords
    ty = ys[None] + fl[..., 1]
    ysp = jax.lax.stop_gradient(jnp.clip(ty, -1.0, float(h)))
    lo = jnp.floor(jnp.min(ysp, axis=2))      # [B, H] per source row
    hi = jnp.floor(jnp.max(ysp, axis=2)) + 1.0
    fits = jnp.max(hi - lo) + 1.0 <= float(band)
    start = jnp.clip(lo.astype(jnp.int32), 0, h - band)
    cols_x = jnp.arange(w, dtype=jnp.float32)
    rows = jnp.arange(band, dtype=jnp.float32)

    def banded(_):
        def body(acc, args):
            xi, yi, st = args  # [B, W], [B, W], [B]
            tri_x = jnp.maximum(0.0, 1.0 - jnp.abs(xi[..., None] - cols_x))
            abs_rows = st[:, None].astype(jnp.float32) + rows
            tri_y = jnp.maximum(
                0.0, 1.0 - jnp.abs(yi[..., None] - abs_rows[:, None, :]))
            contrib = jnp.einsum("bpy,bpx->byx", tri_y, tri_x,
                                 preferred_element_type=jnp.float32)

            def upd(a, s, ct):
                sl = jax.lax.dynamic_slice(a, (s, 0), (band, w))
                return jax.lax.dynamic_update_slice(a, sl + ct, (s, 0))

            return jax.vmap(upd)(acc, st, contrib), None

        acc0 = jnp.zeros((b, h, w), jnp.float32)
        out, _ = jax.lax.scan(body, acc0,
                              (jnp.moveaxis(tx, 1, 0), jnp.moveaxis(ty, 1, 0),
                               jnp.moveaxis(start, 1, 0)))
        return out

    return jax.lax.cond(fits, banded, lambda _: _corresponding_map_dense(flow),
                        None).astype(flow.dtype)


def corresponding_map(flow: jnp.ndarray) -> jnp.ndarray:
    """Forward-splat an all-ones map along flow [B, H, W, 2] -> [B, H, W].

    Exact `warp_utils.get_corresponding_map` semantics (bilinear splat of 1
    at base + flow, out-of-range corners dropped), computed WITHOUT a
    scatter — see `_corresponding_map_dense` for the factorization and
    `_corresponding_map_banded` for the row-banded fast path used at
    video-frame sizes. TPU-native replacement for the reference's
    scatter_add (`utils/warp_utils.py:27-81`), which is gather/scatter-
    bound on TPU (round-1 AMD step was 881 ms, scatter-bound).
    """
    b, h, w, _ = flow.shape
    if _mxu_backend() and h * w >= _WARP_BANDED_MIN_PIXELS:
        from .pallas.warp_pallas import (SPLAT_BAND, shapes_supported,
                                         splat_pallas)

        if shapes_supported(h, w, band=SPLAT_BAND):
            ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                                  jnp.arange(w, dtype=jnp.float32), indexing="ij")
            fl = jax.lax.stop_gradient(flow.astype(jnp.float32))
            tx = xs[None] + fl[..., 0]
            ty = ys[None] + fl[..., 1]
            fits = _pallas_spans_fit(tx, ty, h, w, band=SPLAT_BAND)
            return jax.lax.cond(
                fits,
                lambda _: splat_pallas(tx, ty, h, w),
                lambda _: _corresponding_map_dense(flow).astype(jnp.float32),
                None).astype(flow.dtype)
        if h > _WARP_BAND:
            return _corresponding_map_banded(flow, _WARP_BAND)
    return _corresponding_map_dense(flow).astype(flow.dtype)


def _corresponding_map_dense(flow: jnp.ndarray) -> jnp.ndarray:
    """Dense chunked-einsum splat:

        out[b, i, j] = sum_p TRI_Y[b, p, i] * TRI_X[b, p, j]

    over source pixels p; a cell index outside [0, H) x [0, W) simply has
    no column, which reproduces the reference's dropped corners."""
    b, h, w, _ = flow.shape
    # f32 coordinate math regardless of flow dtype (see flow_warp).
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
                          indexing="ij")
    fl = flow.astype(jnp.float32)
    x = (xs[None] + fl[..., 0]).reshape(b, -1)  # [B, P] target x coords
    y = (ys[None] + fl[..., 1]).reshape(b, -1)
    cols_x = jnp.arange(w, dtype=jnp.float32)
    cols_y = jnp.arange(h, dtype=jnp.float32)

    # Chunk source pixels so the [B, chunk, H/W] triangle factors stay small
    # (AMD splats at full 384x640: un-chunked factors would be ~3 GB).
    p = h * w
    chunk = min(p, 8192)
    pad = (-p) % chunk
    if pad:
        # Padded pixels target y = -2: zero weight in every cell.
        x = jnp.pad(x, ((0, 0), (0, pad)))
        y = jnp.pad(y, ((0, 0), (0, pad)), constant_values=-2.0)
    n_chunks = (p + pad) // chunk
    xc = jnp.moveaxis(x.reshape(b, n_chunks, chunk), 1, 0)
    yc = jnp.moveaxis(y.reshape(b, n_chunks, chunk), 1, 0)

    def body(acc, xy):
        xi, yi = xy
        tri_x = jnp.maximum(0.0, 1.0 - jnp.abs(xi[..., None] - cols_x))  # [B, c, W]
        tri_y = jnp.maximum(0.0, 1.0 - jnp.abs(yi[..., None] - cols_y))  # [B, c, H]
        return acc + jnp.einsum("bpi,bpj->bij", tri_y, tri_x,
                                preferred_element_type=jnp.float32), None

    out, _ = jax.lax.scan(body, jnp.zeros((b, h, w), jnp.float32), (xc, yc))
    return out.astype(flow.dtype)


def occu_mask_backward(flow21: jnp.ndarray, th: float = 0.2) -> jnp.ndarray:
    """[B, H, W] float mask: 1 where occluded (correspondence density < th)."""
    corr = jnp.clip(corresponding_map(flow21), 0.0, 1.0)
    return (corr < th).astype(jnp.float32)


def occu_mask_bidirection(flow12: jnp.ndarray, flow21: jnp.ndarray,
                          scale: float = 0.01, bias: float = 0.5) -> jnp.ndarray:
    flow21_warped = flow_warp(flow21, flow12, pad="zeros")
    diff = flow12 + flow21_warped
    mag = jnp.sum(flow12**2, -1) + jnp.sum(flow21_warped**2, -1)
    occ = jnp.sum(diff**2, -1) > (scale * mag + bias)
    return occ.astype(jnp.float32)


def correlation(x1: jnp.ndarray, x2: jnp.ndarray, max_displacement: int = 4) -> jnp.ndarray:
    """Cost volume [B, H, W, (2d+1)^2]: mean over channels of x1 * shift(x2)."""
    b, h, w, c = x1.shape
    d = max_displacement
    x2p = jnp.pad(x2, ((0, 0), (d, d), (d, d), (0, 0)))
    outs = []
    for i in range(2 * d + 1):
        for j in range(2 * d + 1):
            shifted = jax.lax.dynamic_slice(x2p, (0, i, j, 0), (b, h, w, c))
            # Channel mean accumulates in f32 even for bf16 features.
            outs.append(jnp.mean(x1 * shifted, axis=-1, dtype=jnp.float32))
    return jnp.stack(outs, axis=-1).astype(x1.dtype)
