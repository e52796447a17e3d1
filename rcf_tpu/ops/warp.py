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


def flow_warp(x: jnp.ndarray, flow: jnp.ndarray, pad: str = "border") -> jnp.ndarray:
    """Backward-warp x [B, H, W, C] by flow [B, H, W, 2] (u=x, v=y).

    Uses the 4-tap gather form: measured FASTER on TPU than the single
    [2,2,C] patch-gather variant below (XLA lowers small-slice gathers per
    element either way, and the 4-tap form fuses with the interpolation).
    Coordinates are always f32 — bf16 spacing at 512 is 2.0, so bf16 pixel
    coordinates would be off by whole pixels on 640-wide AMD frames; only
    the gathered image VALUES follow the caller's dtype (bf16 images warp
    ~1.7x faster: 49 -> 29 ms at 8x384x640)."""
    b, h, w, _ = x.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
                          indexing="ij")
    fl = flow.astype(jnp.float32)
    return bilinear_sample(x, xs[None] + fl[..., 0], ys[None] + fl[..., 1], pad=pad)


def corresponding_map(flow: jnp.ndarray) -> jnp.ndarray:
    """Forward-splat an all-ones map along flow [B, H, W, 2] -> [B, H, W].

    Exact `warp_utils.get_corresponding_map` semantics (bilinear splat of 1
    at base + flow, out-of-range corners dropped), computed WITHOUT a
    scatter: the bilinear corner weight factorizes per axis,
    ``w(corner) = tri(y - yc) * tri(x - xc)`` with ``tri(d) = max(0, 1-|d|)``,
    so the density is a single MXU contraction

        out[b, i, j] = sum_p TRI_Y[b, p, i] * TRI_X[b, p, j]

    over source pixels p. Dropped corners fall out for free: a cell index
    outside [0, H) x [0, W) simply has no column. TPU-native replacement for
    the reference's scatter_add (`utils/warp_utils.py:27-81`), which is
    gather/scatter-bound on TPU (round-1 AMD step was 881 ms, scatter-bound).
    """
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
            outs.append(jnp.mean(x1 * shifted, axis=-1))
    return jnp.stack(outs, axis=-1)
