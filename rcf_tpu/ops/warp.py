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


def flow_warp(x: jnp.ndarray, flow: jnp.ndarray, pad: str = "border") -> jnp.ndarray:
    """Backward-warp x [B, H, W, C] by flow [B, H, W, 2] (u=x, v=y)."""
    b, h, w, _ = x.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=flow.dtype), jnp.arange(w, dtype=flow.dtype),
                          indexing="ij")
    return bilinear_sample(x, xs[None] + flow[..., 0], ys[None] + flow[..., 1], pad=pad)


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
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=flow.dtype), jnp.arange(w, dtype=flow.dtype),
                          indexing="ij")
    x = (xs[None] + flow[..., 0]).reshape(b, -1)  # [B, P] target x coords
    y = (ys[None] + flow[..., 1]).reshape(b, -1)
    cols_x = jnp.arange(w, dtype=flow.dtype)
    cols_y = jnp.arange(h, dtype=flow.dtype)

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
