"""Pallas TPU kernels for bilinear flow warping and the forward splat.

Replaces the XLA hat-matmul samplers (`ops/warp.py::bilinear_sample_mxu`
/ `_flow_warp_banded`) on the AMD hot path. Those are *algebraically*
right for TPU (no gathers — the bilinear kernel factorizes into two hat
contractions riding the MXU), but XLA materializes every per-row dense
hat factor and the [p, band, C] intermediate in HBM: the measured AMD
step is HBM-bound at ~480 GB/s (tools/attrib_amd_step.py). Here the hat
weights are generated *inside* the kernel in VMEM, the first
contraction's output never leaves VMEM, and the source window is doubly
banded:

  * y-banded: one output row reads source rows in a `BAND`-row window
    around its flow's vertical span (as the XLA banded path);
  * x-banded: a 128-column output tile reads source columns in an
    `XBAND`-column window around its horizontal span — cutting the
    dominant matmul's K dimension from W to XBAND (2.5x at 640-wide
    AMD frames), which the XLA path never exploited.

Layout: kernels are channel-planar ([C, H, W] blocks). A [H, W, 3]
VMEM block would pad the 3-lane channel dim to 128 lanes (43x memory
blow-up); with W last, tiles are dense and every contraction has a
128-lane minor axis. Wrappers transpose NHWC<->NCHW at HBM cost of one
image read/write (~0.1 ms at AMD shapes, noise next to the savings).

Exactness: identical math to `bilinear_sample_mxu` (triangle weights at
absolute tap positions; a tap outside the window has weight 0 there and
0 here when the window covers the tile's span — the caller guards with
a global `fits` cond and falls back to the dense sampler, so results
never depend on the band sizes; see `ops/warp.py::flow_warp`).

Semantics parity target: grid_sample(align_corners=True) as used by
`utils/warp_utils.py:84-94` of the reference; the caller pre-clamps
coordinates for 'border' padding, and out-of-image taps dropping to
zero weight IS 'zeros' padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output-column tile (MXU lane width) and source-column window per tile.
TILE = 128
XBAND = 384
# Source-row window per output-row group for the WARP kernels. 128 (one
# MXU tile) so the C source windows can be stacked into one [C*BAND,
# XBAND] operand and every per-channel lane-segment slice of the stacked
# product is 128-aligned. The MXU pads N to 128-tiles either way, so a
# 128 band costs the same matmul cycles as the 96 the XLA banded path
# uses (`ops/warp.py::_WARP_BAND`) while tripling the matmul width.
BAND = 128
# Source-row window for the (channel-less) splat kernel, where the band
# IS the matmul's M dimension and 96 keeps the contribution smaller.
SPLAT_BAND = 96
# Output rows per grid step (amortizes per-step block DMA overhead).
ROWS = 8


def _hat(c, centers):
    """Triangle weights max(0, 1-|c - centers|): [T, K] from [T] and [T, K]."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(c[:, None] - centers))


def _dhat(c, centers):
    """d/dc of `_hat`: -sign(c - centers) where |c - centers| < 1."""
    d = c[:, None] - centers
    return jnp.where(jnp.abs(d) < 1.0, -jnp.sign(d), 0.0)


def _windows(cx_t, cy_r, h, w, band=BAND):
    """(ystart, xstart) of the [band, XBAND] source window for one tile.

    Starts are data-dependent scalars (fine: dynamic_slice with static
    sizes); weights use ABSOLUTE tap positions so window placement never
    changes values, only which (guaranteed in-span) taps are visible.
    Coordinates are span-clipped to [-1, dim] first so far-out zeros-mode
    samples (whose taps all have zero weight) can't drag the window away
    from the in-image taps the caller's fits-guard accounted for.
    """
    ystart = jnp.clip(
        jnp.floor(jnp.min(jnp.clip(cy_r, -1.0, float(h)))).astype(jnp.int32),
        0, h - band)
    xstart = jnp.clip(
        jnp.floor(jnp.min(jnp.clip(cx_t, -1.0, float(w)))).astype(jnp.int32) - 1,
        0, w - XBAND)
    # Mosaic dynamic slices must be tile-aligned (sublane x8, lane x128);
    # align DOWN — coverage only grows on the low side, and the caller's
    # fits-guard budgets the up-to-(8-1)/(128-1) high-side loss.
    ystart = pl.multiple_of((ystart // 8) * 8, 8)
    xstart = pl.multiple_of((xstart // 128) * 128, 128)
    return ystart, xstart


def _abs_taps(ystart, xstart, band=BAND):
    # Mosaic iota is integer-only; cast after the add.
    xa = (xstart + jax.lax.broadcasted_iota(
        jnp.int32, (TILE, XBAND), 1)).astype(jnp.float32)
    ya = (ystart + jax.lax.broadcasted_iota(
        jnp.int32, (TILE, band), 1)).astype(jnp.float32)
    return ya, xa


def _stack_windows(img_ref, c, ystart, xstart):
    """[C*BAND, XBAND] sublane-stack of the per-channel source windows.

    The channel segments sit in the (un-contracted) N dimension of the
    tile matmul, so stacking changes no summation order — z_all's lane
    segment ci IS the per-channel z, bit-for-bit."""
    return jnp.concatenate(
        [img_ref[0, ci, pl.ds(ystart, BAND), pl.ds(xstart, XBAND)]
         for ci in range(c)], axis=0)


def _rep(v, c):
    """Tile a [T, BAND] factor across the C lane segments: [T, C*BAND]."""
    return jnp.concatenate([v] * c, axis=1)


def _warp_fwd_kernel(img_ref, cx_ref, cy_ref, out_ref):
    """Grid (B, H//ROWS). img [1,C,H,W] VMEM-resident per batch;
    cx/cy [1,ROWS*W] row-flattened (a traced row index on a sublane dim
    is not provably 8-aligned for Mosaic, but r*W on the lane dim is a
    multiple of 128 whenever W is); out [1,C,ROWS*W]."""
    h, w, c = img_ref.shape[2], img_ref.shape[3], img_ref.shape[1]

    def row(r, _):
        rw = pl.multiple_of(r * w, 128)
        cy_r = cy_ref[0, 0, pl.ds(rw, w)]
        # Tile/channel loops are static unrolls; the row loop is a
        # fori_loop so Mosaic reuses one row's stack instead of
        # allocating ROWS x tiles x C live temporaries.
        for t in range(w // TILE):
            sl = slice(t * TILE, (t + 1) * TILE)
            cx_t = cx_ref[0, 0, pl.ds(rw + t * TILE, TILE)]
            ystart, xstart = _windows(cx_t, cy_r, h, w)
            ya, xa = _abs_taps(ystart, xstart)
            tri_x = _hat(cx_t, xa).astype(img_ref.dtype)
            tri_y = _hat(cy_r[sl], ya)                     # [T, BAND] f32
            win_all = _stack_windows(img_ref, c, ystart, xstart)
            # z_all[p, ci*BAND+y] = sum_x tri_x[p, x] win_ci[y, x]  (one
            # MXU matmul for all channels; N segments are independent).
            z_all = jax.lax.dot_general(
                tri_x, win_all, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # [T, C*BAND]
            zt = z_all * _rep(tri_y, c)
            for ci in range(c):
                out = jnp.sum(zt[:, ci * BAND:(ci + 1) * BAND], axis=1)
                out_ref[0, ci, pl.ds(rw + t * TILE, TILE)] = (
                    out.astype(out_ref.dtype))
        return 0

    jax.lax.fori_loop(0, ROWS, row, 0)


def _warp_bwd_kernel(img_ref, cx_ref, cy_ref, g_ref, dimg_ref, dcx_ref, dcy_ref):
    """One recompute-forward pass emitting dimg / dcx / dcy.

    dimg accumulates into a per-batch [1,C,H,W] f32 block that stays in
    VMEM across the row-group grid steps (TPU grids run sequentially);
    the overlap-add that XLA serialized through HBM happens on-chip.
    """
    h, w = img_ref.shape[2], img_ref.shape[3]

    @pl.when(pl.program_id(1) == 0)
    def _():
        dimg_ref[...] = jnp.zeros(dimg_ref.shape, dimg_ref.dtype)

    c = img_ref.shape[1]

    def row(r, _):
        rw = pl.multiple_of(r * w, 128)
        cy_r = cy_ref[0, 0, pl.ds(rw, w)]
        for t in range(w // TILE):
            sl = slice(t * TILE, (t + 1) * TILE)
            cx_t = cx_ref[0, 0, pl.ds(rw + t * TILE, TILE)]
            cy_t = cy_r[sl]
            ystart, xstart = _windows(cx_t, cy_r, h, w)
            ya, xa = _abs_taps(ystart, xstart)
            tri_x = _hat(cx_t, xa)                         # [T, XBAND] f32
            tri_y = _hat(cy_t, ya)                         # [T, BAND]  f32
            win_all = _stack_windows(img_ref, c, ystart, xstart)
            g_rep = jnp.concatenate(
                [jnp.broadcast_to(
                    g_ref[0, ci, pl.ds(rw + t * TILE, TILE)].astype(
                        jnp.float32)[:, None], (TILE, BAND))
                 for ci in range(c)], axis=1)              # [T, C*BAND]
            z_all = jax.lax.dot_general(
                tri_x.astype(img_ref.dtype), win_all, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # [T, C*BAND]
            # dcy: d out[p] / d tri_y[p,y] = z[p,y], summed over channels.
            dcy_ref[0, 0, pl.ds(rw + t * TILE, TILE)] = jnp.sum(
                z_all * g_rep * _rep(_dhat(cy_t, ya), c), axis=1)
            # Shared cotangent factor w[p, ci*BAND+y] = g_ci[p] tri_y[p,y].
            wy_all = g_rep * _rep(tri_y, c)                # [T, C*BAND]
            # dtri_x[p,x] = sum_{ci,y} w[p,ci,y] win_ci[y,x]: contraction
            # over the stacked axis covers the channel sum in one matmul.
            dtri_x = jax.lax.dot_general(
                wy_all, win_all.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [T, XBAND]
            dcx_ref[0, 0, pl.ds(rw + t * TILE, TILE)] = jnp.sum(
                dtri_x * _dhat(cx_t, xa), axis=1)
            # dimg_ci[y,x] += sum_p w[p,ci,y] tri_x[p,x]
            contrib_all = jax.lax.dot_general(
                wy_all, tri_x, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [C*BAND, XBAND]
            for ci in range(c):
                cur = dimg_ref[0, ci, pl.ds(ystart, BAND), pl.ds(xstart, XBAND)]
                dimg_ref[0, ci, pl.ds(ystart, BAND), pl.ds(xstart, XBAND)] = (
                    cur + contrib_all[ci * BAND:(ci + 1) * BAND, :])
        return 0

    jax.lax.fori_loop(0, ROWS, row, 0)


def _warp_bwd_kernel_nodimg(img_ref, cx_ref, cy_ref, g_ref, dcx_ref, dcy_ref):
    """Backward pass emitting only dcx / dcy (no image cotangent).

    For warps of pure DATA (the unflow photometric loss warps input
    images, which carry no gradient in the reference either —
    `utils/warp_utils.py:84-94` is applied to requires_grad=False
    frames), the dimg third of the backward matmuls and its VMEM
    overlap-add are dead work the opaque kernel boundary would otherwise
    prevent XLA from pruning.
    """
    h, w = img_ref.shape[2], img_ref.shape[3]
    c = img_ref.shape[1]

    def row(r, _):
        rw = pl.multiple_of(r * w, 128)
        cy_r = cy_ref[0, 0, pl.ds(rw, w)]
        for t in range(w // TILE):
            sl = slice(t * TILE, (t + 1) * TILE)
            cx_t = cx_ref[0, 0, pl.ds(rw + t * TILE, TILE)]
            cy_t = cy_r[sl]
            ystart, xstart = _windows(cx_t, cy_r, h, w)
            ya, xa = _abs_taps(ystart, xstart)
            tri_x = _hat(cx_t, xa)                         # [T, XBAND] f32
            tri_y = _hat(cy_t, ya)                         # [T, BAND]  f32
            win_all = _stack_windows(img_ref, c, ystart, xstart)
            g_rep = jnp.concatenate(
                [jnp.broadcast_to(
                    g_ref[0, ci, pl.ds(rw + t * TILE, TILE)].astype(
                        jnp.float32)[:, None], (TILE, BAND))
                 for ci in range(c)], axis=1)              # [T, C*BAND]
            z_all = jax.lax.dot_general(
                tri_x.astype(img_ref.dtype), win_all, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # [T, C*BAND]
            dcy_ref[0, 0, pl.ds(rw + t * TILE, TILE)] = jnp.sum(
                z_all * g_rep * _rep(_dhat(cy_t, ya), c), axis=1)
            wy_all = g_rep * _rep(tri_y, c)                # [T, C*BAND]
            dtri_x = jax.lax.dot_general(
                wy_all, win_all.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [T, XBAND]
            dcx_ref[0, 0, pl.ds(rw + t * TILE, TILE)] = jnp.sum(
                dtri_x * _dhat(cx_t, xa), axis=1)
        return 0

    jax.lax.fori_loop(0, ROWS, row, 0)


def _splat_kernel(tx_ref, ty_ref, out_ref):
    """Forward bilinear splat of ones: out[y,x] = sum_p hat_y * hat_x.

    Transpose of the warp: per source-row group, the contribution lands
    in a [BAND, XBAND] window of the density, overlap-added on-chip.
    """
    h, w = out_ref.shape[1], out_ref.shape[2]

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    def row(r, _):
        rw = pl.multiple_of(r * w, 128)
        ty_r = ty_ref[0, 0, pl.ds(rw, w)]
        for t in range(w // TILE):
            sl = slice(t * TILE, (t + 1) * TILE)
            tx_t = tx_ref[0, 0, pl.ds(rw + t * TILE, TILE)]
            ystart, xstart = _windows(tx_t, ty_r, h, w, band=SPLAT_BAND)
            ya, xa = _abs_taps(ystart, xstart, band=SPLAT_BAND)
            tri_x = _hat(tx_t, xa)
            tri_y = _hat(ty_r[sl], ya)
            contrib = jax.lax.dot_general(
                tri_y, tri_x, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # [SPLAT_BAND, XBAND]
            cur = out_ref[0, pl.ds(ystart, SPLAT_BAND), pl.ds(xstart, XBAND)]
            out_ref[0, pl.ds(ystart, SPLAT_BAND), pl.ds(xstart, XBAND)] = (
                cur + contrib)
        return 0

    jax.lax.fori_loop(0, ROWS, row, 0)


def _row_spec(w):
    # Rows flattened into the lane axis: [B, 1, H*W] blocked as
    # [1, 1, ROWS*W] (the singleton keeps the sublane block dim equal to
    # the array dim, as the TPU lowering requires).
    return pl.BlockSpec((1, 1, ROWS * w), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)


def _img_spec(c, h, w):
    return pl.BlockSpec((1, c, h, w), lambda i, j: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _rows_chan_spec(c, w):
    return pl.BlockSpec((1, c, ROWS * w), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)


def shapes_supported(h: int, w: int, band: int = BAND) -> bool:
    return h % ROWS == 0 and w % TILE == 0 and h >= band and w >= XBAND


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def warp_pallas(img: jnp.ndarray, cx: jnp.ndarray, cy: jnp.ndarray,
                interpret: bool = False, need_dimg: bool = True) -> jnp.ndarray:
    """Sample img [B,H,W,C] at absolute coords cx/cy [B,H,W] f32.

    Caller contract (enforced by `ops/warp.py::flow_warp`):
    * shapes_supported(H, W) is True;
    * every output row's vertical tap span fits a BAND window and every
      128-col tile's horizontal span fits an XBAND window (else the
      caller's `fits` cond must take the dense path);
    * 'border' padding == caller pre-clamps coords; out-of-window taps
      contribute zero weight, which is 'zeros' padding for free.

    ``need_dimg=False`` declares that the IMAGE cotangent is dead (the
    image is pure data, as in every photometric-loss warp): the backward
    kernel then skips the dimg matmul + VMEM overlap-add (a third of its
    MXU work) and returns a symbolic zero. Setting it False for an image
    that DOES need gradients silently zeroes them — callers own this.
    """
    return _warp_fwd_impl(img, cx, cy, interpret)


def _warp_fwd_impl(img, cx, cy, interpret):
    b, h, w, c = img.shape
    planar = jnp.moveaxis(img, 3, 1)  # [B, C, H, W]
    out = pl.pallas_call(
        _warp_fwd_kernel,
        grid=(b, h // ROWS),
        in_specs=[_img_spec(c, h, w), _row_spec(w), _row_spec(w)],
        out_specs=_rows_chan_spec(c, w),
        out_shape=jax.ShapeDtypeStruct((b, c, h * w), img.dtype),
        interpret=interpret,
    )(planar, cx.reshape(b, 1, h * w), cy.reshape(b, 1, h * w))
    return jnp.moveaxis(out.reshape(b, c, h, w), 1, 3)


def _warp_fwd_rule(img, cx, cy, interpret, need_dimg):
    return _warp_fwd_impl(img, cx, cy, interpret), (img, cx, cy)


def _warp_bwd_rule(interpret, need_dimg, res, g):
    img, cx, cy = res
    b, h, w, c = img.shape
    if not need_dimg:
        dcx, dcy = pl.pallas_call(
            _warp_bwd_kernel_nodimg,
            grid=(b, h // ROWS),
            in_specs=[_img_spec(c, h, w), _row_spec(w), _row_spec(w),
                      _rows_chan_spec(c, w)],
            out_specs=[_row_spec(w), _row_spec(w)],
            out_shape=[
                jax.ShapeDtypeStruct((b, 1, h * w), jnp.float32),
                jax.ShapeDtypeStruct((b, 1, h * w), jnp.float32),
            ],
            interpret=interpret,
        )(jnp.moveaxis(img, 3, 1), cx.reshape(b, 1, h * w),
          cy.reshape(b, 1, h * w), jnp.moveaxis(g, 3, 1).reshape(b, c, h * w))
        return (jnp.zeros_like(img), dcx.reshape(b, h, w), dcy.reshape(b, h, w))
    dimg, dcx, dcy = pl.pallas_call(
        _warp_bwd_kernel,
        grid=(b, h // ROWS),
        in_specs=[_img_spec(c, h, w), _row_spec(w), _row_spec(w),
                  _rows_chan_spec(c, w)],
        out_specs=[_img_spec(c, h, w), _row_spec(w), _row_spec(w)],
        out_shape=[
            jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, h * w), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, h * w), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.moveaxis(img, 3, 1), cx.reshape(b, 1, h * w), cy.reshape(b, 1, h * w),
      jnp.moveaxis(g, 3, 1).reshape(b, c, h * w))
    return (jnp.moveaxis(dimg, 1, 3).astype(img.dtype),
            dcx.reshape(b, h, w), dcy.reshape(b, h, w))


warp_pallas.defvjp(_warp_fwd_rule, _warp_bwd_rule)


def splat_pallas(tx: jnp.ndarray, ty: jnp.ndarray, h: int, w: int,
                 interpret: bool = False) -> jnp.ndarray:
    """Splat ones at (tx, ty) [B,H,W] -> density [B,h,w] f32.

    Non-differentiable by design: the only consumer thresholds the
    density (`occu_mask_backward`), where gradients die exactly as in
    the reference (`utils/warp_utils.py:108-113`).
    """
    b, sh, sw = tx.shape
    tx = jax.lax.stop_gradient(tx).reshape(b, 1, sh * sw)
    ty = jax.lax.stop_gradient(ty).reshape(b, 1, sh * sw)
    return pl.pallas_call(
        _splat_kernel,
        grid=(b, sh // ROWS),
        in_specs=[_row_spec(sw), _row_spec(sw)],
        out_specs=pl.BlockSpec((1, h, w), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        interpret=interpret,
    )(tx, ty)
