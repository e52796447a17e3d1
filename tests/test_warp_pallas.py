"""Pallas warp/splat kernels vs the exact gather/dense references.

Interpret mode (CPU backend) exercises the exact kernel program. The
production dispatch (`ops/warp.py::flow_warp` / `corresponding_map`)
only selects these kernels on non-CPU backends, so parity here is
against the same functions the TPU runs.

Gradient parity caveat: at exact-integer coordinates the hat-factor
subgradient (0) differs from the gather VJP's right-derivative — the
same measure-zero kink convention as the XLA banded sampler
(`tests/test_amd.py::test_flow_warp_banded_gradient_matches_gather`).
Tests draw non-integer coordinates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcf_tpu.ops.warp import _corresponding_map_dense, bilinear_sample
from rcf_tpu.ops.pallas.warp_pallas import (
    BAND, XBAND, shapes_supported, splat_pallas, warp_pallas)

B, H, W, C = 2, 128, 384, 3


def _coords(scale=5.0, seed=2):
    rng = np.random.default_rng(seed)
    fl = jnp.asarray((rng.standard_normal((B, H, W, 2)) * scale).astype(np.float32))
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    return fl, xs[None] + fl[..., 0], ys[None] + fl[..., 1]


def _img(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((B, H, W, C)).astype(np.float32))


def test_shapes_supported():
    assert shapes_supported(H, W)
    assert shapes_supported(384, 640)  # AMD full-res
    assert not shapes_supported(95, W)      # H % ROWS
    assert not shapes_supported(H, 320)     # W % TILE
    assert not shapes_supported(64, W)      # H < BAND
    assert not shapes_supported(H, 256)     # W < XBAND


def test_warp_forward_border_matches_gather():
    img = _img()
    _, cx, cy = _coords()
    cxb = jnp.clip(cx, 0, W - 1)
    cyb = jnp.clip(cy, 0, H - 1)
    out = warp_pallas(img, cxb, cyb, True)
    ref = bilinear_sample(img, cxb, cyb, pad="border")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_warp_forward_zeros_matches_gather():
    img = _img()
    _, cx, cy = _coords(scale=9.0)
    out = warp_pallas(img, cx, cy, True)
    ref = bilinear_sample(img, cx, cy, pad="zeros")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_warp_gradients_match_gather():
    img = _img()
    fl, _, _ = _coords()
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")

    def clipped(f):
        return (jnp.clip(xs[None] + f[..., 0], 0, W - 1),
                jnp.clip(ys[None] + f[..., 1], 0, H - 1))

    def lp(f, im):
        cx, cy = clipped(f)
        return jnp.sum(jnp.sin(warp_pallas(im, cx, cy, True)))

    def lg(f, im):
        return jnp.sum(jnp.sin(bilinear_sample(
            im, xs[None] + f[..., 0], ys[None] + f[..., 1], pad="border")))

    gp_f, gp_i = jax.grad(lp, argnums=(0, 1))(fl, img)
    gg_f, gg_i = jax.grad(lg, argnums=(0, 1))(fl, img)
    np.testing.assert_allclose(np.asarray(gp_i), np.asarray(gg_i), atol=1e-5)
    # Exclude the measure-zero integer-coordinate kinks (none expected
    # from continuous draws, but guard against unlucky exact integers).
    d = np.abs(np.asarray(gp_f) - np.asarray(gg_f))
    assert (d > 1e-3).sum() <= 4


def test_warp_nodimg_backward_matches_full():
    """need_dimg=False: dcx/dcy identical to the full backward kernel,
    dimg returned as exact zeros."""
    img = _img()
    _, cx, cy = _coords()
    cxb, cyb = jnp.clip(cx, 0, W - 1), jnp.clip(cy, 0, H - 1)

    def loss(need_dimg):
        return lambda im, x, y: jnp.sum(
            jnp.sin(warp_pallas(im, x, y, True, need_dimg)))

    gi_full, gx_full, gy_full = jax.grad(loss(True), argnums=(0, 1, 2))(
        img, cxb, cyb)
    gi_nd, gx_nd, gy_nd = jax.grad(loss(False), argnums=(0, 1, 2))(
        img, cxb, cyb)
    np.testing.assert_allclose(np.asarray(gx_nd), np.asarray(gx_full), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy_nd), np.asarray(gy_full), atol=1e-6)
    assert float(jnp.max(jnp.abs(gi_nd))) == 0.0
    assert float(jnp.max(jnp.abs(gi_full))) > 0.0


def test_splat_matches_dense():
    fl, tx, ty = _coords(scale=7.0, seed=5)
    out = splat_pallas(tx, ty, H, W, True)
    ref = _corresponding_map_dense(fl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_splat_large_flow_still_exact_when_spans_fit():
    # Constant large translation: spans fit (window follows each row).
    rng = np.random.default_rng(7)
    fl = jnp.asarray((rng.standard_normal((B, H, W, 2)) * 3 + 40).astype(np.float32))
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    out = splat_pallas(xs[None] + fl[..., 0], ys[None] + fl[..., 1], H, W, True)
    ref = _corresponding_map_dense(fl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def _force_pallas_dispatch(monkeypatch):
    """Route the warp.py dispatchers onto the interpret-mode kernels so the
    exact TPU program runs under the CPU test backend."""
    import rcf_tpu.ops.pallas.warp_pallas as wp
    import rcf_tpu.ops.warp as warp_mod

    monkeypatch.setattr(warp_mod, "_mxu_backend", lambda: True)
    monkeypatch.setattr(warp_mod, "_WARP_BANDED_MIN_PIXELS", 0)
    orig_warp, orig_splat = wp.warp_pallas, wp.splat_pallas
    monkeypatch.setattr(
        wp, "warp_pallas",
        lambda img, cx, cy, interpret=False, need_dimg=True: orig_warp(
            img, cx, cy, True, need_dimg))
    monkeypatch.setattr(
        wp, "splat_pallas", lambda tx, ty, h, w: orig_splat(tx, ty, h, w, True))


def test_flow_warp_grad_img_false_dispatch(monkeypatch):
    """flow_warp(grad_img=False) through the Pallas dispatcher: flow
    gradients equal the gather VJP's (continuous draws avoid the
    measure-zero integer-coordinate kinks); the image cotangent is
    declared dead and comes back exactly zero."""
    import rcf_tpu.ops.warp as warp_mod

    rng = np.random.default_rng(17)
    im = jnp.asarray(rng.random((B, H, W, C)).astype(np.float32))
    fl = jnp.asarray((rng.standard_normal((B, H, W, 2)) * 5).astype(np.float32))
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")

    def ref_loss(f, a):
        r = warp_mod.bilinear_sample(
            a, jnp.clip(xs[None] + f[..., 0], 0, W - 1),
            jnp.clip(ys[None] + f[..., 1], 0, H - 1), pad="border")
        return jnp.sum(jnp.sin(r))

    gr = jax.grad(ref_loss, argnums=(0, 1))(fl, im)

    _force_pallas_dispatch(monkeypatch)

    def loss(f, a):
        return jnp.sum(jnp.sin(warp_mod.flow_warp(a, f, grad_img=False)))

    gf = jax.grad(loss, argnums=(0, 1))(fl, im)
    assert float(jnp.max(jnp.abs(gf[1]))) == 0.0
    assert float(jnp.max(jnp.abs(gr[1]))) > 0.0
    d = np.abs(np.asarray(gf[0]) - np.asarray(gr[0]))
    assert (d > 1e-3).sum() <= 4


def test_dispatch_guard_spans():
    from rcf_tpu.ops.warp import _pallas_spans_fit

    _, cx, cy = _coords(scale=5.0)
    assert bool(_pallas_spans_fit(cx, cy, H, W))
    # Vertical shear beyond BAND must force the dense fallback.
    big = cy.at[:, :, -1].add(float(BAND + 16))
    assert not bool(_pallas_spans_fit(cx, big, H, W))
    # Horizontal span beyond the per-tile XBAND budget likewise.
    bigx = cx.at[:, :, ::127].add(float(XBAND))
    assert not bool(_pallas_spans_fit(bigx, cy, H, W))
