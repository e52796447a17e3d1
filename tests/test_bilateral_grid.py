"""Bilateral-grid lattice vs the exact O(N^2) Gaussian filter / CRF.

VERDICT round-1 item 2 acceptance: >=97% MAP agreement with the exact
engine on real-content-like fixtures, at O(N).
"""

from __future__ import annotations

import numpy as np
import pytest


def _content_image(h, w, seed=0):
    """Real-content-like: smooth background + textured objects + noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        120 + 80 * np.sin(xx / w * 3.1) * np.cos(yy / h * 2.2),
        100 + 60 * (xx / w),
        90 + 70 * (yy / h),
    ], axis=-1)
    # textured square object
    oy, ox, s = h // 4, w // 4, h // 2
    img[oy:oy + s, ox:ox + s] += rng.normal(60, 10, (s, s, 3))
    img += rng.normal(0, 6, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _exact_filter(feat, values):
    d2 = ((feat[:, None, :] - feat[None, :, :]) ** 2).sum(-1)
    k = np.exp(-0.5 * d2)
    return (k @ values) / k.sum(1)


def test_grid_filter_matches_exact_gaussian():
    from rcf_tpu.ops.bilateral_grid import normalized_bilateral_filter
    from rcf_tpu.ops.crf import _pixel_features

    h, w = 48, 64
    img = _content_image(h, w)
    sxy, srgb = 12.0, 8.0
    import jax.numpy as jnp

    feat = np.asarray(_pixel_features(jnp.asarray(img), sxy, srgb))
    rng = np.random.default_rng(1)
    values = rng.random(h * w).astype(np.float32)

    exact = _exact_filter(feat, values)
    feat_max = ((w - 1) / sxy, (h - 1) / sxy, 255 / srgb, 255 / srgb, 255 / srgb)
    # crf.py feature order is (x, y, r, g, b)
    ours = np.asarray(normalized_bilateral_filter(
        jnp.asarray(feat), jnp.asarray(values), feat_max))

    # The grid kernel is an approximation of the Gaussian; demand high
    # correlation and small typical error, not exactness.
    corr = np.corrcoef(ours, exact)[0, 1]
    err = np.abs(ours - exact).mean() / (np.abs(exact).mean() + 1e-9)
    assert corr > 0.98, corr
    assert err < 0.12, err


@pytest.mark.parametrize("res", [(96, 128)])
def test_grid_crf_map_agreement(res):
    """End-to-end mean field: grid engine vs exact attention engine."""
    import jax.numpy as jnp

    from rcf_tpu.ops.crf import CRFParams, crf_soft_single

    h, w = res
    img = _content_image(h, w, seed=2)
    # A soft mask roughly over the object with noisy boundary.
    yy, xx = np.mgrid[0:h, 0:w]
    oy, ox, s = h // 4, w // 4, h // 2
    rng = np.random.default_rng(3)
    mask = 0.15 + 0.7 * ((yy >= oy) & (yy < oy + s) & (xx >= ox) & (xx < ox + s))
    mask = np.clip(mask + rng.normal(0, 0.15, mask.shape), 0.0, 1.0).astype(np.float32)

    params = CRFParams(refine_iters=20)
    exact = np.asarray(crf_soft_single(
        jnp.asarray(img), jnp.asarray(mask), params, engine="attention"))
    grid = np.asarray(crf_soft_single(
        jnp.asarray(img), jnp.asarray(mask), params, engine="grid"))
    agreement = (exact == grid).mean()
    assert agreement >= 0.97, agreement


def test_grid_crf_agrees_with_native_lattice():
    """Grid engine vs the independent C++ permutohedral engine (>=97%)."""
    import os

    lib = "/root/repo/native/build/libpermutohedral_crf.so"
    if not os.path.exists(lib):
        pytest.skip("native lattice not built")
    import jax.numpy as jnp

    from rcf_tpu.ops.crf import CRFParams, crf_soft_single
    from rcf_tpu.ops.crf_native import crf_soft_native

    h, w = 96, 128
    img = _content_image(h, w, seed=4)
    yy, xx = np.mgrid[0:h, 0:w]
    mask = (0.2 + 0.6 * (((yy - h / 2) ** 2 + (xx - w / 2) ** 2) < (h / 3) ** 2)
            ).astype(np.float32)

    params = CRFParams(refine_iters=20)
    native = crf_soft_native(img, mask, refine_iters=20)
    grid = np.asarray(crf_soft_single(
        jnp.asarray(img), jnp.asarray(mask), params, engine="grid"))
    agreement = (native == grid).mean()
    assert agreement >= 0.97, agreement
