import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcf_tpu.losses import (
    common_fate_loss,
    demean_affine_flow,
    norm_and_clamp_flow,
    residual_adjustment,
)


def _soft_masks(rng, b, h, w, c):
    logits = rng.standard_normal((b, h, w, c)).astype(np.float32)
    return np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))


def _affine_reference(masks, flow, quadratic=False):
    """Naive numpy weighted-least-squares reference (per batch, per channel)."""
    b, h, w, c = masks.shape
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    cols = [ys, xs]
    if quadratic:
        cols += [ys * ys, xs * xs, ys * xs]
    omega = np.stack([col.reshape(-1) for col in cols], -1).astype(np.float64)
    out = np.zeros((b, h * w, 2))
    f = flow.reshape(b, -1, 2).astype(np.float64)
    m = masks.reshape(b, -1, c).astype(np.float64)
    for bi in range(b):
        for ci in range(c):
            wgt = m[bi, :, ci] / m[bi, :, ci].sum()
            mu_f = (wgt[:, None] * f[bi]).sum(0)
            mu_w = (wgt[:, None] * omega).sum(0)
            fd = f[bi] - mu_f
            wd = omega - mu_w
            s_fw = (wgt[:, None, None] * fd[:, :, None] * wd[:, None, :]).sum(0)
            s_ww = (wgt[:, None, None] * wd[:, :, None] * wd[:, None, :]).sum(0)
            a = np.linalg.solve(s_ww, s_fw.T).T
            out[bi] += m[bi, :, ci, None] * (wd @ a.T)
    return out.reshape(b, h, w, 2)


@pytest.mark.parametrize("quadratic", [False, True])
def test_affine_flow_matches_naive_wls(quadratic):
    rng = np.random.default_rng(0)
    b, h, w, c = 2, 12, 16, 4
    masks = _soft_masks(rng, b, h, w, c)
    flow = rng.standard_normal((b, h, w, 2)).astype(np.float32) * 5
    ours = np.asarray(demean_affine_flow(jnp.asarray(masks), jnp.asarray(flow), quadratic=quadratic))
    ref = _affine_reference(masks, flow, quadratic=quadratic)
    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=1e-3)


def test_affine_flow_recovers_exact_affine_field():
    """If gt flow IS affine per region, the reconstruction should be near-exact."""
    h, w = 24, 24
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij")
    # One-hot-ish masks: left half / right half.
    m = np.zeros((1, h, w, 2), np.float32)
    m[0, :, : w // 2, 0] = 1.0
    m[0, :, w // 2:, 1] = 1.0
    m = np.clip(m, 1e-4, 1.0)
    # Pure de-meaned affine flow within each region.
    flow = np.zeros((1, h, w, 2), np.float32)
    flow[..., 0] = 0.3 * (ys - ys.mean())
    flow[..., 1] = -0.1 * (xs - xs.mean())
    out = np.asarray(demean_affine_flow(jnp.asarray(m), jnp.asarray(flow)))
    # The head reconstructs the *de-meaned* affine flow per mask (the mean is
    # the constant-flow branch's job): expected = flow - sum_c m_c * mu_F_c.
    mflat = m.reshape(1, -1, 2)
    mhat = mflat / mflat.sum(1, keepdims=True)
    mu_f = np.einsum("bpc,bpk->bck", mhat, flow.reshape(1, -1, 2))
    expected = flow - np.einsum("bpc,bck->bpk", mflat, mu_f).reshape(1, h, w, 2)
    np.testing.assert_allclose(out, expected, atol=0.02)


def test_affine_flow_degenerate_mask_is_finite():
    rng = np.random.default_rng(1)
    masks = np.full((1, 8, 8, 3), 1e-12, np.float32)
    masks[..., 0] = 1.0
    flow = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    out = demean_affine_flow(jnp.asarray(masks), jnp.asarray(flow))
    assert bool(jnp.all(jnp.isfinite(out)))


def test_norm_and_clamp_flow():
    flow = jnp.asarray([[-30.0, 0.005], [10.0, 25.0]]).reshape(1, 1, 2, 2)
    clamped = norm_and_clamp_flow(flow, clamp_flow_t=20.0)
    assert float(jnp.max(clamped)) == 20.0 and float(jnp.min(clamped)) == -20.0
    filtered = norm_and_clamp_flow(flow, filter_flow_t=0.01)
    assert float(filtered[0, 0, 0, 1]) == 0.0
    normed = norm_and_clamp_flow(flow, norm_flow=True)
    assert float(jnp.max(jnp.abs(normed))) == 1.0


def test_residual_adjustment_tanh_bound_and_free():
    rng = np.random.default_rng(2)
    res = jnp.asarray(rng.standard_normal((2, 8, 8, 2, 4)).astype(np.float32) * 100)
    masks = jnp.asarray(_soft_masks(rng, 2, 8, 8, 4))
    bounded = residual_adjustment(res, masks, scale=10.0, div_coeff=10.0)
    assert float(jnp.max(jnp.abs(bounded))) <= 10.0 + 1e-5
    free = residual_adjustment(res, masks, scale=-1.0)
    expected = np.einsum("bhwkc,bhwc->bhwk", np.asarray(res), np.asarray(masks))
    np.testing.assert_allclose(np.asarray(free), expected, atol=1e-4)


def test_common_fate_loss_modes():
    gt = jnp.ones((1, 4, 4, 2))
    pred = jnp.zeros((1, 4, 4, 2))
    assert float(common_fate_loss(gt, pred)) == pytest.approx(1.0)
    robust = float(common_fate_loss(gt, pred, outlier_robust=True, eps=0.01, q=0.4))
    assert robust == pytest.approx((1.01) ** 0.4, rel=1e-5)
