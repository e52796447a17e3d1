"""Relaxed common-fate loss primitives (pure jnp, NHWC).

Re-derivation of the reference flow-reconstruction math
(`models/flow_aggregation_head_with_residual.py`):

* ``norm_and_clamp_flow``   — flow preprocessing (`:150-162`)
* ``demean_affine_flow``    — closed-form per-mask affine motion by weighted
  least squares over mask-normalized moments (`:164-233`). We compute the
  2x2 (or 5x5 quadratic) covariances directly from raw/centered moments
  instead of materializing the reference's [B, C, H*W, 2, 2] outer-product
  tensors — same math, O(HW*K) memory instead of O(HW*K^2), and the
  contractions land on the MXU. Solves are promoted to fp32 (the reference
  forces fp32 too, `:215-217`) with a tiny relative ridge for robustness to
  degenerate (collapsed) masks.
* ``residual_adjustment``   — tanh-bounded per-mask residual (`:279-288,302-304`)
* ``common_fate_loss``      — L1 / outlier-robust reconstruction gap (`:359-368`)

Layout convention: masks ``[B, H, W, C]`` (softmaxed over C), flow
``[B, H, W, 2]``, residuals ``[B, H, W, 2, C]`` (component-major to match
the reference's ``unflatten(1, (2, C))`` channel order).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def norm_and_clamp_flow(
    flow: jnp.ndarray,
    norm_flow: bool = False,
    clamp_flow_t: float | None = None,
    filter_flow_t: float | None = None,
) -> jnp.ndarray:
    """Optionally normalize by global abs-max, clamp, and zero small flow."""
    if norm_flow:
        flow = flow / jnp.max(jnp.abs(flow))
    if clamp_flow_t is not None:
        flow = jnp.clip(flow, -clamp_flow_t, clamp_flow_t)
    if filter_flow_t is not None:
        flow = jnp.where(jnp.abs(flow) < filter_flow_t, 0.0, flow)
    return flow


@functools.lru_cache(maxsize=32)
def _coord_map(h: int, w: int, quadratic: bool) -> np.ndarray:
    """[H*W, K] coordinate basis: (y, x) or (y, x, y^2, x^2, yx).

    Coordinates are normalized to [0, 1). The reference uses raw pixel
    indices (`flow_aggregation_head_with_residual.py:136-148`); the WLS
    *prediction* is invariant to this diagonal reparameterization of the
    basis, and normalized coordinates keep the fp32 normal-equation solve
    well-conditioned (raw squared pixel coords span ~1e0..1e4).
    """
    ys, xs = np.meshgrid(
        np.arange(h, dtype=np.float32) / h,
        np.arange(w, dtype=np.float32) / w,
        indexing="ij",
    )
    cols = [ys, xs]
    if quadratic:
        cols += [ys * ys, xs * xs, ys * xs]
    return np.stack([c.reshape(-1) for c in cols], axis=-1)


def demean_affine_flow(
    masks: jnp.ndarray,
    flow: jnp.ndarray,
    quadratic: bool = False,
    ridge: float = 1e-6,
) -> jnp.ndarray:
    """Closed-form de-meaned per-mask affine flow, summed over masks.

    masks: [B, H, W, C] soft masks (softmax over C);
    flow:  [B, H, W, 2] target flow.
    Returns [B, H, W, 2]: sum_c mask_c * A*_c (omega - mu_omega_c), where
    A*_c minimizes the mask-weighted squared error to the de-meaned flow.
    """
    b, h, w, c = masks.shape
    p = h * w
    m = masks.reshape(b, p, c).astype(jnp.float32)
    f = flow.reshape(b, p, 2).astype(jnp.float32)
    omega = jnp.asarray(_coord_map(h, w, quadratic))  # [P, K]
    k = omega.shape[-1]

    # Mask-normalized weights: each channel's weights sum to 1 over pixels.
    mhat = m / jnp.sum(m, axis=1, keepdims=True)

    mu_f = jnp.einsum("bpc,bpk->bck", mhat, f)      # [B, C, 2]
    mu_w = jnp.einsum("bpc,pk->bck", mhat, omega)   # [B, C, K]

    # Centered moments. Centering *before* the contraction (as the reference
    # does) is required for fp32 accuracy: raw moments minus mean-products
    # cancels catastrophically once pixel coords are squared.
    wd = omega[None, :, None, :] - mu_w[:, None, :, :]          # [B, P, C, K]
    fd = f[:, :, None, :] - mu_f[:, None, :, :]                 # [B, P, C, 2]
    s_fw = jnp.einsum("bpc,bpck,bpcl->bckl", mhat, fd, wd)      # [B, C, 2, K]
    s_ww = jnp.einsum("bpc,bpck,bpcl->bckl", mhat, wd, wd)      # [B, C, K, K]

    # Relative ridge keeps the solve well-posed when a mask collapses.
    diag_scale = jnp.mean(jnp.trace(s_ww, axis1=-2, axis2=-1), axis=-1) / k  # [B]
    eye = jnp.eye(k, dtype=jnp.float32)
    s_ww = s_ww + (ridge * diag_scale)[:, None, None, None] * eye

    # A* = S_Fw S_ww^{-1}  (solve on the symmetric S_ww).
    a_star = jnp.linalg.solve(s_ww, jnp.swapaxes(s_fw, -1, -2))  # [B, C, K, 2]
    a_star = jnp.swapaxes(a_star, -1, -2)                        # [B, C, 2, K]

    # sum_c m[b,p,c] * (A_c (omega_p - mu_c)), reusing the centered coords.
    pred = jnp.einsum("bpc,bckl,bpcl->bpk", m, a_star, wd)
    return pred.reshape(b, h, w, 2)


def residual_adjustment(
    residual: jnp.ndarray,
    masks: jnp.ndarray,
    scale: float = 10.0,
    div_coeff: float = 10.0,
) -> jnp.ndarray:
    """Mask-gated tanh-bounded residual flow.

    residual: [B, H, W, 2, C]; masks: [B, H, W, C] -> [B, H, W, 2].
    ``scale == -1`` disables the tanh bound (free residual without limit).
    """
    if scale == -1.0:
        return jnp.einsum("bhwkc,bhwc->bhwk", residual, masks)
    bounded = jnp.tanh(residual / div_coeff)
    return jnp.einsum("bhwkc,bhwc->bhwk", bounded, masks) * scale


def common_fate_loss(
    gt_flow: jnp.ndarray,
    pred_flow: jnp.ndarray,
    outlier_robust: bool = False,
    eps: float = 0.01,
    q: float = 0.4,
) -> jnp.ndarray:
    """Reconstruction gap: mean |gt - pred|, or mean (|gt - pred| + eps)^q."""
    diff = jnp.abs(gt_flow.astype(jnp.float32) - pred_flow.astype(jnp.float32))
    if outlier_robust:
        return jnp.mean((diff + eps) ** q)
    return jnp.mean(diff)
