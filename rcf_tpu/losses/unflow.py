"""Unsupervised multi-scale photometric flow loss (AMD baseline).

Parity with `models/amd/flow_loss.py` + `models/amd/loss_blocks.py`:
per pyramid level, resize the image pair ('area' = average pooling for
integer factors), backward-warp each image by the other's flow, and score
L1 (w=0.15) + SSIM (w=0.85) (+ optional ternary census) under occlusion
masks derived from the backward flow's correspondence density at the
finest level (nearest-downsampled for coarser ones). Optional edge-aware
1st/2nd-order smoothness.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from ..ops import resize_nearest
from ..ops.warp import flow_warp, occu_mask_backward, occu_mask_bidirection


def _avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    return x.reshape(b, h // k, k, w // k, k, c).mean(axis=(2, 4))


def area_resize(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """'area' interpolation for integer downscale factors."""
    k = x.shape[1] // out_hw[0]
    assert x.shape[1] == out_hw[0] * k and x.shape[2] == out_hw[1] * k, (
        f"area resize needs integer factors: {x.shape} -> {out_hw}")
    return _avg_pool(x, k)


def ssim_dist(x: jnp.ndarray, y: jnp.ndarray, md: int = 1) -> jnp.ndarray:
    """(1 - SSIM)/2 clipped to [0,1]; valid (unpadded) windows only."""
    k = 2 * md + 1
    c1, c2 = 0.01**2, 0.03**2

    def pool(z):
        # Valid-mode average pooling, window k, stride 1: k shifted adds per
        # axis. For the tiny SSIM windows this beats the cumsum integral
        # image on TPU by ~10x (36.6 -> 3.5 ms for the 5 pools at
        # 8x384x640x3 — cumsum is a multi-pass scan; shifts fuse into two
        # vector adds) and avoids its cancellation error.
        h, w = z.shape[1], z.shape[2]
        zh = sum(z[:, i : h - k + 1 + i] for i in range(k))
        return sum(zh[:, :, j : w - k + 1 + j] for j in range(k)) / (k * k)

    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x * x) - mu_x**2
    sigma_y = pool(y * y) - mu_y**2
    sigma_xy = pool(x * y) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1 - num / den) / 2, 0.0, 1.0)


def ternary_dist(im: jnp.ndarray, im_warp: jnp.ndarray, max_distance: int = 1) -> jnp.ndarray:
    """Census-transform hamming distance with a valid-border mask."""
    k = 2 * max_distance + 1

    def gray(image):
        return (image[..., 0] * 0.2989 + image[..., 1] * 0.5870 + image[..., 2] * 0.1140)[..., None]

    def census(image):
        inten = gray(image) * 255.0
        padded = jnp.pad(inten, ((0, 0), (max_distance, max_distance),
                                 (max_distance, max_distance), (0, 0)))
        b, h, w, _ = inten.shape
        patches = jnp.stack(
            [padded[:, i : i + h, j : j + w, 0] for i in range(k) for j in range(k)], axis=-1
        )
        t = patches - inten
        return t / jnp.sqrt(0.81 + t**2)

    dist = (census(im) - census(im_warp)) ** 2
    dist = jnp.mean(dist / (0.1 + dist), axis=-1, keepdims=True)
    mask = jnp.zeros_like(dist)
    mask = mask.at[:, max_distance:-max_distance, max_distance:-max_distance].set(1.0)
    return dist * mask


def _gradients(x):
    dx = x[:, :, 1:] - x[:, :, :-1]
    dy = x[:, 1:, :] - x[:, :-1, :]
    return dx, dy


def smooth_grad_1st(flow, image, alpha):
    img_dx, img_dy = _gradients(image)
    wx = jnp.exp(-jnp.mean(jnp.abs(img_dx), -1, keepdims=True) * alpha)
    wy = jnp.exp(-jnp.mean(jnp.abs(img_dy), -1, keepdims=True) * alpha)
    dx, dy = _gradients(flow)
    return jnp.mean(wx * jnp.abs(dx) / 2) / 2 + jnp.mean(wy * jnp.abs(dy) / 2) / 2


def smooth_grad_2nd(flow, image, alpha):
    img_dx, img_dy = _gradients(image)
    wx = jnp.exp(-jnp.mean(jnp.abs(img_dx), -1, keepdims=True) * alpha)
    wy = jnp.exp(-jnp.mean(jnp.abs(img_dy), -1, keepdims=True) * alpha)
    dx, dy = _gradients(flow)
    dx2, _ = _gradients(dx)
    _, dy2 = _gradients(dy)
    return jnp.mean(wx[:, :, 1:] * jnp.abs(dx2)) / 2 + jnp.mean(wy[:, 1:, :] * jnp.abs(dy2)) / 2


@dataclass
class UnFlowLossCfg:
    alpha: float = 10.0
    ssim_sz: int = 1
    occ_from_back: bool = True
    w_l1: float = 0.15
    w_ssim: float = 0.85
    w_ternary: float = 0.0
    w_scales: tuple = (1.0, 1.0, 1.0, 1.0, 0.0)
    w_sm_scales: tuple = (1.0, 0.0, 0.0, 0.0, 0.0)
    w_real_smooth: float = 0.0
    smooth_2nd: bool = False
    warp_pad: str = "border"
    with_bk: bool = True


def unflow_loss(pyramid_flows, im1, im2, cfg: UnFlowLossCfg = UnFlowLossCfg()):
    """pyramid_flows: list of [B, h, w, 4] (fw|bw), finest first; images
    [B, H, W, 3] in [0, 1]. Returns (total, warp, smooth, mean |flow0|)."""

    def photometric(im_scaled, im_recons, occu):
        losses = []
        if cfg.w_l1 > 0:
            losses.append(cfg.w_l1 * jnp.abs(im_scaled - im_recons) * occu)
        if cfg.w_ssim > 0:
            losses.append(cfg.w_ssim * ssim_dist(im_recons * occu, im_scaled * occu, cfg.ssim_sz))
        if cfg.w_ternary > 0:
            losses.append(cfg.w_ternary * ternary_dist(im_recons * occu, im_scaled * occu))
        return sum(jnp.mean(l) for l in losses) / jnp.mean(occu)

    warp_losses, smooth_losses = [], []
    occu1_0 = occu2_0 = None
    s = 1.0
    for i, flow in enumerate(pyramid_flows):
        if cfg.w_scales[i] == 0:
            warp_losses.append(0.0)
            smooth_losses.append(0.0)
            continue
        h, w = flow.shape[1:3]
        im1_s = area_resize(im1, (h, w))
        im2_s = area_resize(im2, (h, w))
        # grad_img=False: the warped operands are input FRAMES (pure
        # data — requires_grad=False in the reference too); gradients
        # flow through the sampling coordinates only.
        im1_recons = flow_warp(im2_s, flow[..., :2], pad=cfg.warp_pad,
                               grad_img=False)
        im2_recons = flow_warp(im1_s, flow[..., 2:], pad=cfg.warp_pad,
                               grad_img=False)
        if i == 0:
            if cfg.occ_from_back:
                # One batched splat for both directions (same cost per
                # image; halves the fixed per-call work).
                both = occu_mask_backward(
                    jnp.concatenate([flow[..., 2:], flow[..., :2]], axis=0),
                    th=0.2)[..., None]
                occu1, occu2 = 1.0 - both[: flow.shape[0]], 1.0 - both[flow.shape[0]:]
            else:
                occu1 = 1.0 - occu_mask_bidirection(flow[..., :2], flow[..., 2:])[..., None]
                occu2 = 1.0 - occu_mask_bidirection(flow[..., 2:], flow[..., :2])[..., None]
            occu1_0, occu2_0 = occu1, occu2
            s = min(h, w)
        else:
            occu1 = resize_nearest(occu1_0, (h, w))
            occu2 = resize_nearest(occu2_0, (h, w))
        loss_warp = photometric(im1_s, im1_recons, occu1)
        loss_smooth = 0.0
        if cfg.w_real_smooth > 0:
            fn = smooth_grad_2nd if cfg.smooth_2nd else smooth_grad_1st
            loss_smooth = fn(flow[..., :2] / s, im1_s, cfg.alpha)
        if cfg.with_bk:
            loss_warp = (loss_warp + photometric(im2_s, im2_recons, occu2)) / 2.0
            if cfg.w_real_smooth > 0:
                loss_smooth = (loss_smooth + fn(flow[..., 2:] / s, im1_s, cfg.alpha)) / 2.0
        warp_losses.append(loss_warp)
        smooth_losses.append(loss_smooth)

    warp_loss = sum(l * w for l, w in zip(warp_losses, cfg.w_scales))
    smooth_loss = cfg.w_real_smooth * sum(l * w for l, w in zip(smooth_losses, cfg.w_sm_scales))
    total = warp_loss + smooth_loss
    return total, warp_loss, smooth_loss, jnp.mean(jnp.abs(pyramid_flows[0]))
