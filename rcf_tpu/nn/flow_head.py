"""Flow-aggregation head: learned per-mask constant flow + residual + affine.

Parity with the reference
`models/flow_aggregation_head_with_residual.py:50-399`:

* a small conv stack embeds the target flow (2 -> 64 -> 64 channels, 3x3,
  LeakyReLU 0.1) (`:84-93`);
* the embedding is pooled by the spatially-normalized masks to one feature
  per mask channel, pushed through two 1x1 convs (Dense over features) to a
  per-mask constant flow (`:95-101,235-265`), then painted back through the
  raw masks;
* residual modes: ``free_residual`` (tanh-bounded, mask-gated residual) and
  ``free_residual_with_affine`` (adds the closed-form per-mask affine flow;
  optional quadratic basis) (`:268-304`);
* fw/bw losses are the L1 (or outlier-robust) gaps (`:359-368`).

The head processes both frames' directions in one batched call: frame-1
masks pair with forward flow, frame-2 masks with backward flow
(`:326-347`). All heavy ops are batched matmuls/convs (MXU-friendly).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..losses.common_fate import (
    common_fate_loss,
    demean_affine_flow,
    norm_and_clamp_flow,
    residual_adjustment,
)
from ..ops import resize_bilinear


class FlowAggregationHead(nn.Module):
    mask_layer: int = 4
    num_flow_feat_channels: int = 64
    flow_feat_before_agg_kernel_size: int = 3
    mask_size: tuple[int, int] = (96, 96)
    norm_flow: bool = False
    clamp_flow_t: float | None = 20.0
    filter_flow_t: float | None = None
    outlier_robust_loss: bool = False
    eps: float = 0.01
    q: float = 0.4
    residual_adjustment_scale: float = 10.0
    pred_div_coeff: float = 10.0
    free_residual: bool = False
    free_residual_with_affine: bool = False
    free_residual_with_affine_quadratic: bool = False
    allow_residual_resize: bool = True
    # Accepted for config parity with the reference head:
    ssim_sz: int = 1
    create_flownet: bool = True
    free_scale: bool = False
    object_free_residual: bool = False
    affine_residual: bool = False
    align_corners: bool = False
    dtype: jnp.dtype = jnp.float32

    def _constant_flow(self, masks: jnp.ndarray, flow: jnp.ndarray, train: bool) -> jnp.ndarray:
        """Learned per-mask constant flow painted through the masks.

        masks: [N, H, W, C]; flow: [N, H, W, 2] -> [N, H, W, 2].
        """
        n, h, w, c = masks.shape
        k = self.flow_feat_before_agg_kernel_size
        feat = flow
        for i in range(2):
            feat = nn.Conv(
                self.num_flow_feat_channels, (k, k), padding=(k - 1) // 2,
                use_bias=True, dtype=self.dtype, name=f"flow_feat_conv{i}",
                kernel_init=nn.initializers.he_normal(),
            )(feat)
            feat = nn.leaky_relu(feat, 0.1)
        # Pool with spatially-normalized masks: one 64-d feature per mask.
        mask_flat = masks.reshape(n, h * w, c)
        mask_hat = mask_flat / jnp.sum(mask_flat, axis=1, keepdims=True)
        pooled = jnp.einsum("npf,npc->ncf", feat.reshape(n, h * w, -1), mask_hat)
        # Two 1x1 convs over the feature axis (per mask channel).
        pooled = nn.leaky_relu(
            nn.Dense(self.num_flow_feat_channels, dtype=self.dtype, name="flow_agg_fc0")(pooled), 0.1
        )
        const = nn.Dense(2, dtype=self.dtype, name="flow_agg_fc1")(pooled)  # [N, C, 2]
        return jnp.einsum("nck,npc->npk", const, mask_flat).reshape(n, h, w, 2)

    def _aggregate(self, masks, flow, residual, train):
        """One direction. masks [N,H,W,C], flow [N,H,W,2], residual [N,h,w,2C]."""
        flow_agg = self._constant_flow(masks, flow, train)
        parts = {"agg": flow_agg}
        overall = flow_agg
        if self.free_residual or self.free_residual_with_affine:
            if self.allow_residual_resize and residual.shape[1:3] != tuple(self.mask_size):
                residual = resize_bilinear(residual, tuple(self.mask_size),
                                           align_corners=self.align_corners)
            n, h, w, _ = residual.shape
            residual = residual.reshape(n, h, w, 2, self.mask_layer)
            adj = residual_adjustment(
                residual, masks, scale=self.residual_adjustment_scale,
                div_coeff=self.pred_div_coeff,
            )
            parts["residual_adj"] = adj
            overall = overall + adj
            if self.free_residual_with_affine:
                affine = demean_affine_flow(
                    masks, flow, quadratic=self.free_residual_with_affine_quadratic
                )
                parts["affine"] = affine
                overall = overall + affine
        parts["overall"] = overall
        return parts

    @nn.compact
    def __call__(self, masks, gt_fw_flows, gt_bw_flows, residual_fw, residual_bw, train: bool = True):
        """masks: [B, 2, H, W, C]; gt flows: [B, 1, H, W, 2];
        residuals: [B, h, w, 2*C]. Returns (loss dict, flow dict)."""
        assert masks.shape[1] == 2, "two-frame windows only (reference parity)"
        gt_fw = norm_and_clamp_flow(gt_fw_flows[:, 0], self.norm_flow, self.clamp_flow_t, self.filter_flow_t)
        gt_bw = norm_and_clamp_flow(gt_bw_flows[:, 0], self.norm_flow, self.clamp_flow_t, self.filter_flow_t)

        # Batch both directions through the shared head in one call:
        # frame-1 masks with fw flow, frame-2 masks with bw flow.
        masks2 = jnp.concatenate([masks[:, 0], masks[:, 1]], axis=0)
        flows2 = jnp.concatenate([gt_fw, gt_bw], axis=0)
        res2 = jnp.concatenate([residual_fw, residual_bw], axis=0)
        parts = self._aggregate(masks2, flows2, res2, train)

        b = masks.shape[0]
        fw_overall, bw_overall = parts["overall"][:b], parts["overall"][b:]
        loss_fw = common_fate_loss(gt_fw, fw_overall, self.outlier_robust_loss, self.eps, self.q)
        loss_bw = common_fate_loss(gt_bw, bw_overall, self.outlier_robust_loss, self.eps, self.q)
        losses = {"seg_fw": loss_fw, "seg_bw": loss_bw, "seg": loss_fw + loss_bw}

        flows = {
            "gt_flow": (gt_fw, gt_bw),
            "pred_flow": (fw_overall, bw_overall),
            "agg_flow": (parts["agg"][:b], parts["agg"][b:]),
        }
        if "residual_adj" in parts:
            flows["residual_adj"] = (parts["residual_adj"][:b], parts["residual_adj"][b:])
        if "affine" in parts:
            flows["affine_flow"] = (parts["affine"][:b], parts["affine"][b:])
        return losses, flows
