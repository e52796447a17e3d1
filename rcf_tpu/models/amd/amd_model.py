"""AMD baseline: appearance-motion decomposition (ablation parity).

Parity with `models/amd/amd_model.py`: an OS8 ResNet backbone (dilations
[1,1,1,2], no contract_dilation — unlike RCF's OS4/8 [1,1,2,4]) with a
single-input stage-4 FCN mask head at 1/8 resolution (reference
configs/amd/amd.yaml, unlike RCF's resize_concat OS-mixed head); motion
comes from a *learned* PWC-Lite flownet over per-mask constant flow
groups; the loss is the unsupervised photometric flow loss over both the
segment-wise piecewise-constant flows and the unconstrained flows
(`amd_model.py:194-266`, `models/fcn_head.py:149-209`).

Images are un-normalized back to [0, 1] and resized to (384, 640)
(align_corners=True) before the flownet (`fcn_head.py:160-167`).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...losses.unflow import UnFlowLossCfg, unflow_loss
from ...nn import FCNHead, ResNet
from ...ops import resize_bilinear
from .pwc_lite import PWCLite

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_FLOW_CFG = UnFlowLossCfg(
    alpha=10, ssim_sz=1, occ_from_back=True, w_l1=0.15,
    w_scales=(1.0, 1.0, 1.0, 1.0, 0.0), w_sm_scales=(1.0, 0.0, 0.0, 0.0, 0.0),
    w_real_smooth=0.0, w_ssim=0.85, w_ternary=0.0, warp_pad="border", with_bk=True,
)


def build_amd_model(model_kwargs: dict, dtype=jnp.float32) -> "AMDModel":
    kwargs = dict(model_kwargs)
    backbone_cfg = dict(kwargs.pop("backbone2"))
    backbone_cfg = {k: v for k, v in backbone_cfg.items() if k not in ("create_ema",)}
    backbone_cfg.pop("type", None)
    mask_cfg = dict(kwargs.pop("decode_head2"))
    mask_cfg = {k: v for k, v in mask_cfg.items() if k not in ("type", "create_ema", "loss_decode")}
    kwargs.pop("decode_head", None)  # flownet config is fixed (create_flownet path)
    known = set(AMDModel.__dataclass_fields__)
    kwargs = {k: v for k, v in kwargs.items() if k in known}
    return AMDModel(backbone_cfg=backbone_cfg, mask_head_cfg=mask_cfg, dtype=dtype, **kwargs)


class AMDModel(nn.Module):
    backbone_cfg: dict
    mask_head_cfg: dict
    mask_layer: int = 5
    w_seg: float = 1.0
    flow_size: tuple[int, int] = (384, 640)
    dtype: Any = jnp.float32
    # Harness-contract attributes shared with RCFModel (no CRF/EMA paths):
    w_crf: float = 0.0
    crf_use_ema: bool = False
    crf_head_kwargs: dict | None = None
    ema_m: float = 0.999
    align_corners: bool = False
    mask_size: tuple[int, int] = (96, 96)
    # The reference computes the unconstrained ("whole") photometric loss
    # every step but never observes the value: `fcn_head.py:185` accumulates
    # `flow_loss['whole']`, `amd_model.py:222,266` then uses only `['seg']`
    # and returns that scalar — the whole-loss never reaches the training
    # loss, a log, or a visualization (only the whole flow FIELD is
    # visualized). It is dead compute in the reference, and whether dropping
    # it helps is ARCHITECTURE-DEPENDENT scheduling luck: under the
    # pre-parity resize_concat head it was faster kept (334 vs 401 ms/step,
    # round 2 — XLA overlapped its forward with the seg backward), but under
    # the reference-parity stage-4 OS8 head dropping it wins by ~31%
    # (339 vs 444-445 ms/step, sandwiched A/B, round 4 — bench.py
    # BENCH_AMD_WHOLE). Default False: it is dead compute; set True for
    # reference-shaped per-step cost or to log the whole-flow loss value.
    log_whole_flow_loss: bool = False

    def setup(self):
        self.backbone2 = ResNet(**self.backbone_cfg, dtype=self.dtype)
        self.decode_head2 = FCNHead(**self.mask_head_cfg, dtype=self.dtype)
        # Flownet convs run in the compute dtype too (flow values and their
        # cross-level accumulation stay f32 inside PWCLite); the reference
        # runs its whole AMD step under torch AMP semantics when precision
        # is 16 (main.py trainer precision knob).
        self.flownet = PWCLite(mask_layer=self.mask_layer, dtype=self.dtype)

    def mask_probs(self, imgs_flat: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from ..rcf import maybe_normalize

        feats = self.backbone2(maybe_normalize(imgs_flat), train=train)
        logits = self.decode_head2(feats, train=train)
        return nn.softmax(logits, axis=-1)

    def __call__(self, imgs: jnp.ndarray, gt_fw_flows=None, gt_bw_flows=None,
                 pl_masks=None, crf_target_masks=None, object_channel=0,
                 object_channel_set=False, train: bool = True):
        """imgs [B, 2, H, W, 3] normalized. Returns (losses, probs).

        Extra arguments exist for train-step signature parity with RCFModel;
        AMD is fully self-supervised from the learned flownet and ignores them.
        """
        from ..rcf import maybe_normalize

        b, im_num = imgs.shape[:2]
        assert im_num == 2
        imgs_flat = maybe_normalize(imgs.reshape(b * im_num, *imgs.shape[2:]))
        feats = self.backbone2(imgs_flat, train=train)
        logits = self.decode_head2(feats, train=train)
        h, w = logits.shape[1:3]
        probs = nn.softmax(logits.reshape(b, im_num, h, w, self.mask_layer), axis=-1)

        # Un-normalize to [0, 1] and resize for the flownet (fcn_head.py:160-167).
        if imgs.dtype == jnp.uint8:
            raw = imgs.astype(jnp.float32) / 255.0
        else:
            raw = imgs * jnp.asarray(IMAGENET_STD) + jnp.asarray(IMAGENET_MEAN)
        # Image values in the compute dtype (bf16 warps ~1.7x faster; warp
        # COORDINATES stay f32 inside ops/warp.py). f32 runs are unchanged.
        im1 = resize_bilinear(raw[:, 0], self.flow_size, align_corners=True).astype(self.dtype)
        im2 = resize_bilinear(raw[:, 1], self.flow_size, align_corners=True).astype(self.dtype)

        res = self.flownet(im1, im2, probs[:, 0], probs[:, 1], with_bk=True)

        def stacked(fw_list, bw_list):
            return [jnp.concatenate([f, bw], axis=-1) for f, bw in zip(fw_list, bw_list)]

        loss_seg, *_ = unflow_loss(stacked(res["flows_fw"], res["flows_bw"]),
                                   im1, im2, _FLOW_CFG)
        losses = {
            "loss_warp_seg": loss_seg,
            "loss": loss_seg * self.w_seg,
        }
        if self.log_whole_flow_loss:
            loss_all, *_ = unflow_loss(stacked(res["flows_fw_all"], res["flows_bw_all"]),
                                       im1, im2, _FLOW_CFG)
            losses["loss_warp_whole"] = loss_all
        return losses, probs
