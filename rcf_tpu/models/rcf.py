"""RCF composite model (Flax, NHWC).

Parity with the reference `models/rcf_model.py`: a ResNet backbone feeding
(1) an FCN mask head (`decode_head2`), (2) an FCN residual head
(`decode_head3`) over the concatenated two-frame features, and (3) the
flow-aggregation head that reconstructs RAFT flow from masks
(`decode_head` / here `flow_head`). The training forward returns the full
loss dict; regularizers (entropy/sharpen/compactness/PL/CRF) are applied
per config weight (`rcf_model.py:410-531`).

Differences by design (TPU-first):

* EMA is not a deep-copied module pair — the train step keeps an EMA
  parameter/stat tree and calls :meth:`mask_probs` with it (same graph,
  different variables). The EMA momentum update (`rcf_model.py:525-529`)
  lives in `train/state.py`.
* The object channel is a traced scalar (election happens on device); the
  "channel not yet elected" phase is a boolean flag that gates the losses
  needing it, so flipping it costs exactly one recompile (SURVEY.md §7).
* CRF supervision targets are computed outside the differentiated apply
  (they are stop-gradient targets by construction) and passed in as
  ``crf_target_masks``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..losses.regularizers import (
    compactness_loss,
    entropy_loss,
    object_aware_sharpen_loss,
    pseudo_label_loss,
    quirk_log,
    sharpen_loss,
)
from ..nn import FCNHead, FlowAggregationHead, ResNet
from ..ops import resize_bilinear

_BACKBONES = {"ResNet": ResNet}
_HEADS = {"FCNHead": FCNHead, "FlowAggregationHeadWithResidual": FlowAggregationHead}


def _strip(cfg: dict, drop: tuple[str, ...] = ("create_ema", "loss_decode")) -> dict:
    return {k: v for k, v in cfg.items() if k not in drop}


def build_model(model_kwargs: dict, dtype=jnp.float32) -> "RCFModel":
    """Instantiate RCFModel from a reference-shaped `model_kwargs` tree."""
    kwargs = dict(model_kwargs)
    backbone_cfg = _strip(dict(kwargs.pop("backbone2")))
    backbone_cls = backbone_cfg.pop("type")
    flow_cfg = _strip(dict(kwargs.pop("decode_head")))
    flow_cls = flow_cfg.pop("type")
    mask_cfg = _strip(dict(kwargs.pop("decode_head2")))
    mask_cls = mask_cfg.pop("type")
    res_cfg = _strip(dict(kwargs.pop("decode_head3")))
    res_cls = res_cfg.pop("type")
    compact_cfg = kwargs.pop("compactness_head", None)
    if compact_cfg:
        compact_cfg = dict(compact_cfg)
        compact_cfg.pop("type", None)
        kwargs["compact_channel"] = compact_cfg["compact_channel"]
    crf_cfg = kwargs.pop("crf_head", None)
    if crf_cfg:
        kwargs["crf_head_kwargs"] = _strip(dict(crf_cfg), drop=("type",))

    known = set(RCFModel.__dataclass_fields__)
    extra = {k: v for k, v in kwargs.items() if k not in known}
    kwargs = {k: v for k, v in kwargs.items() if k in known}
    if extra:
        import logging

        logging.getLogger("rcf_tpu").info(f"build_model: ignoring config keys {sorted(extra)}")
    return RCFModel(
        backbone_cfg={"type": backbone_cls, **backbone_cfg},
        flow_head_cfg={"type": flow_cls, **flow_cfg},
        mask_head_cfg={"type": mask_cls, **mask_cfg},
        residual_head_cfg={"type": res_cls, **res_cfg},
        dtype=dtype,
        **kwargs,
    )


class RCFModel(nn.Module):
    backbone_cfg: dict
    flow_head_cfg: dict
    mask_head_cfg: dict
    residual_head_cfg: dict
    mask_layer: int = 4
    mask_size: tuple[int, int] = (96, 96)
    align_corners: bool = False
    w_seg: float = 2.0
    w_sharpen: float = 0.0
    t_sharpen: float = 0.25
    w_entropy: float = 0.0
    w_compactness: float = 0.0
    compact_channel: int = -1
    w_pl: float = 0.0
    pl_pos_weight: float = 1.0
    pl_neg_weight: float = 1.0
    pl_mask_pos_th: float = 0.35
    w_crf: float = 0.0
    crf_pos_weight: float = 1.0
    crf_neg_weight: float = 1.0
    crf_mask_pos_th: float = -1.0
    crf_use_ema: bool = False
    crf_head_kwargs: dict | None = None
    ema_m: float = 0.999
    separate_residual: bool = False
    allow_mask_resize: bool = False
    object_aware_sharpening: bool = False
    freeze_backbone: bool = False
    dtype: Any = jnp.float32
    # Accepted for config parity (handled by the harness, not the module):
    train_iter: int = 0
    log_interval: int = 50
    train_cfg: Any = None
    test_cfg: Any = None

    def setup(self):
        bcfg = dict(self.backbone_cfg)
        self.backbone2 = _BACKBONES[bcfg.pop("type")](**_strip(bcfg), dtype=self.dtype)
        fcfg = dict(self.flow_head_cfg)
        self.flow_head = _HEADS[fcfg.pop("type")](**_strip(fcfg), dtype=self.dtype)
        mcfg = dict(self.mask_head_cfg)
        self.decode_head2 = _HEADS[mcfg.pop("type")](**_strip(mcfg), dtype=self.dtype)
        rcfg = dict(self.residual_head_cfg)
        self.decode_head3 = _HEADS[rcfg.pop("type")](**_strip(rcfg), dtype=self.dtype)

    @property
    def num_classes(self) -> int:
        return self.mask_head_cfg["num_classes"]

    # -- building blocks -------------------------------------------------
    def features(self, imgs_flat: jnp.ndarray, train: bool = True):
        """Backbone features for [N, H, W, 3] frames (uint8 accepted:
        ImageNet normalization then happens on device — tpu.device_normalize)."""
        return self.backbone2(maybe_normalize(imgs_flat), train=train)

    def mask_logits(self, imgs_flat: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        feats = self.features(imgs_flat, train=train)
        logits = self.decode_head2(feats, train=train)
        if self.allow_mask_resize and logits.shape[1:3] != tuple(self.mask_size):
            logits = resize_bilinear(logits, tuple(self.mask_size), self.align_corners)
        return logits

    def mask_probs(self, imgs_flat: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Softmax masks [N, h, w, C]; the eval entry point (EMA or main)."""
        return nn.softmax(self.mask_logits(imgs_flat, train=train), axis=-1)

    def _residuals(self, feats, batch: int, im_num: int):
        """Predict fw/bw residuals [B, h, w, 2*C] from two-frame features."""
        c = self.num_classes

        def regroup(feat, order):
            n, h, w, ch = feat.shape
            f = feat.reshape(batch, im_num, h, w, ch)
            # frame-major channel concat, matching torch cat(dim=1) — deferred
            # as a tuple so FCNHead's split conv0 slices the kernel instead of
            # materializing the [B, h, w, I*ch] interleave (fcn_head._picked).
            return tuple(f[:, o] for o in order)

        if self.separate_residual:
            # One head call over frame-major concat features; 4*C outputs
            # split into fw (first 2C) / bw (last 2C)  (rcf_model.py:322-335).
            regrouped = [regroup(f, (0, 1)) for f in feats]
            out = self.decode_head3(regrouped, train=True)
            return out[..., : 2 * c], out[..., 2 * c :]
        # Joint residual: the head runs twice with frame order swapped
        # (rcf_model.py:337-348).
        fw = self.decode_head3([regroup(feats[-1], (0, 1))], train=True)
        bw = self.decode_head3([regroup(feats[-1], (1, 0))], train=True)
        return fw, bw

    # -- training forward -------------------------------------------------
    def __call__(
        self,
        imgs: jnp.ndarray,                      # [B, I, H, W, 3]
        gt_fw_flows: jnp.ndarray,               # [B, I-1, H0, W0, 2]
        gt_bw_flows: jnp.ndarray,               # [B, I-1, H0, W0, 2]
        pl_masks: jnp.ndarray | None = None,    # [B, I, Hp, Wp]
        crf_target_masks: jnp.ndarray | None = None,  # [B, I, h, w]
        object_channel: jnp.ndarray | int = 0,
        object_channel_set: bool = False,
        train: bool = True,
        return_flows: bool = False,
    ):
        b, im_num = imgs.shape[:2]
        imgs_flat = imgs.reshape(b * im_num, *imgs.shape[2:])

        feats = self.features(imgs_flat, train=train)
        logits = self.decode_head2(feats, train=train)
        if self.allow_mask_resize and logits.shape[1:3] != tuple(self.mask_size):
            logits = resize_bilinear(logits, tuple(self.mask_size), self.align_corners)
        res_fw, res_bw = self._residuals(feats, b, im_num)

        h, w = logits.shape[1:3]
        probs = nn.softmax(logits.reshape(b, im_num, h, w, self.mask_layer), axis=-1)
        log_probs = quirk_log(probs, axis=-1)

        # Resize gt flows to the mask grid (values unscaled, reference parity).
        fn = gt_fw_flows.shape[1]
        gt_fw = resize_bilinear(
            gt_fw_flows.reshape(b * fn, *gt_fw_flows.shape[2:]), tuple(self.mask_size), self.align_corners
        ).reshape(b, fn, *self.mask_size, 2)
        gt_bw = resize_bilinear(
            gt_bw_flows.reshape(b * fn, *gt_bw_flows.shape[2:]), tuple(self.mask_size), self.align_corners
        ).reshape(b, fn, *self.mask_size, 2)

        flow_losses, flows = self.flow_head(probs, gt_fw, gt_bw, res_fw, res_bw, train=train)

        losses = {"loss_warp_seg": flow_losses["seg"]}
        loss = flow_losses["seg"] * self.w_seg

        if self.w_sharpen > 0:
            if self.object_aware_sharpening:
                if object_channel_set:
                    loss_sharpen = object_aware_sharpen_loss(probs, self.t_sharpen, object_channel)
                    losses["loss_sharpen"] = loss_sharpen
                    loss = loss + loss_sharpen * self.w_sharpen
            else:
                loss_sharpen = sharpen_loss(probs, self.t_sharpen)
                losses["loss_sharpen"] = loss_sharpen
                loss = loss + loss_sharpen * self.w_sharpen
        elif self.w_entropy > 0:
            loss_entropy = entropy_loss(probs)
            losses["loss_entropy"] = loss_entropy
            loss = loss + loss_entropy * self.w_entropy

        if self.w_compactness != 0:
            channel = self.compact_channel
            use_object = channel == -1
            if (not use_object) or object_channel_set:
                idx = object_channel if use_object else channel
                compact = jnp.take(
                    probs.reshape(b * im_num, h, w, self.mask_layer), jnp.asarray(idx), axis=-1
                )
                loss_compact = compactness_loss(compact)
                losses["loss_compactness"] = loss_compact
                loss = loss + loss_compact * self.w_compactness

        if self.w_pl > 0 and pl_masks is not None:
            pl = resize_bilinear(pl_masks[..., None], tuple(self.mask_size), self.align_corners)[..., 0]
            obj_probs = _take_channel(probs, object_channel)
            loss_pl = pseudo_label_loss(
                obj_probs, pl, self.pl_pos_weight, self.pl_neg_weight, self.pl_mask_pos_th
            )
            losses["loss_pl"] = loss_pl
            loss = loss + loss_pl * self.w_pl

        if self.w_crf > 0 and crf_target_masks is not None:
            obj_probs = _take_channel(probs, object_channel)
            loss_crf = pseudo_label_loss(
                obj_probs, crf_target_masks, self.crf_pos_weight, self.crf_neg_weight, self.crf_mask_pos_th
            )
            losses["loss_crf"] = loss_crf
            loss = loss + loss_crf * self.w_crf

        losses["loss"] = loss
        if return_flows:
            return losses, probs, flows
        return losses, probs


def _take_channel(probs: jnp.ndarray, channel) -> jnp.ndarray:
    """probs [..., C] -> [...] at a (possibly traced) channel index."""
    onehot = jax.nn.one_hot(channel, probs.shape[-1], dtype=probs.dtype)
    return jnp.sum(probs * onehot, axis=-1)


_IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
_IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


def maybe_normalize(imgs: jnp.ndarray) -> jnp.ndarray:
    """uint8 frames -> ImageNet-normalized f32 (no-op for float inputs)."""
    if imgs.dtype == jnp.uint8:
        return (imgs.astype(jnp.float32) / 255.0 - _IMAGENET_MEAN) / _IMAGENET_STD
    return imgs
