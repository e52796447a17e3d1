"""Golden tests against the ACTUAL reference torch source (/root/reference).

Round-1 parity tests compared against hand-written replicas; these import
the reference's real modules (via tests/reference_harness.py) so a shared
misunderstanding between replica and implementation cannot pass silently
(VERDICT.md round-1, "Next round" item 1):

* flow-aggregation head, all residual modes, identical imported weights
  (`models/flow_aggregation_head_with_residual.py:312-368`);
* the composed RCFModel.forward_train loss dict on identical weights/inputs
  (`models/rcf_model.py:410-531`), weights round-tripped through OUR
  Lightning importer from a real `torch.save` artifact — which also
  exercises the importer against a reference-architecture state dict;
* warp utils, AMD loss blocks, compactness, sharpen/entropy/PL/CRF losses,
  cost-volume correlation.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

from reference_harness import load_reference


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def nchw(x: np.ndarray) -> torch.Tensor:
    """NHWC numpy -> NCHW torch."""
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x, -1, -3)))


def to_nhwc(t: torch.Tensor) -> np.ndarray:
    return np.moveaxis(t.detach().numpy(), -3, -1)


# ---------------------------------------------------------------------------
# Flow aggregation head (the RCF loss core)
# ---------------------------------------------------------------------------


def _flow_head_case(ref, *, free_residual=False, free_residual_with_affine=False,
                    quadratic=False, residual_adjustment_scale=10.0,
                    outlier_robust_loss=False, mask_size=(48, 48), res_hw=(24, 24),
                    clamp_flow_t=20.0, seed=0):
    from rcf_tpu.nn import FlowAggregationHead
    from rcf_tpu.train.checkpoint import import_flow_head

    torch.manual_seed(seed)
    b, c = 2, 4
    h, w = mask_size
    kwargs = dict(
        ssim_sz=1, create_flownet=True, mask_layer=c,
        flow_feat_before_agg_kernel_size=3, num_flow_feat_channels=64,
        mask_size=list(mask_size), norm_flow=False, clamp_flow_t=clamp_flow_t,
        free_residual=free_residual,
        free_residual_with_affine=free_residual_with_affine,
        free_residual_with_affine_quadratic=quadratic,
        outlier_robust_loss=outlier_robust_loss, eps=0.01, q=0.4,
        allow_residual_resize=True,
        residual_adjustment_scale=residual_adjustment_scale, pred_div_coeff=10.0,
    )
    import argparse

    torch_head = ref.flow_head.FlowAggregationHeadWithResidual(
        args=argparse.Namespace(), **kwargs)
    torch_head.eval()

    rng = np.random.default_rng(seed)
    masks_logits = rng.standard_normal((b, 2, h, w, c)).astype(np.float32) * 2
    masks = np.exp(masks_logits) / np.exp(masks_logits).sum(-1, keepdims=True)
    fw = (rng.standard_normal((b, 1, h, w, 2)) * 8).astype(np.float32)
    bw = (rng.standard_normal((b, 1, h, w, 2)) * 8).astype(np.float32)
    res_fw = (rng.standard_normal((b, *res_hw, 2 * c)) * 3).astype(np.float32)
    res_bw = (rng.standard_normal((b, *res_hw, 2 * c)) * 3).astype(np.float32)

    t_masks = nchw(masks)          # [B, 2, C, H, W]
    t_imgs = torch.zeros(b, 2, 3, h, w)
    with torch.no_grad():
        t_flows, t_loss = torch_head(
            t_imgs, t_masks, nchw(fw), nchw(bw), nchw(res_fw), nchw(res_bw))

    ours = FlowAggregationHead(
        mask_layer=c, mask_size=tuple(mask_size), clamp_flow_t=clamp_flow_t,
        free_residual=free_residual,
        free_residual_with_affine=free_residual_with_affine,
        free_residual_with_affine_quadratic=quadratic,
        outlier_robust_loss=outlier_robust_loss,
        residual_adjustment_scale=residual_adjustment_scale,
        allow_residual_resize=True,
    )
    params = import_flow_head(torch_head.state_dict(), prefix="")
    losses, flows = ours.apply(
        {"params": params}, masks, fw, bw, res_fw, res_bw, train=False)
    return t_loss, t_flows, losses, flows


def test_flow_head_free_residual_golden(ref):
    """Stage-1 recipe: learned constant flow + tanh residual."""
    t_loss, t_flows, losses, flows = _flow_head_case(ref, free_residual=True)
    np.testing.assert_allclose(float(losses["seg_fw"]), t_loss["seg_fw"].item(), rtol=1e-4)
    np.testing.assert_allclose(float(losses["seg_bw"]), t_loss["seg_bw"].item(), rtol=1e-4)
    np.testing.assert_allclose(float(losses["seg"]), t_loss["seg"].item(), rtol=1e-4)
    # agg flow parity (pre-normalization): reference stores fw+bw normalized
    # by (h/2, w/2) per component in channel order [y-ish? it splits 0:1 / h].
    fw_agg, bw_agg = flows["agg_flow"]
    t_agg = t_flows["agg_flow"][0]  # [B, 4, H, W], components scaled by 2/h, 2/w
    h = fw_agg.shape[1]
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(fw_agg), -1, 1) * (2.0 / h),
        t_agg[:, :2].numpy(), rtol=2e-4, atol=1e-5)


def test_flow_head_free_residual_no_limit_golden(ref):
    """residual_adjustment_scale == -1: raw (untanh'd) residual."""
    t_loss, _, losses, _ = _flow_head_case(
        ref, free_residual=True, residual_adjustment_scale=-1.0)
    np.testing.assert_allclose(float(losses["seg"]), t_loss["seg"].item(), rtol=1e-4)


def test_flow_head_outlier_robust_golden(ref):
    t_loss, _, losses, _ = _flow_head_case(
        ref, free_residual=True, outlier_robust_loss=True)
    np.testing.assert_allclose(float(losses["seg"]), t_loss["seg"].item(), rtol=1e-4)


def test_flow_head_affine_golden(ref):
    """STv2/FBMS recipe: + closed-form per-mask affine WLS flow."""
    t_loss, t_flows, losses, flows = _flow_head_case(
        ref, free_residual_with_affine=True)
    np.testing.assert_allclose(float(losses["seg"]), t_loss["seg"].item(), rtol=1e-3)
    fw_aff, _ = flows["affine_flow"]
    t_aff = t_flows["affine_flow"][0]
    h = fw_aff.shape[1]
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(fw_aff), -1, 1) * (2.0 / h),
        t_aff[:, :2].numpy(), rtol=1e-3, atol=1e-4)


def test_flow_head_affine_quadratic_golden(ref):
    t_loss, _, losses, _ = _flow_head_case(
        ref, free_residual_with_affine=True, quadratic=True)
    np.testing.assert_allclose(float(losses["seg"]), t_loss["seg"].item(), rtol=2e-3)


# ---------------------------------------------------------------------------
# Warp / occlusion / correlation (AMD support ops)
# ---------------------------------------------------------------------------


def test_flow_warp_golden(ref):
    from rcf_tpu.ops.warp import flow_warp

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 17, 23, 3)).astype(np.float32)
    flow = (rng.standard_normal((2, 17, 23, 2)) * 4).astype(np.float32)
    with torch.no_grad():
        t_out = ref.warp_utils.flow_warp(nchw(x), nchw(flow), pad="border")
    ours = flow_warp(x, flow, pad="border")
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(t_out), rtol=1e-5, atol=1e-5)


def test_occu_mask_backward_golden(ref):
    from rcf_tpu.ops.warp import occu_mask_backward

    rng = np.random.default_rng(2)
    flow = (rng.standard_normal((2, 24, 32, 2)) * 5).astype(np.float32)
    with torch.no_grad():
        t_occ = ref.warp_utils.get_occu_mask_backward(nchw(flow), th=0.2)
    ours = occu_mask_backward(flow, th=0.2)
    np.testing.assert_allclose(np.asarray(ours), t_occ[:, 0].numpy(), atol=1e-6)


def test_occu_mask_bidirection_golden(ref):
    from rcf_tpu.ops.warp import occu_mask_bidirection

    rng = np.random.default_rng(3)
    f12 = (rng.standard_normal((2, 24, 32, 2)) * 5).astype(np.float32)
    f21 = (rng.standard_normal((2, 24, 32, 2)) * 5).astype(np.float32)
    with torch.no_grad():
        t_occ = ref.warp_utils.get_occu_mask_bidirection(nchw(f12), nchw(f21))
    ours = occu_mask_bidirection(f12, f21)
    np.testing.assert_allclose(np.asarray(ours), t_occ[:, 0].numpy(), atol=1e-6)


def test_correlation_golden(ref):
    from rcf_tpu.ops.warp import correlation

    rng = np.random.default_rng(4)
    x1 = rng.standard_normal((2, 12, 14, 32)).astype(np.float32)
    x2 = rng.standard_normal((2, 12, 14, 32)).astype(np.float32)
    corr_mod = ref.correlation_native.Correlation(max_displacement=4)
    with torch.no_grad():
        t_out = corr_mod(nchw(x1), nchw(x2))  # [B, 81, H, W]
    ours = correlation(x1, x2, max_displacement=4)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ours), -1, 1), t_out.numpy(), rtol=1e-4, atol=1e-5)


def test_amd_loss_blocks_golden(ref):
    from rcf_tpu.losses.unflow import ssim_dist, ternary_dist, smooth_grad_1st, smooth_grad_2nd

    rng = np.random.default_rng(5)
    a = rng.random((2, 32, 40, 3)).astype(np.float32)
    b = rng.random((2, 32, 40, 3)).astype(np.float32)
    flow = (rng.standard_normal((2, 32, 40, 2)) * 3).astype(np.float32)
    occu = rng.random((2, 32, 40, 1)).astype(np.float32)

    with torch.no_grad():
        t_ssim = ref.loss_blocks.SSIM(nchw(a), nchw(b))
        t_tern = ref.loss_blocks.TernaryLoss(nchw(a), nchw(b))
        t_s1 = ref.loss_blocks.smooth_grad_1st(nchw(flow), nchw(a), alpha=10.0)
        t_s2 = ref.loss_blocks.smooth_grad_2nd(nchw(flow), nchw(a), alpha=10.0)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ssim_dist(a, b)), -1, 1), t_ssim.numpy(),
        rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ternary_dist(a, b)), -1, 1), t_tern.numpy(),
        rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(float(smooth_grad_1st(flow, a, 10.0)), t_s1.item(), rtol=1e-4)
    np.testing.assert_allclose(float(smooth_grad_2nd(flow, a, 10.0)), t_s2.item(), rtol=1e-4)
    del occu


def test_occu_golden_via_flow_loss_consistency(ref):
    """get_occu_mask_backward inside unFlowLoss consumes (1 - mask)."""
    # Covered by test_occu_mask_backward_golden; kept as an explicit contract
    # note: reference occu masks are "1 = visible" after `1 - get_occu...`.
    assert ref.flow_loss.unFlowLoss is not None


# ---------------------------------------------------------------------------
# Regularizer losses (RCFModel methods + utils.sharpen)
# ---------------------------------------------------------------------------


def test_sharpen_golden(ref):
    from rcf_tpu.losses.regularizers import sharpen

    rng = np.random.default_rng(6)
    p = rng.random((2, 2, 4, 8, 8)).astype(np.float32)
    p /= p.sum(axis=2, keepdims=True)
    with torch.no_grad():
        t_out = ref.loss_utils.sharpen(torch.from_numpy(p), 0.25, dim=2)
    ours = sharpen(np.moveaxis(p, 2, -1), 0.25, axis=-1)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ours), -1, 2), t_out.numpy(), rtol=1e-5, atol=1e-6)


def _loss_self(ref, **attrs):
    """A minimal `self` for calling RCFModel loss methods unbound."""
    import argparse
    import types

    ns = types.SimpleNamespace(**attrs)
    ns.args = argparse.Namespace(object_channel=attrs.pop("object_channel", 1))
    return ns


def test_sharpen_and_entropy_loss_golden(ref):
    from rcf_tpu.losses.regularizers import (
        entropy_loss, object_aware_sharpen_loss, quirk_log, sharpen_loss)

    rng = np.random.default_rng(7)
    logits = rng.standard_normal((2, 2, 4, 8, 8)).astype(np.float32)
    p_t = torch.softmax(torch.from_numpy(logits), dim=2)
    logp_t = torch.log_softmax(p_t, dim=2)  # the reference's quirk: log_softmax of probs
    p = np.moveaxis(p_t.numpy(), 2, -1)

    me = _loss_self(ref, t_sharpen=0.25, object_aware_sharpening=False)
    with torch.no_grad():
        t_sharp = ref.rcf_model.RCFModel.get_sharpen_loss(me, p_t, logp_t)
        t_ent = ref.rcf_model.RCFModel.get_entropy_loss(me, p_t, logp_t)
    np.testing.assert_allclose(float(sharpen_loss(p, 0.25)), t_sharp.item(), rtol=1e-4)
    np.testing.assert_allclose(float(entropy_loss(p)), t_ent.item(), rtol=1e-4)

    me_obj = _loss_self(ref, t_sharpen=0.25, object_aware_sharpening=True)
    with torch.no_grad():
        t_obj = ref.rcf_model.RCFModel.get_sharpen_loss(
            me_obj, p_t, logp_t, object_channel=1)
    np.testing.assert_allclose(
        float(object_aware_sharpen_loss(p, 0.25, 1)), t_obj.item(), rtol=1e-4)
    # quirk_log really is log_softmax-of-probs:
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(quirk_log(p, axis=-1)), -1, 2), logp_t.numpy(),
        rtol=1e-4, atol=1e-6)


def test_pl_and_crf_loss_golden(ref):
    from rcf_tpu.losses.regularizers import pseudo_label_loss

    rng = np.random.default_rng(8)
    p_t = torch.softmax(torch.from_numpy(
        rng.standard_normal((2, 2, 4, 8, 8)).astype(np.float32)), dim=2)
    masks = torch.from_numpy(rng.random((2, 2, 8, 8)).astype(np.float32))
    obj = p_t[:, :, 1].numpy()

    me = _loss_self(ref, object_channel=1, pl_mask_pos_th=0.35,
                    pl_pos_weight=2.0, pl_neg_weight=0.5)
    with torch.no_grad():
        t_pl = ref.rcf_model.RCFModel.get_pl_loss(me, p_t, masks)
    ours = pseudo_label_loss(obj, masks.numpy(), 2.0, 0.5, 0.35)
    np.testing.assert_allclose(float(ours), t_pl.item(), rtol=1e-4)

    me2 = _loss_self(ref, object_channel=1, crf_mask_pos_th=-1.0,
                     crf_pos_weight=1.0, crf_neg_weight=2.0)
    with torch.no_grad():
        t_crf = ref.rcf_model.RCFModel.get_crf_loss(me2, p_t, masks)
    ours2 = pseudo_label_loss(obj, masks.numpy(), 1.0, 2.0, -1.0)
    np.testing.assert_allclose(float(ours2), t_crf.item(), rtol=1e-4)


def test_compactness_golden(ref):
    from rcf_tpu.losses.regularizers import compactness_loss

    rng = np.random.default_rng(9)
    p_t = torch.softmax(torch.from_numpy(
        rng.standard_normal((2, 2, 4, 12, 16)).astype(np.float32)), dim=2)
    import argparse

    head = ref.compactness_head.CompactnessHead(
        args=argparse.Namespace(object_channel=None), compact_channel=1)
    with torch.no_grad():
        t_loss = head.get_compactness_loss(p_t)
    compact = p_t[:, :, 1].reshape(-1, 12, 16).numpy()
    np.testing.assert_allclose(float(compactness_loss(compact)), t_loss.item(), rtol=1e-4)


# ---------------------------------------------------------------------------
# Composed RCFModel.forward_train — the full 6-loss dict on shared weights.
# ---------------------------------------------------------------------------


def _stage1_model_kwargs(mask_size=(32, 32), num_classes=4, dropout=0.0):
    """The reference stage-1 model_kwargs (configs/rcf/rcf_stage1.yaml),
    shrunk: mask_size follows the test input (128^2 -> layer1 at 32^2),
    dropout zeroed so torch/flax RNG streams don't have to match."""
    norm = {"type": "SyncBN", "requires_grad": True}
    return {
        "w_seg": 1.0, "w_sharpen": 0, "w_entropy": 0.05,
        "separate_residual": True, "mask_layer": num_classes,
        "align_corners": False, "mask_size": list(mask_size),
        "train_iter": 1,  # skip the reference's vis block (log_interval 50)
        "backbone2": {
            "dilations": [1, 1, 2, 4], "strides": [1, 2, 1, 1], "type": "ResNet",
            "depth": 50, "num_stages": 4, "out_indices": [0, 1, 2, 3],
            "norm_cfg": dict(norm), "norm_eval": False, "style": "pytorch",
            "contract_dilation": True,
        },
        "decode_head": {
            "ssim_sz": 1, "create_flownet": True, "mask_layer": num_classes,
            "type": "FlowAggregationHeadWithResidual",
            "flow_feat_before_agg_kernel_size": 3, "num_flow_feat_channels": 64,
            "mask_size": list(mask_size), "norm_flow": False, "clamp_flow_t": 20.0,
            "free_residual": True, "free_residual_with_affine": False,
            "free_scale": False, "outlier_robust_loss": False, "eps": 0.01,
            "q": 0.4, "allow_residual_resize": True,
            "residual_adjustment_scale": 10.0, "pred_div_coeff": 10.0,
        },
        "decode_head2": {
            "input_transform": "resize_concat", "concat_input": False,
            "dilation": 6, "channels": 256, "type": "FCNHead",
            "in_channels": [256, 2048], "in_index": [0, 3], "num_convs": 2,
            "dropout_ratio": dropout, "num_classes": num_classes,
            "norm_cfg": dict(norm), "align_corners": False,
        },
        "decode_head3": {
            "concat_input": False, "dilation": 6, "channels": 256,
            "type": "FCNHead", "in_channels": 4096, "in_index": -1,
            "num_convs": 2, "dropout_ratio": dropout,
            "num_classes": 4 * num_classes, "norm_cfg": dict(norm),
            "align_corners": False,
        },
    }


@pytest.mark.slow
def test_composed_forward_train_golden(ref, tmp_path):
    """Full stage-1 forward_train loss dict, reference vs ours, weights
    imported from a real torch.save Lightning-format artifact through
    train/checkpoint.py::load_pretrained (VERDICT items 1 and 6)."""
    import argparse
    import copy

    import jax.numpy as jnp

    from rcf_tpu.models import build_model
    from rcf_tpu.train.checkpoint import load_pretrained

    torch.manual_seed(0)
    kwargs = _stage1_model_kwargs()
    args = argparse.Namespace(checkpoints_dir=str(tmp_path), object_channel=None)
    t_model = ref.rcf_model.RCFModel(args=args, **copy.deepcopy(kwargs))
    t_model.train()

    # ---- a real Lightning-shaped artifact, saved with torch.save ----
    sd = {f"model.{k}": v for k, v in t_model.state_dict().items()}
    art = tmp_path / "ref_stage1_like.ckpt"
    torch.save({"state_dict": sd, "epoch": 3}, art)

    our_model = build_model(copy.deepcopy(
        {k: v for k, v in kwargs.items() if k != "train_iter"}))
    rng = np.random.default_rng(0)
    b, i, hw = 2, 2, 128
    imgs = rng.standard_normal((b, i, hw, hw, 3)).astype(np.float32)
    fw = (rng.standard_normal((b, 1, hw, hw, 2)) * 8).astype(np.float32)
    bw = (rng.standard_normal((b, 1, hw, hw, 2)) * 8).astype(np.float32)

    import jax

    variables = our_model.init(
        jax.random.PRNGKey(0), jnp.asarray(imgs), gt_fw_flows=jnp.asarray(fw),
        gt_bw_flows=jnp.asarray(bw), train=False)
    variables = load_pretrained(str(art), our_model, variables)

    # ---- reference side ----
    t_imgs = nchw(imgs)
    with torch.no_grad():
        t_losses = t_model.forward_train(
            t_imgs, seq_ids=None, seq_names=None, paths=None,
            gt_fw_flows=nchw(fw), gt_bw_flows=nchw(bw), pl_masks=None)

    # ---- our side (train-mode BN, dropout zero) ----
    (losses, probs), new_vars = our_model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(imgs), gt_fw_flows=jnp.asarray(fw), gt_bw_flows=jnp.asarray(bw),
        train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )

    np.testing.assert_allclose(
        float(losses["loss_warp_seg"]), t_losses["loss_warp_seg"].item(), rtol=2e-3)
    np.testing.assert_allclose(
        float(losses["loss_entropy"]), t_losses["loss_entropy"].item(), rtol=2e-3)
    np.testing.assert_allclose(float(losses["loss"]), t_losses["loss"].item(), rtol=2e-3)

    # ---- eval-mode mask parity (the export path) ----
    # forward_train mutated the torch BN running stats in place; using OUR
    # mutated batch_stats here additionally goldens the running-stat update.
    t_model.eval()
    imgs_flat = imgs.reshape(b * i, hw, hw, 3)
    with torch.no_grad():
        feats = t_model.extract_feat(nchw(imgs_flat), t_model.backbone2)
        t_logits = t_model._decode_head_forward(feats, t_model.decode_head2)
        t_probs = torch.softmax(t_logits, dim=1)
    our_probs = our_model.apply(
        {"params": variables["params"], "batch_stats": new_vars["batch_stats"]},
        jnp.asarray(imgs_flat), train=False, method=our_model.mask_probs)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(our_probs), -1, 1), t_probs.numpy(),
        rtol=1e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# Checkpoint-importer branches on REAL reference-model torch.save artifacts
# (VERDICT item 6): MoCo (module.encoder_q.*), DenseCL (conv1.weight),
# Lightning-with-EMA, and the EMA-expansion rule.
# ---------------------------------------------------------------------------


def _ref_resnet18(ref, seed=0):
    torch.manual_seed(seed)
    net = ref.resnet.ResNet(
        depth=18, num_stages=4, out_indices=(0, 1, 2, 3), strides=(1, 2, 1, 1),
        dilations=(1, 1, 2, 4), contract_dilation=True,
        norm_cfg={"type": "BN", "requires_grad": True}, style="pytorch")
    net.init_weights()
    # Randomize BN stats so stat import is actually exercised.
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.7, 1.3)
    net.eval()
    return net


def _our_resnet18():
    from rcf_tpu.nn import ResNet

    return ResNet(depth=18, num_stages=4, out_indices=(0, 1, 2, 3),
                  strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4),
                  contract_dilation=True, style="pytorch")


def _assert_backbone_parity(ref_net, variables, x):
    import jax.numpy as jnp

    model = _our_resnet18()
    with torch.no_grad():
        t_feats = ref_net(nchw(x))
    feats = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False)
    for ours_f, theirs_f in zip(feats, t_feats):
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(ours_f), -1, 1), theirs_f.numpy(),
            rtol=1e-3, atol=1e-4)


def _init_backbone_vars():
    import jax
    import jax.numpy as jnp

    model = _our_resnet18()
    return model, model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)


class _BackboneCfgShim:
    """Just enough of RCFModel for load_pretrained's config lookups."""

    backbone_cfg = {"depth": 18}
    mask_head_cfg = {"num_convs": 2, "concat_input": False}
    residual_head_cfg = {"num_convs": 2, "concat_input": False}


def _import_into_backbone(tmp_path, ref, artifact_name, sd):
    """Route a raw state dict through load_pretrained via a wrapper tree."""
    from rcf_tpu.train.checkpoint import load_pretrained

    _, variables = _init_backbone_vars()
    # load_pretrained merges into variables['params']['backbone2'].
    wrapped = {"params": {"backbone2": variables["params"]},
               "batch_stats": {"backbone2": variables["batch_stats"]}}
    path = tmp_path / artifact_name
    torch.save(sd, path)
    out = load_pretrained(str(path), _BackboneCfgShim(), wrapped)
    return {"params": out["params"]["backbone2"],
            "batch_stats": out["batch_stats"]["backbone2"]}


def test_import_moco_format_golden(ref, tmp_path):
    """MoCo v1/v2 artifact: module.encoder_q.* prefix, fc keys dropped
    (reference dispatch main.py:115-128)."""
    net = _ref_resnet18(ref, seed=1)
    sd = {f"module.encoder_q.{k}": v for k, v in net.state_dict().items()}
    sd["module.encoder_q.fc.weight"] = torch.zeros(10, 512)
    sd["module.encoder_q.fc.bias"] = torch.zeros(10)
    sd["module.encoder_k.conv1.weight"] = torch.zeros_like(net.conv1.weight)
    variables = _import_into_backbone(
        tmp_path, ref, "moco.pth", {"state_dict": sd})
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    _assert_backbone_parity(net, variables, x)


def test_import_densecl_format_golden(ref, tmp_path):
    """DenseCL artifact: bare conv1.weight keys (main.py:129-131)."""
    net = _ref_resnet18(ref, seed=2)
    variables = _import_into_backbone(
        tmp_path, ref, "densecl.pth", {"state_dict": dict(net.state_dict())})
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    _assert_backbone_parity(net, variables, x)


def test_import_lightning_ema_trees_golden(ref, tmp_path):
    """Lightning artifact WITH backbone2_ema.* -> ema trees imported and
    forward-equal to the torch EMA backbone (main.py:92-107)."""
    from rcf_tpu.train.checkpoint import load_pretrained

    net = _ref_resnet18(ref, seed=3)
    ema = _ref_resnet18(ref, seed=4)  # different weights than main
    sd = {f"model.backbone2.{k}": v for k, v in net.state_dict().items()}
    sd.update({f"model.backbone2_ema.{k}": v for k, v in ema.state_dict().items()})
    path = tmp_path / "lightning_ema.ckpt"
    torch.save({"state_dict": sd}, path)

    _, variables = _init_backbone_vars()
    wrapped = {"params": {"backbone2": variables["params"]},
               "batch_stats": {"backbone2": variables["batch_stats"]}}
    out = load_pretrained(str(path), _BackboneCfgShim(), wrapped)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    _assert_backbone_parity(net, {"params": out["params"]["backbone2"],
                                  "batch_stats": out["batch_stats"]["backbone2"]}, x)
    _assert_backbone_parity(ema, {"params": out["ema_params"]["backbone2"],
                                  "batch_stats": out["ema_stats"]["backbone2"]}, x)


def test_pwc_lite_import_forward_golden(ref, tmp_path):
    """PWC-Lite importer (load_flownet knob) + full pyramid/cost-volume/
    estimator forward parity vs the reference net on imported weights
    (`models/amd/pwc_lite.py`, `models/fcn_head.py:88-93`)."""
    import jax
    import jax.numpy as jnp

    from rcf_tpu.models.amd.pwc_lite import PWCLite
    from rcf_tpu.train.checkpoint import import_pwc_lite

    torch.manual_seed(0)
    t_net = ref.pwc_lite.PWCLite(mask_layer=4)
    t_net.init_weights()
    t_net.eval()

    rng = np.random.default_rng(0)
    b, h, w, c = 2, 64, 128, 4
    im1 = rng.random((b, h, w, 3)).astype(np.float32)
    im2 = rng.random((b, h, w, 3)).astype(np.float32)
    m = rng.random((b, 16, 32, c)).astype(np.float32)
    mask1 = m / m.sum(-1, keepdims=True)
    mask2 = np.roll(mask1, 1, axis=-1)

    with torch.no_grad():
        two = torch.cat([nchw(im1), nchw(im2)], dim=1)
        t_res = t_net(two, [nchw(mask1), nchw(mask2)], with_bk=True)

    ours = PWCLite(mask_layer=c)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(im1), jnp.asarray(im2),
                          jnp.asarray(mask1), jnp.asarray(mask2))
    # round-trip through a real torch.save artifact
    path = tmp_path / "pwc_lite.pth"
    torch.save({"state_dict": t_net.state_dict()}, path)
    sd = torch.load(path, weights_only=False)["state_dict"]
    imported = import_pwc_lite(sd)

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst[k], v)
            else:
                assert dst[k].shape == v.shape, k
                dst[k] = v

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    merge(params, imported)
    res = ours.apply({"params": params}, jnp.asarray(im1), jnp.asarray(im2),
                     jnp.asarray(mask1), jnp.asarray(mask2), with_bk=True)

    for key in ("flows_fw", "flows_bw"):
        assert len(res[key]) == len(t_res[key]) == 5
        for ours_f, theirs_f in zip(res[key], t_res[key]):
            np.testing.assert_allclose(
                np.moveaxis(np.asarray(ours_f), -1, 1), theirs_f.numpy(),
                rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("arch,fmt", [
    ("moco_vit_small", "moco"), ("mae_vit_base", "mae"), ("vit_small", "dino")])
def test_dino_family_import_golden(ref, tmp_path, arch, fmt):
    """MoCo-v3 / MAE / DINO checkpoint key surgery + ViT forward parity vs
    the reference VisionTransformer (`models/dino_vit.py:448-520`)."""
    import jax.numpy as jnp

    from rcf_tpu.nn.dino_vit import get_dino_model

    torch.manual_seed(0)
    patch = 16
    t_model = getattr(ref.dino_vit, arch)(num_classes=0) if fmt != "dino" else \
        ref.dino_vit.vit_small(patch_size=patch, num_classes=0)
    t_model.eval()

    sd = t_model.state_dict()
    if fmt == "moco":
        wrapped = {"state_dict": {f"module.base_encoder.{k}": v for k, v in sd.items()}}
        wrapped["state_dict"]["module.base_encoder.head.weight"] = torch.zeros(2, 2)
        wrapped["state_dict"]["module.momentum_encoder.cls_token"] = sd["cls_token"]
    elif fmt == "mae":
        wrapped = {"model": dict(sd)}
        wrapped["model"]["mask_token"] = torch.zeros(1, 1, 768)
        wrapped["model"]["decoder_embed.weight"] = torch.zeros(2, 2)
    else:
        wrapped = dict(sd)
    path = tmp_path / f"{arch}.pth"
    torch.save(wrapped, path)

    model, params = get_dino_model(arch, patch, checkpoint_path=str(path))
    assert params is not None

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_tokens = t_model(nchw(x))
    tokens = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(tokens), t_tokens.numpy(), rtol=2e-3, atol=2e-4)


def test_unflow_loss_composed_golden(ref):
    """Composed multi-scale unFlowLoss (occlusion masks + photometric +
    scale weighting) vs the reference module (`models/amd/flow_loss.py`)."""
    import jax.numpy as jnp

    from rcf_tpu.losses.unflow import UnFlowLossCfg, unflow_loss

    cfg_dict = {"alpha": 10, "ssim_sz": 1, "occ_from_back": True, "type": "unflow",
                "w_l1": 0.15, "w_scales": [1.0, 1.0, 1.0, 1.0, 0.0],
                "w_sm_scales": [1.0, 0.0, 0.0, 0.0, 0.0], "w_real_smooth": 0.0,
                "w_ssim": 0.85, "w_ternary": 0.0, "warp_pad": "border",
                "with_bk": True}
    t_loss_mod = ref.flow_loss.unFlowLoss(ref.flow_head.Objectview(dict(cfg_dict)))

    rng = np.random.default_rng(11)
    b, h, w = 2, 64, 96
    im1 = rng.random((b, h, w, 3)).astype(np.float32)
    im2 = rng.random((b, h, w, 3)).astype(np.float32)
    pyr = [(rng.standard_normal((b, h // s, w // s, 4)) * 4).astype(np.float32)
           for s in (1, 2, 4, 8, 16)]

    with torch.no_grad():
        t_total, t_warp, _, t_abs = t_loss_mod(
            [nchw(p) for p in pyr], torch.cat([nchw(im1), nchw(im2)], dim=1))

    cfg = UnFlowLossCfg(**{k: (tuple(v) if isinstance(v, list) else v)
                           for k, v in cfg_dict.items() if k != "type"})
    total, warp, _, abs0 = unflow_loss(
        [jnp.asarray(p) for p in pyr], jnp.asarray(im1), jnp.asarray(im2), cfg)
    np.testing.assert_allclose(float(total), t_total.item(), rtol=2e-4)
    np.testing.assert_allclose(float(warp), t_warp.item(), rtol=2e-4)
    np.testing.assert_allclose(float(abs0), t_abs.item(), rtol=1e-5)
