"""End-to-end learning signal: overfit stage-1 on synthetic two-motion clips.

A colored square moves with one constant flow over a background moving with
another. The relaxed common-fate loss alone (flow is the only supervision)
must (a) drive the flow-reconstruction loss down and (b) make some mask
channel align with the moving square — the core claim of the method.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcf_tpu.config import Config
from rcf_tpu.models import build_model
from rcf_tpu.parallel import create_mesh, replicate, shard_batch
from rcf_tpu.train import create_train_state, make_train_step
from tests.test_train_step import _cfg, _tiny_model_kwargs


def _synthetic_batch(rng, b=8, hw=48):
    imgs = np.zeros((b, 2, hw, hw, 3), np.float32)
    flows = np.zeros((b, 1, hw, hw, 2), np.float32)
    gt_masks = np.zeros((b, hw, hw), np.float32)
    for k in range(b):
        noise = rng.normal(0, 0.1, (hw, hw, 3))
        base = np.full((hw, hw, 3), -0.5) + noise
        y, x = rng.integers(6, hw - 22, 2)
        sq = (slice(y, y + 16), slice(x, x + 16))
        img = base.copy()
        img[sq] = 1.0 + noise[sq]
        imgs[k, 0] = imgs[k, 1] = img
        flows[k, 0, :, :, :] = np.array([-2.0, 1.0])
        flows[k, 0, sq[0], sq[1], :] = np.array([5.0, 3.0])
        gt_masks[k][sq] = 1.0
    return imgs, flows, gt_masks


def _best_channel_iou(probs, gt_masks):
    """probs [B, I, h, w, C]; gt [B, H, W] -> best channel mean IoU."""
    from rcf_tpu.ops import resize_bilinear

    b, _, h, w, c = probs.shape
    gt = np.asarray(resize_bilinear(jnp.asarray(gt_masks)[..., None], (h, w)))[..., 0] > 0.5
    best = []
    for k in range(b):
        ious = []
        for ch in range(c):
            pred = np.asarray(probs[k, 0, :, :, ch]) > 0.5
            union = (pred | gt[k]).sum()
            ious.append((pred & gt[k]).sum() / union if union else 0.0)
        best.append(max(ious))
    return float(np.mean(best))


@pytest.mark.slow
def test_stage1_overfits_two_motion_clips():
    rng = np.random.default_rng(0)
    imgs, flows, gt_masks = _synthetic_batch(rng)
    mk = _tiny_model_kwargs(c=2)
    mk["decode_head"]["mask_size"] = [12, 12]
    mk["mask_size"] = [12, 12]
    mk["decode_head"]["clamp_flow_t"] = 20.0
    model = build_model(mk)
    cfg = _cfg(mk)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(imgs), jnp.asarray(flows), jnp.asarray(flows), train=True,
    )
    mesh = create_mesh()
    state = replicate(create_train_state(cfg, model, variables, steps_per_epoch=100), mesh)
    step = make_train_step(model, donate=False)
    batch = shard_batch({"imgs": imgs, "gt_fw_flows": flows, "gt_bw_flows": flows}, mesh)
    oc = jnp.zeros((), jnp.int32)

    state, losses = step(state, batch, jax.random.PRNGKey(2), oc)
    first_loss = float(losses["loss_warp_seg"])
    probs0 = model.apply({"params": state.params, "batch_stats": state.batch_stats},
                         jnp.asarray(imgs.reshape(-1, *imgs.shape[2:])), train=False,
                         method=model.mask_probs)
    iou0 = _best_channel_iou(np.asarray(probs0).reshape(8, 2, 12, 12, 2), gt_masks)

    for k in range(80):
        state, losses = step(state, batch, jax.random.PRNGKey(10 + k), oc)
    final_loss = float(losses["loss_warp_seg"])

    probs1 = model.apply({"params": state.params, "batch_stats": state.batch_stats},
                         jnp.asarray(imgs.reshape(-1, *imgs.shape[2:])), train=False,
                         method=model.mask_probs)
    iou1 = _best_channel_iou(np.asarray(probs1).reshape(8, 2, 12, 12, 2), gt_masks)

    # 80 CPU steps of a tiny model: assert the learning signal, not the
    # asymptote (observed: loss 4.8 -> ~1.9, IoU 0.08 -> ~0.23 and rising).
    assert final_loss < first_loss * 0.5, f"flow loss did not halve: {first_loss} -> {final_loss}"
    assert iou1 > iou0 + 0.1, f"object discovery did not improve: {iou0:.3f} -> {iou1:.3f}"
