"""Training & eval visualization grids (observability parity).

The reference saves a JPEG grid every ``log_interval`` steps: per-channel
masks for both frames, the unnormalized images, and flow colorizations of
pred/gt/aggregated/affine/residual flows, plus pseudo-labels when present
(`models/rcf_model.py:456-608`); eval saves image+mask stacks
(`rcf_model.py:291-308`). Here a dedicated jitted "vis step" recomputes the
forward with flow outputs on the logged batch (1/log_interval extra
forwards instead of dragging vis tensors through every step).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..ops import resize_bilinear
from ..utils.flow_vis import flow_to_color

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def make_vis_step(model, out_sharding=None):
    """out_sharding: pass a *replicated* sharding under process_count > 1 so
    process 0 can read the full probs/flows for grid composition (the step
    itself must run on EVERY process — it is a collective program)."""
    import functools

    @functools.partial(jax.jit, out_shardings=out_sharding)
    def vis_step(state, batch, dropout_rng, object_channel):
        (losses, probs, flows) = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["imgs"],
            gt_fw_flows=batch.get("gt_fw_flows"),
            gt_bw_flows=batch.get("gt_bw_flows"),
            object_channel=object_channel,
            train=True,
            return_flows=True,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"],
        )[0]
        return probs, flows

    return vis_step


def _to_u8(x01: np.ndarray) -> np.ndarray:
    return np.clip(x01 * 255.0, 0, 255).astype(np.uint8)


def _unnormalize(img: np.ndarray) -> np.ndarray:
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    return np.clip(img * IMAGENET_STD + IMAGENET_MEAN, 0, 1)


def compose_train_grid(imgs: np.ndarray, probs: np.ndarray, flows: dict,
                       pl_masks: np.ndarray | None = None, sample: int = 0) -> np.ndarray:
    """One batch sample -> RGB grid (rows = visualization kinds).

    imgs [B, I, H, W, 3] (normalized); probs [B, I, h, w, C]; flows: dict of
    (fw, bw) pairs of [B, h', w', 2] from the flow head.
    """
    b, im_num, h, w, c = probs.shape
    rows = []
    # Per-channel masks, frames side by side.
    for ch in range(c):
        rows.append(np.concatenate(
            [np.repeat(probs[sample, i, :, :, ch : ch + 1], 3, axis=-1) for i in range(im_num)],
            axis=1,
        ))
    # Unnormalized images resized to the mask grid.
    imgs_small = np.asarray(resize_bilinear(jnp.asarray(imgs[sample]), (h, w)))
    rows.append(np.concatenate([_unnormalize(imgs_small[i]) for i in range(im_num)], axis=1))
    # Flow colorizations: fw | bw per kind.
    for kind in ("pred_flow", "gt_flow", "agg_flow", "affine_flow", "residual_adj"):
        if kind not in flows:
            continue
        fw, bw = flows[kind]
        fw_r = np.asarray(resize_bilinear(fw[sample : sample + 1], (h, w)))[0]
        bw_r = np.asarray(resize_bilinear(bw[sample : sample + 1], (h, w)))[0]
        rows.append(np.concatenate(
            [flow_to_color(fw_r) / 255.0, flow_to_color(bw_r) / 255.0], axis=1))
    if pl_masks is not None:
        pl = np.asarray(resize_bilinear(jnp.asarray(pl_masks[sample])[..., None], (h, w)))[..., 0]
        rows.append(np.concatenate(
            [np.repeat(pl[i][..., None], 3, axis=-1) for i in range(im_num)], axis=1))
    return np.concatenate(rows, axis=0)


def save_train_grid(save_dir: str, train_iter: int, seq_name: str, frame_id: str,
                    grid01: np.ndarray) -> str:
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(
        save_dir, f"train_iter{train_iter:07d}_{seq_name}_{frame_id}_img_pred_recons.jpg"
    )
    Image.fromarray(_to_u8(grid01)).save(path, quality=90)
    return path


def save_eval_visualization(save_dir: str, name: str, img: np.ndarray,
                            probs: np.ndarray) -> str:
    """img [H, W, 3] normalized; probs [h, w, C]. Stacks image over each
    channel's mask at 2x mask resolution (rcf_model.py:291-305)."""
    os.makedirs(save_dir, exist_ok=True)
    h2, w2 = probs.shape[0] * 2, probs.shape[1] * 2
    img_r = np.asarray(resize_bilinear(jnp.asarray(img)[None], (h2, w2)))[0]
    panels = [(_unnormalize(img_r))]
    for ch in range(probs.shape[-1]):
        m = np.asarray(resize_bilinear(jnp.asarray(probs)[None, :, :, ch : ch + 1], (h2, w2)))[0]
        panels.append(np.repeat(m, 3, axis=-1))
    grid = np.concatenate(panels, axis=0)
    path = os.path.join(save_dir, f"{name}.jpg")
    Image.fromarray(_to_u8(grid)).save(path, quality=90)
    return path
