"""Mask regularizer losses (pure jnp, channel-last).

Parity targets in the reference:
* entropy loss      — `models/rcf_model.py:376-378`
* sharpen loss      — `models/rcf_model.py:350-374`, `utils/loss_utils.py:105-108`
* pseudo-label loss — `models/rcf_model.py:380-393` (CRF loss `:395-408` is the
  same weighted one-sided MSE with a different source mask)
* compactness loss  — `models/compactness_head.py:14-57`

Note on the entropy/sharpen "log" term: the reference computes
``log_all_pred_mask = F.log_softmax(softmax(logits))`` — a log-softmax applied
to *probabilities*, not logits (`models/rcf_model.py:433-434`). The published
hyperparameters (w_entropy=0.05 etc.) were tuned against that quirk, so we
reproduce it exactly: ``quirk_log(p) = p - logsumexp(p)`` over the mask axis.

Masks here are ``[..., C]`` with the channel/mask axis last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quirk_log(probs: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """log_softmax applied to probabilities (reference quirk, see module doc)."""
    return jax.nn.log_softmax(probs, axis=axis)


def entropy_loss(probs: jnp.ndarray) -> jnp.ndarray:
    """-(p * quirk_log p) summed over masks, mean over the rest."""
    return -jnp.mean(jnp.sum(probs * quirk_log(probs), axis=-1))


def sharpen(p: jnp.ndarray, t: float, axis: int = -1) -> jnp.ndarray:
    """Temperature sharpening p^(1/T) / sum (PAWS-style)."""
    sharp = p ** (1.0 / t)
    return sharp / jnp.sum(sharp, axis=axis, keepdims=True)


def sharpen_loss(probs: jnp.ndarray, t_sharpen: float) -> jnp.ndarray:
    """KL(p_sharp || p) elementwise-mean with the stop-gradient sharp target.

    Matches ``F.kl_div(quirk_log(p), sharpen(p.detach()), reduction='none').mean()``:
    elementwise p_t * (log p_t - log q), averaged over every element.
    """
    target = sharpen(jax.lax.stop_gradient(probs), t_sharpen, axis=-1)
    log_q = quirk_log(probs)
    pointwise = target * (jnp.log(target) - log_q)
    return jnp.mean(pointwise)


def object_aware_sharpen_loss(
    probs: jnp.ndarray, t_sharpen: float, object_channel: jnp.ndarray | int
) -> jnp.ndarray:
    """Hinge on |p_obj - max_{c != obj} p_c|: mean(relu(t - diff)).

    probs: [..., C]; object_channel may be a traced scalar.
    """
    c = probs.shape[-1]
    onehot = jax.nn.one_hot(object_channel, c, dtype=probs.dtype)
    obj = jnp.sum(probs * onehot, axis=-1)
    others = jax.lax.stop_gradient(probs) * (1.0 - onehot)
    diff = jnp.abs(obj - jnp.max(others, axis=-1))
    return jnp.mean(jnp.maximum(t_sharpen - diff, 0.0))


def pseudo_label_loss(
    object_probs: jnp.ndarray,
    target_masks: jnp.ndarray,
    pos_weight: float = 1.0,
    neg_weight: float = 1.0,
    pos_th: float = -1.0,
) -> jnp.ndarray:
    """One-sided weighted MSE between the object-channel mask and a target.

    Used for both the stage-2.2 pseudo-label loss and the stage-2.1 CRF loss.
    ``pos_th != -1`` binarizes the target first.
    """
    if pos_th != -1.0:
        target_masks = (target_masks > pos_th).astype(jnp.float32)
    gap = target_masks.astype(jnp.float32) - object_probs.astype(jnp.float32)
    loss_pos = jnp.mean(jnp.maximum(gap, 0.0) ** 2) * pos_weight
    loss_neg = jnp.mean(jnp.minimum(gap, 0.0) ** 2) * neg_weight
    return loss_pos + loss_neg


def compactness_loss(compact_probs: jnp.ndarray) -> jnp.ndarray:
    """GWM-style spatial compactness on one soft mask.

    compact_probs: [N, H, W] soft mask for the compact channel. Penalizes
    mask mass by its squared distance to the soft centroid (coordinates
    normalized by H and W respectively).
    """
    n, h, w = compact_probs.shape
    m = compact_probs.astype(jnp.float32)
    y = (jnp.arange(h, dtype=jnp.float32) / h)[None, :, None]
    x = (jnp.arange(w, dtype=jnp.float32) / w)[None, None, :]
    count = jnp.sum(m, axis=(1, 2), keepdims=True)
    yc = jnp.sum(y * m, axis=(1, 2), keepdims=True) / count
    xc = jnp.sum(x * m, axis=(1, 2), keepdims=True) / count
    err = (y - yc) ** 2 + (x - xc) ** 2
    return jnp.mean(err * m)
