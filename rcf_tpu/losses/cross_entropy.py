"""Cross-entropy / BCE losses with mmdet-style weighting (API parity).

The reference instantiates `models/cross_entropy_loss.py` from the
decode-head configs but never uses it on the RCF loss path (SURVEY.md §2.1)
— the RCF losses are hand-rolled. Provided here for the same completeness:
segmentation heads can be supervised directly when labels exist.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _reduce(loss: jnp.ndarray, weight=None, reduction: str = "mean", avg_factor=None):
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    if avg_factor is not None:
        return jnp.sum(loss) / avg_factor
    if weight is not None:
        return jnp.sum(loss) / jnp.maximum(jnp.sum(weight), 1e-12)
    return jnp.mean(loss)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, weight=None,
                  class_weight=None, reduction: str = "mean", avg_factor=None,
                  ignore_index: int = -100) -> jnp.ndarray:
    """logits [..., C]; integer labels [...]. Ignored labels contribute 0."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    if class_weight is not None:
        cw = jnp.asarray(class_weight)[safe_labels]
        nll = nll * cw
    nll = jnp.where(valid, nll, 0.0)
    vweight = valid.astype(nll.dtype) if weight is None else weight * valid
    return _reduce(nll, vweight, reduction, avg_factor)


def binary_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray, weight=None,
                         reduction: str = "mean", avg_factor=None,
                         pos_weight=None) -> jnp.ndarray:
    """Sigmoid BCE with logits; targets in [0, 1]."""
    log_p = jax.nn.log_sigmoid(logits)
    log_np = jax.nn.log_sigmoid(-logits)
    pos = targets * log_p * (pos_weight if pos_weight is not None else 1.0)
    loss = -(pos + (1.0 - targets) * log_np)
    return _reduce(loss, weight, reduction, avg_factor)


class CrossEntropyLoss:
    """Config-compatible callable (`models/cross_entropy_loss.py:123`)."""

    def __init__(self, use_sigmoid: bool = False, use_mask: bool = False,
                 reduction: str = "mean", class_weight=None, loss_weight: float = 1.0):
        assert not use_mask, "mask CE is not used by any shipped config"
        self.use_sigmoid = use_sigmoid
        self.reduction = reduction
        self.class_weight = class_weight
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None, reduction_override=None):
        reduction = reduction_override or self.reduction
        if self.use_sigmoid:
            loss = binary_cross_entropy(pred, target, weight, reduction, avg_factor)
        else:
            loss = cross_entropy(pred, target, weight, self.class_weight, reduction, avg_factor)
        return self.loss_weight * loss
