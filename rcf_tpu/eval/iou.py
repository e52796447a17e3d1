"""On-device IoU against ground-truth annotations.

Parity with the reference eval path (`main.py:199-238`,
`utils/eval_utils.py:14-50,120-123`):

* predicted masks are bilinearly resized (align_corners=True, matching
  `utils/eval_utils.py:5-12`) to the annotation resolution;
* ``pos_th != -1`` thresholds every channel independently; ``pos_th == -1``
  takes the channel argmax as a one-hot assignment;
* annotation pixels equal to 128 are ignored; 255 is foreground;
* the returned (intersection, union) pairs are per frame per channel —
  the ratio (with NaN for empty unions) is formed on the host to keep the
  reference's nanmean semantics.

Unlike the reference (numpy histograms on rank 0 only, `main.py:224-238`),
this runs fully on device and shards over the eval batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import resize_bilinear


def iou_counts(probs: jnp.ndarray, ann: jnp.ndarray, pos_th: float = 0.35):
    """probs [B, h, w, C]; ann [B, H, W] uint8 -> (intersect, union) [B, C]."""
    masks = resize_bilinear(probs, ann.shape[1:3], align_corners=True)
    if pos_th == -1:
        pred = jax.nn.one_hot(jnp.argmax(masks, axis=-1), masks.shape[-1], dtype=jnp.bool_)
    else:
        pred = masks > pos_th
    valid = (ann != 128)[..., None]
    fg = (ann == 255)[..., None]
    pred = pred & valid
    fg = fg & valid
    intersect = jnp.sum(pred & fg, axis=(1, 2), dtype=jnp.int32)
    union = (
        jnp.sum(pred, axis=(1, 2), dtype=jnp.int32)
        + jnp.sum(fg, axis=(1, 2), dtype=jnp.int32)
        - intersect
    )
    return intersect, union


def make_iou_fn(pos_th: float):
    return jax.jit(functools.partial(iou_counts, pos_th=pos_th))
