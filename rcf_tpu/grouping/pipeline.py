"""Shared plumbing for the visual-grouping tools (MAA + semantic constraints).

Covers the reference's NCutEvalHead / NCutHead feature path
(`tools/SemanticConstraintsAndMAA/maa.py:39-139`,
`semantic_constraints.py:78-190`): images resized to (480, 856) bilinear,
DINO ViT-S/8 last-attention key features, masks nearest-resized to the
60x107 feature grid.

DINO weights cannot be fetched in a zero-egress environment; pass a local
checkpoint path (torch format, the official
``dino_deitsmall8_300ep_pretrain.pth``) via ``--dino-checkpoint`` or
``DINO_CHECKPOINT``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import resize_bilinear, resize_nearest
from ..utils import get_logger

logger = get_logger()

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

VAL_SEQS = {
    "davis": [
        "blackswan", "bmx-trees", "breakdance", "camel", "car-roundabout",
        "car-shadow", "cows", "dance-twirl", "dog", "drift-chicane",
        "drift-straight", "goat", "horsejump-high", "kite-surf", "libby",
        "motocross-jump", "paragliding-launch", "parkour", "scooter-black", "soapbox",
    ],
    "stv2": [
        "bird_of_paradise", "birdfall", "bmx", "cheetah", "drift", "frog", "girl",
        "hummingbird", "monkey", "monkeydog", "parachute", "penguin", "soldier", "worm",
    ],
    "fbms59": [
        "camel01", "cars1", "cars10", "cars4", "cars5", "cats01", "cats03", "cats06",
        "dogs01", "dogs02", "farm01", "giraffes01", "goats01", "horses02", "horses04",
        "horses05", "lion01", "marple12", "marple2", "marple4", "marple6", "marple7",
        "marple9", "people03", "people1", "people2", "rabbits02", "rabbits03",
        "rabbits04", "tennis",
    ],
}

DATA_ROOTS = {
    "davis": ("data/data_davis", "JPEGImages/480p"),
    "stv2": ("data/data_SegTrackv2_resized", "JPEGImages"),
    "fbms59": ("data/data_fbms59_resized", "JPEGImages"),
}


@dataclass
class DinoFeatures:
    """DINO ViT last-attention key features for (480, 856)-resized frames."""

    checkpoint: str | None = None
    arch: str = "vit_small"
    patch_size: int = 8
    resize_imgs_size: tuple[int, int] = (480, 856)
    params: dict = field(init=False, default=None)

    def __post_init__(self):
        from ..nn.dino_vit import get_dino_model

        ckpt_path = self.checkpoint or os.environ.get("DINO_CHECKPOINT")
        if ckpt_path and os.path.exists(ckpt_path):
            # arch registry covers DINO/MoCo-v3/MAE checkpoint formats
            # (reference get_dino_model, models/dino_vit.py:448-520).
            self.model, self.params = get_dino_model(
                self.arch, self.patch_size, checkpoint_path=ckpt_path)
            logger.info(f"Loaded {self.arch} weights from {ckpt_path}")
        else:
            # No weights reachable: hand-crafted patch features (frame-centered
            # mean RGB per patch) instead of a RANDOM ViT. Random keys give an
            # uninformative affinity, the NCut-refined mask collapses, and the
            # sc merge product zeroes every pseudo-label; centered color gives
            # the cosine-threshold affinity (tau=0.2) real grouping signal on
            # color-separable content, keeping the no-checkpoint pipeline
            # meaningful end to end. Real runs set DINO_CHECKPOINT.
            self.model = None
            logger.warning(
                "No DINO checkpoint available — using hand-crafted color patch "
                "features (set DINO_CHECKPOINT for real runs)"
            )
        self.grid_hw = (
            self.resize_imgs_size[0] // self.patch_size,
            self.resize_imgs_size[1] // self.patch_size,
        )
        if self.model is not None:
            self._feats_fn = jax.jit(
                lambda imgs: self.model.apply({"params": self.params}, imgs, return_last_k=True)
            )
        else:
            gh, gw = self.grid_hw

            def _color_feats(imgs):
                b = imgs.shape[0]
                p = self.patch_size
                x = imgs.reshape(b, gh, p, gw, p, 3).mean(axis=(2, 4))  # [B,gh,gw,3]
                x = x.reshape(b, gh * gw, 3)
                x = x - x.mean(axis=1, keepdims=True)  # center: distinct colors -> cos<tau
                cls = jnp.ones((b, 1, 3), x.dtype)  # dummy CLS row (ncut uses feats[1:])
                return jnp.concatenate([cls, x], axis=1)

            self._feats_fn = jax.jit(_color_feats)

    def __call__(self, imgs01: np.ndarray) -> jnp.ndarray:
        """imgs01: [B, H, W, 3] float RGB in [0,1] -> key feats [B, N+1, D]."""
        x = jnp.asarray(imgs01)
        if self.model is not None:
            x = (x - IMAGENET_MEAN) / IMAGENET_STD
        x = resize_bilinear(x, self.resize_imgs_size)
        return self._feats_fn(x)

    def mask_to_grid(self, mask: np.ndarray) -> jnp.ndarray:
        """[H, W] -> nearest-resized mask at the feature grid."""
        return resize_nearest(jnp.asarray(mask)[None, ..., None], self.grid_hw)[0, ..., 0]
