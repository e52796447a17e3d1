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

from ..nn.dino_vit import import_dino_torch, vit_base, vit_small
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
            factory = vit_small if self.arch == "vit_small" else vit_base
            self.model = factory(patch_size=self.patch_size)
            logger.warning(
                "No DINO checkpoint available — using random ViT weights "
                "(set DINO_CHECKPOINT for real runs)"
            )
            dummy = jnp.zeros((1, self.patch_size * 2, self.patch_size * 2, 3))
            self.params = self.model.init(jax.random.PRNGKey(0), dummy)["params"]
        self.grid_hw = (
            self.resize_imgs_size[0] // self.patch_size,
            self.resize_imgs_size[1] // self.patch_size,
        )
        self._feats_fn = jax.jit(
            lambda imgs: self.model.apply({"params": self.params}, imgs, return_last_k=True)
        )

    def __call__(self, imgs01: np.ndarray) -> jnp.ndarray:
        """imgs01: [B, H, W, 3] float RGB in [0,1] -> key feats [B, N+1, D]."""
        x = (imgs01 - IMAGENET_MEAN) / IMAGENET_STD
        x = resize_bilinear(jnp.asarray(x), self.resize_imgs_size)
        return self._feats_fn(x)

    def mask_to_grid(self, mask: np.ndarray) -> jnp.ndarray:
        """[H, W] -> nearest-resized mask at the feature grid."""
        return resize_nearest(jnp.asarray(mask)[None, ..., None], self.grid_hw)[0, ..., 0]
