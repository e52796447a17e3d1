"""Validate the in-training CRF `resolution` knob at the REAL ratio.

The reference runs the stage-2.1 mean field at the full 384^2 crop
(`/root/reference/models/crf_head.py:93-109`); our recipe default runs it
at the 96^2 grid where the target is consumed (PARITY.md deviation 3).
This script measures full-384^2 vs 192^2 vs 96^2 targets — all compared at
the consumed 96^2 mask grid — on:

  * real photographic content: 384^2 crops of the one real photo in the
    image (`/root/reference/assets/fig_heading.png`), with soft masks from
    a 2-means color split blurred to CNN-like softness;
  * synthetic DAVIS-contract frames (textured moving square).

Run on the TPU (full 384^2 exact attention = 147k^2 pairs x 50 iters).
Prints one JSON line with per-content agreement stats.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
FIG = "/root/reference/assets/fig_heading.png"


def _soft_mask_from_colors(rgb01: np.ndarray, iters: int = 8) -> np.ndarray:
    """2-means color split -> blurred soft mask (CNN-like softness)."""
    px = rgb01.reshape(-1, 3)
    rng = np.random.default_rng(0)
    centers = px[rng.choice(len(px), 2, replace=False)]
    for _ in range(iters):
        d = ((px[:, None] - centers[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        for k in range(2):
            sel = px[assign == k]
            if len(sel):
                centers[k] = sel.mean(0)
    d = ((px[:, None] - centers[None]) ** 2).sum(-1)
    logits = (d[:, 0] - d[:, 1]) / 0.02
    mask = 1.0 / (1.0 + np.exp(-logits))
    mask = mask.reshape(rgb01.shape[:2])
    # separable box blur x3 ~ gaussian; softens edges like a 96->384 upsample
    for _ in range(3):
        k = np.ones(9) / 9.0
        mask = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, mask)
        mask = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, mask)
    # foreground = minority region, like an object mask
    if mask.mean() > 0.5:
        mask = 1.0 - mask
    return mask.astype(np.float32)


def _real_crops(n: int = 3, hw: int = 384):
    from PIL import Image

    im = np.asarray(Image.open(FIG).convert("RGB"), np.float32) / 255.0
    h, w = im.shape[:2]
    rng = np.random.default_rng(1)
    crops = []
    for _ in range(n):
        y = int(rng.integers(0, h - hw + 1))
        x = int(rng.integers(0, w - hw + 1))
        crops.append(im[y:y + hw, x:x + hw])
    return crops


def _synthetic_frames(n: int = 2, hw: int = 384):
    rng = np.random.default_rng(2)
    frames = []
    for _ in range(n):
        bg = rng.random((hw, hw, 3)).astype(np.float32) * 0.3 + 0.1
        img = bg.copy()
        y, x, s = rng.integers(40, hw - 160), rng.integers(40, hw - 160), 120
        img[y:y + s, x:x + s] = rng.random((s, s, 3)).astype(np.float32) * 0.4 + 0.55
        mask = np.zeros((hw, hw), np.float32)
        mask[y:y + s, x:x + s] = 0.9
        frames.append((img, np.clip(mask + rng.normal(0, 0.05, mask.shape), 0, 1).astype(np.float32)))
    return frames


def main() -> None:
    import jax.numpy as jnp

    from rcf_tpu.ops.crf import make_crf_fn
    from rcf_tpu.ops.resize import resize_bilinear

    cases = []
    for rgb in _real_crops():
        cases.append(("real", rgb, _soft_mask_from_colors(rgb)))
    for rgb, mask in _synthetic_frames():
        cases.append(("synthetic", rgb, mask))

    resolutions = {"full384": None, "r192": (192, 192), "r96": (96, 96)}
    out = {"consumed_grid": 96, "tolerance": 0.25, "iters": 50}
    agreements: dict = {"real": {}, "synthetic": {}}
    for kind, rgb, mask in cases:
        imgs = ((rgb - IMAGENET_MEAN) / IMAGENET_STD)[None]
        targets = {}
        for name, res in resolutions.items():
            fn = make_crf_fn(resolution=res, chunk=1024)
            t = fn(jnp.asarray(imgs), jnp.asarray(mask[None]))
            targets[name] = np.asarray(
                resize_bilinear(t[..., None], (96, 96))[..., 0])
        for name in ("r192", "r96"):
            agree = float(np.mean(np.abs(targets[name] - targets["full384"]) < 0.25))
            agreements[kind].setdefault(name, []).append(round(agree, 4))
            print(f"[crf-res] {kind}: {name} vs full384 agreement {agree:.4f}",
                  file=sys.stderr, flush=True)
    for kind in agreements:
        for name, vals in agreements[kind].items():
            out[f"{kind}_{name}_mean"] = round(float(np.mean(vals)), 4)
            out[f"{kind}_{name}_min"] = round(float(np.min(vals)), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
