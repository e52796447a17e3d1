"""Build a synthetic DAVIS-contract dataset for end-to-end pipeline runs.

Real DAVIS/STv2/FBMS frames are not redistributable with this repo (and not
present in the build image), so quality regression runs use this generator:
textured moving squares over a textured background at the real 480x854
resolution, with piecewise-constant ground-truth flow written in the exact
reference data contract (`/root/reference` `dataset/data.py:117-133`):

  JPEGImages/480p/<seq>/%05d.jpg     RGB frames
  Flows_NewCT/480p/<seq>/%05d.npy    forward flow, file i = frames (i-1, i)
  BackwardFlows_NewCT/480p/<seq>/... backward flow
  Annotations/480p/<seq>/%05d.png    GT masks (eval only)
  trainval.txt / val.txt             split files ("<dir>/ frame.jpg ...")

The motion is exactly the relaxed-common-fate signal (constant flow per
object), so stage-1 training should drive mIoU -> ~95 within tens of
epochs; see RESULTS.md for measured numbers.

Usage: python tools/make_synthetic_davis.py --out /tmp/synth_davis \
          [--seqs 3] [--frames 40] [--height 480] [--width 854]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def _texture(rng: np.random.Generator, h: int, w: int, base: np.ndarray) -> np.ndarray:
    """Smooth colored noise texture around a base color."""
    noise = rng.standard_normal((h // 8 + 2, w // 8 + 2, 3))
    img = np.asarray(Image.fromarray(
        ((noise - noise.min()) / (np.ptp(noise) + 1e-9) * 255).astype(np.uint8)
    ).resize((w, h), Image.BILINEAR), dtype=np.float32)
    return np.clip(0.6 * img + 0.4 * base[None, None], 0, 255)


def make_sequence(root: str, seq: str, n_frames: int, h: int, w: int,
                  rng: np.random.Generator) -> None:
    dirs = {k: os.path.join(root, k, "480p", seq) for k in
            ("JPEGImages", "Annotations", "Flows_NewCT", "BackwardFlows_NewCT")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    bg = _texture(rng, h, w, rng.uniform(40, 120, 3))
    size = int(rng.integers(min(h, w) // 5, min(h, w) // 3))
    fg = _texture(rng, size, size, rng.uniform(150, 240, 3))
    # Constant per-sequence object velocity (the common-fate signal) plus a
    # small constant background drift.
    v_obj = rng.uniform(-6, 6, 2)
    v_bg = rng.uniform(-1.5, 1.5, 2)
    pos0 = np.array([rng.uniform(0, h - size), rng.uniform(0, w - size)])

    def frame_at(t: int):
        # wrap the object inside the frame
        span = np.array([h - size, w - size], np.float64)
        pos = pos0 + v_obj * t
        pos = np.abs((pos % (2 * span)) - span) * np.sign(span)  # reflect
        y, x = int(round(pos[0])), int(round(pos[1]))
        img = np.roll(bg, (int(v_bg[0] * t), int(v_bg[1] * t)), axis=(0, 1)).copy()
        img[y : y + size, x : x + size] = fg
        mask = np.zeros((h, w), np.uint8)
        mask[y : y + size, x : x + size] = 255
        return img, mask, np.array([y, x])

    prev = None
    for t in range(n_frames):
        img, mask, yx = frame_at(t)
        Image.fromarray(img.astype(np.uint8)).save(
            os.path.join(dirs["JPEGImages"], f"{t:05d}.jpg"), quality=95)
        Image.fromarray(mask).save(os.path.join(dirs["Annotations"], f"{t:05d}.png"))
        if prev is not None:
            p_img, p_mask, p_yx = prev
            d = (yx - p_yx).astype(np.float32)
            # flow file t relates frames (t-1, t): forward = where each
            # pixel of t-1 moves to (u=x, v=y), piecewise constant.
            fw = np.zeros((h, w, 2), np.float32)
            fw[..., 0] = v_bg[1]
            fw[..., 1] = v_bg[0]
            fw[p_mask > 0] = (d[1], d[0])
            bw = np.zeros((h, w, 2), np.float32)
            bw[..., 0] = -v_bg[1]
            bw[..., 1] = -v_bg[0]
            bw[mask > 0] = (-d[1], -d[0])
            np.save(os.path.join(dirs["Flows_NewCT"], f"{t:05d}.npy"), fw)
            np.save(os.path.join(dirs["BackwardFlows_NewCT"], f"{t:05d}.npy"), bw)
        prev = (img, mask, yx)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--seqs", type=int, default=3)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=854)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    names = [f"seq{i}" for i in range(args.seqs)]
    for s in names:
        make_sequence(args.out, s, args.frames, args.height, args.width, rng)
    frames = " ".join(f"{i:05d}.jpg" for i in range(args.frames))
    with open(os.path.join(args.out, "trainval.txt"), "w") as f:
        for s in names:
            f.write(f"JPEGImages/480p/{s}/ {frames}\n")
    with open(os.path.join(args.out, "val.txt"), "w") as f:
        f.write(f"JPEGImages/480p/{names[-1]}/ {frames}\n")
    # DAVIS evaluator contract
    os.makedirs(os.path.join(args.out, "ImageSets/2016"), exist_ok=True)
    with open(os.path.join(args.out, "ImageSets/2016/val.txt"), "w") as f:
        f.write(names[-1] + "\n")
    print(f"wrote {args.seqs} sequences x {args.frames} frames to {args.out}")


if __name__ == "__main__":
    main()
