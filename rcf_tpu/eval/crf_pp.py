"""Eval-time dense-CRF post-processing (replaces tools/pydenseCRF/*).

The reference refines exported masks with CPU pydensecrf fanned out over
32 OS processes (`tools/pydenseCRF/crf.py`, `crf_parallel.sh`). Here the
same mean field runs batched on the TPU via `ops/crf.py`.

Parity notes (`crf.py:58-89,160-190`):
* mask scaled by 1/0.8 (i.e. crf_scale=0.8), bilateral kernel sxy=60,
  srgb=5, compat=5, 50 iterations, full 480p resolution;
* the reference's `gaussian_filter(sigma=0.1)` on the unary is a no-op at
  uint8 precision and is omitted;
* for binary labels, pydensecrf's "-w * (message of the other label)"
  update equals torchCRF's "+w * (own message)" under the normalized
  filter (softmax shift invariance), so one engine serves both.
* output masks land in `<annotation_dir>_crf/` with unchanged names.

CLI:
  python -m rcf_tpu.eval.crf_pp --input data/data_davis/JPEGImages/480p \
      --annotation-dir <export>/<channel> [--step 0] [--batch 8]
"""

from __future__ import annotations

import argparse
import os
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..ops.crf import CRFParams, crf_soft_single
from ..utils import get_logger, set_loglevel

logger = get_logger()


def run(input_dir: str, annotation_dir: str, step: int = 0, seq: str = "*",
        allow_skip: bool = False, batch: int = 8, chunk: int = 1024,
        crf_scale: float = 0.8, iters: int = 50) -> str:
    params = CRFParams(crf_scale=crf_scale, refine_iters=iters)
    out_dir = annotation_dir.rstrip("/") + "_crf"
    os.makedirs(out_dir, exist_ok=True)

    crf_batched = jax.jit(
        jax.vmap(lambda im, mk: crf_soft_single(im, mk, params, chunk))
    )

    paths = sorted(glob(os.path.join(input_dir, seq, "*.jpg")))
    pending: list[tuple[np.ndarray, np.ndarray, str]] = []
    skipped = 0

    def flush():
        if not pending:
            return
        imgs = jnp.asarray(np.stack([p[0] for p in pending]))
        masks = jnp.asarray(np.stack([p[1] for p in pending]))
        refined = np.asarray(crf_batched(imgs, masks))
        for out, (_, _, save_path) in zip(refined, pending):
            Image.fromarray((out * 255.0).astype(np.uint8)).convert("L").save(save_path)
        pending.clear()

    group_shape = None
    for path in paths:
        scene, frame = path.split("/")[-2:]
        ann_path = os.path.join(annotation_dir, f"pred_seg_{scene}_{frame[:-4]}_{step:07}.png")
        if not os.path.exists(ann_path):
            assert allow_skip, f"{ann_path} missing"
            skipped += 1
            continue
        img = np.asarray(Image.open(path).convert("RGB"))
        mask = np.asarray(Image.open(ann_path).resize((img.shape[1], img.shape[0])))
        if mask.ndim == 3:
            mask = mask[..., 0]
        # crf.py:169: scale the 0-255 mask by 1/0.8 before unary construction;
        # ops/crf.py re-applies 255/crf_scale on a 0-1 mask, so hand it 0-1.
        mask01 = mask.astype(np.float32) / 255.0
        save_path = os.path.join(out_dir, os.path.basename(ann_path))
        if group_shape is not None and img.shape != group_shape:
            flush()
        group_shape = img.shape
        pending.append((img, mask01, save_path))
        if len(pending) == batch:
            flush()
    flush()
    if skipped:
        logger.info(f"Skipped {skipped} frames without exported masks")
    return out_dir


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Batched dense-CRF post-processing")
    parser.add_argument("--input", type=str, required=True, help="JPEGImages directory")
    parser.add_argument("--annotation-dir", type=str, required=True, help="exported masks dir")
    parser.add_argument("--step", type=int, default=0)
    parser.add_argument("--seq", type=str, default="*")
    parser.add_argument("--allow_skip", action="store_true")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--chunk", type=int, default=1024)
    args = parser.parse_args(argv)
    set_loglevel(True)
    out = run(args.input, args.annotation_dir, args.step, args.seq, args.allow_skip,
              args.batch, args.chunk)
    logger.info(f"Refined masks written to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
