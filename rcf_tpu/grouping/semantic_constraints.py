"""Stage-2.2 pseudo-label factory: CRF -> NCut refinement -> CRF -> merge.

Parity with `tools/SemanticConstraintsAndMAA/semantic_constraints.py`:
per exported frame of the chosen object channel,

1. dense-CRF refine the raw mask (crf_scale=0.7)               (`:306-309`)
2. 10-step Adam NCut refinement against DINO affinities
   (lr 0.45, clamp [0,1])                                      (`:41-75,311`)
3. dense-CRF the NCut-refined mask (crf_scale=0.5)             (`:312-313`)
4. merge = product of (1) and (3); on FBMS59, keep (1) alone when the
   union-minus-intersection of their binarizations exceeds umi_th=10000
   ("likely captures different things")                        (`:315-325`)

Pseudo-labels land in ``<export>_torchcrf_ncut_torchcrf/<channel>/`` with
the same ``pred_seg_{seq}_{frame}_0000000.png`` names, which is exactly
what `dataset/data.py:135-145` (our `data/dataset.py`) reads back for the
stage-2.2 PL loss.

Usage:
  python -m rcf_tpu.grouping.semantic_constraints \
      --pretrain_dir saved/saved_rcf_stage2.1 --dataset davis --object-channel N
"""

from __future__ import annotations

import argparse
import os
from glob import glob

import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..ops.crf import CRFParams, crf_soft_single
from ..utils import get_logger, set_loglevel
from .maa import IMG_SIZE, load_image, load_pred_mask
from .ncut import ncut_refine
from .pipeline import DATA_ROOTS, VAL_SEQS, DinoFeatures

logger = get_logger()

SAVE_SUFFIX = "_torchcrf_ncut_torchcrf"
EXPORT_DIR_BY_DATASET = {
    "davis": "saved_eval_export_trainval_ema",
    "stv2": "saved_eval_export_ema",
    "fbms59": "saved_eval_export_trainval_ema",
}


def refine_frame(dino: DinoFeatures, img01: np.ndarray, mask: np.ndarray,
                 umi_th: float | None, crf_chunk: int = 1024) -> np.ndarray:
    from ..ops.resize import resize_bilinear

    rgb_u8 = np.clip(img01 * 255.0, 0, 255).astype(np.uint8)
    if mask.shape != img01.shape[:2]:
        # Masks are loaded at the 480p export resolution; align to the image
        # (equal on real DAVIS; robust for other frame sizes).
        mask = np.asarray(resize_bilinear(jnp.asarray(mask)[None, ..., None],
                                          img01.shape[:2])[0, ..., 0])
    params_single = CRFParams(crf_scale=0.7)
    params_after_ncut = CRFParams(crf_scale=0.5)

    crf_mask = crf_soft_single(jnp.asarray(rgb_u8), jnp.asarray(mask), params_single, crf_chunk)

    feats = dino(img01[None])[0]
    grid_mask = dino.mask_to_grid(mask)
    refined_grid = ncut_refine(feats, grid_mask)
    refined_full = resize_bilinear(refined_grid[None, ..., None], img01.shape[:2])[0, ..., 0]
    ncut_crf_mask = crf_soft_single(jnp.asarray(rgb_u8), refined_full, params_after_ncut, crf_chunk)

    crf_np = np.asarray(crf_mask)
    ncut_np = np.asarray(ncut_crf_mask)
    if umi_th is not None:
        a, b = crf_np > 0.5, ncut_np > 0.5
        umi = float(np.sum(a | b) - np.sum(a & b))
        if umi > umi_th:
            return crf_np  # likely capture different things: skip the merge
    return crf_np * ncut_np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Generate semantic-constraint pseudo-labels")
    parser.add_argument("--pretrain_dir", type=str, required=True)
    parser.add_argument("--object-channel", type=int, required=True)
    parser.add_argument("--dataset", type=str, default="davis", choices=list(VAL_SEQS))
    parser.add_argument("--data-dir", type=str, default="data")
    parser.add_argument("--export-dir-name", type=str, default=None)
    parser.add_argument("--dino-checkpoint", type=str, default=None)
    parser.add_argument("--val-only", action="store_true",
                        help="refine validation sequences only (default: all)")
    args = parser.parse_args(argv)
    set_loglevel(True)

    export_dir_name = args.export_dir_name or EXPORT_DIR_BY_DATASET[args.dataset]
    data_root, images_sub = DATA_ROOTS[args.dataset]
    data_root = os.path.join(args.data_dir, os.path.basename(data_root))
    images_dir = os.path.join(data_root, images_sub)
    pred_dir = os.path.join(args.pretrain_dir, export_dir_name)
    umi_th = 10000 if args.dataset == "fbms59" else None

    seqs = sorted(s for s in os.listdir(images_dir) if not s.startswith("."))
    if args.val_only:
        seqs = VAL_SEQS[args.dataset]

    out_dir = os.path.join(
        args.pretrain_dir, export_dir_name + SAVE_SUFFIX, str(args.object_channel)
    )
    os.makedirs(out_dir, exist_ok=True)
    logger.info(f"Start refinement: {out_dir}")

    dino = DinoFeatures(checkpoint=args.dino_checkpoint)
    for seq in seqs:
        for frame_path in sorted(glob(os.path.join(images_dir, seq, "*.jpg"))):
            frame = os.path.splitext(os.path.basename(frame_path))[0]
            img01 = load_image(images_dir, seq, frame)
            mask = load_pred_mask(pred_dir, args.object_channel, seq, frame, step=0)
            refined = refine_frame(dino, img01, mask, umi_th)
            out_path = os.path.join(out_dir, f"pred_seg_{seq}_{frame}_0000000.png")
            assert not os.path.exists(out_path), f"refusing to overwrite {out_path}"
            Image.fromarray((refined * 255.0).astype(np.uint8)).convert("L").save(out_path)
        logger.info(f"refined sequence {seq}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
