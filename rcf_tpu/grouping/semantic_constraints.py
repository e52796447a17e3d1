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


def _resolve_crf_engine(engine: str) -> str:
    """auto -> native when the C++ lattice builds, else attention."""
    if engine != "auto":
        return engine
    from ..ops import crf_native

    return "native" if crf_native.available() else "attention"


def _crf_pass(rgb_u8: np.ndarray, mask01, params: CRFParams, chunk: int,
              engine: str) -> np.ndarray:
    """One full-resolution dense-CRF refinement with the chosen engine.

    ``native`` (default via auto): the from-scratch C++ permutohedral
    lattice — O(N) on the host, measured 0.9 s/pass at 480x854 x 50 iters
    on one core vs ~15 s for the exact O(N^2) attention engine on a v5e
    chip at this resolution (and it leaves the chip free for DINO/NCut).
    ``attention``: the exact chunked-attention mean field on device; the
    two engines cross-validate >97% MAP agreement (tests/test_crf_native.py).
    """
    if engine == "native":
        from ..ops.crf_native import crf_soft_native

        return crf_soft_native(
            np.asarray(rgb_u8), np.asarray(mask01, np.float32),
            srgb=params.srgb, scomp=params.scomp, sxy=params.sxy,
            scomp_smooth=params.scomp_smooth, sxy_smooth=params.sxy_smooth,
            refine_iters=params.refine_iters, crf_scale=params.crf_scale)
    return np.asarray(crf_soft_single(jnp.asarray(rgb_u8), jnp.asarray(mask01),
                                      params, chunk))


def refine_frame(dino: DinoFeatures, img01: np.ndarray, mask: np.ndarray,
                 umi_th: float | None, crf_chunk: int = 1024,
                 crf_engine: str = "auto") -> np.ndarray:
    from ..ops.resize import resize_bilinear

    engine = _resolve_crf_engine(crf_engine)
    rgb_u8 = np.clip(img01 * 255.0, 0, 255).astype(np.uint8)
    if mask.shape != img01.shape[:2]:
        # Masks are loaded at the 480p export resolution; align to the image
        # (equal on real DAVIS; robust for other frame sizes).
        mask = np.asarray(resize_bilinear(jnp.asarray(mask)[None, ..., None],
                                          img01.shape[:2])[0, ..., 0])
    params_single = CRFParams(crf_scale=0.7)
    params_after_ncut = CRFParams(crf_scale=0.5)

    crf_mask = _crf_pass(rgb_u8, mask, params_single, crf_chunk, engine)

    feats = dino(img01[None])[0]
    grid_mask = dino.mask_to_grid(mask)
    refined_grid = ncut_refine(feats, grid_mask)
    refined_full = resize_bilinear(refined_grid[None, ..., None], img01.shape[:2])[0, ..., 0]
    ncut_crf_mask = _crf_pass(rgb_u8, refined_full, params_after_ncut, crf_chunk, engine)

    crf_np = np.asarray(crf_mask)
    ncut_np = np.asarray(ncut_crf_mask)
    b = ncut_np > 0.5
    if not b.any() or b.all():
        # Degenerate NCut pass (empty/full mask — broken features or
        # checkpoint): merging by product would zero or no-op the PL.
        # Keep the CRF-only refinement, as the reference's umi guard does
        # when the two masks "likely capture different things".
        logger.warning("NCut-refined mask degenerate; keeping CRF-only PL")
        return crf_np
    if umi_th is not None:
        a = crf_np > 0.5
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
    parser.add_argument("--crf-engine", choices=["auto", "native", "attention"],
                        default="auto",
                        help="dense-CRF engine for the two refinement passes "
                             "(auto: C++ permutohedral lattice when it builds; "
                             "see _crf_pass for the measured trade-off)")
    parser.add_argument("--val-only", action="store_true",
                        help="refine validation sequences only (default: all)")
    args = parser.parse_args(argv)
    set_loglevel(True)
    from ..utils.platform import apply_platform_env

    apply_platform_env()

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

    engine = _resolve_crf_engine(args.crf_engine)
    logger.info(f"CRF engine: {engine}")
    dino = DinoFeatures(checkpoint=args.dino_checkpoint)
    for seq in seqs:
        for frame_path in sorted(glob(os.path.join(images_dir, seq, "*.jpg"))):
            frame = os.path.splitext(os.path.basename(frame_path))[0]
            img01 = load_image(images_dir, seq, frame)
            mask = load_pred_mask(pred_dir, args.object_channel, seq, frame, step=0)
            refined = refine_frame(dino, img01, mask, umi_th, crf_engine=engine)
            out_path = os.path.join(out_dir, f"pred_seg_{seq}_{frame}_0000000.png")
            assert not os.path.exists(out_path), f"refusing to overwrite {out_path}"
            Image.fromarray((refined * 255.0).astype(np.uint8)).convert("L").save(out_path)
        logger.info(f"refined sequence {seq}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
