"""Validate the CRF MAP-stability early-out (CRFParams.stable_exit).

The reference runs a FIXED 50 mean-field iterations
(`/root/reference/tools/torchCRF/src/torchcrf.cu:140`); the consumed output
is the binary MAP. Every iteration recomputes the exp of all N^2 attention
logits on the VPU — the dominant stage-2.1 in-training CRF cost — so
stopping once the MAP labeling stops changing is a large win IF the MAP
after early-out equals the MAP after 50 iterations.

This script measures exactly that, on the same content battery as
tools/validate_crf_resolution.py (384^2 crops of the one real photo in the
image with 2-means soft masks, plus synthetic DAVIS-style frames), at the
shipped 96^2 in-training grid and at 192^2:

  * MAP agreement: fraction of pixels where stable-exit == fixed-50;
  * iterations actually used by the early-out per image.

Runs on CPU or TPU. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.validate_crf_resolution import (IMAGENET_MEAN, IMAGENET_STD,
                                           _real_crops, _soft_mask_from_colors,
                                           _synthetic_frames)


def main() -> None:
    import jax
    import jax.numpy as jnp

    if os.environ.get("RCF_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["RCF_PLATFORM"])

    from rcf_tpu.ops.crf import CRFParams, crf_soft_single
    from rcf_tpu.ops.resize import resize_bilinear

    cases = []
    for rgb in _real_crops():
        cases.append(("real", rgb, _soft_mask_from_colors(rgb)))
    for rgb, mask in _synthetic_frames():
        cases.append(("synthetic", rgb, mask))

    grids = tuple(int(g) for g in os.environ.get("RCF_SE_GRIDS", "96,192").split(","))
    out = {"cap_iters": 50}
    for grid in grids:
        agreements: dict = {"real": [], "synthetic": []}
        iters_used: list[int] = []
        for kind, rgb, mask in cases:
            rgb_run = np.asarray(resize_bilinear(
                jnp.asarray(rgb[None] * 255.0), (grid, grid))[0])
            rgb_u8 = jnp.asarray(np.clip(rgb_run, 0, 255).astype(np.uint8))
            m = jnp.asarray(np.asarray(resize_bilinear(
                jnp.asarray(mask[None, ..., None]), (grid, grid))[0, ..., 0]))
            xy_scale = (grid / rgb.shape[1], grid / rgb.shape[0])
            fixed = crf_soft_single(rgb_u8, m, CRFParams(stable_exit=False),
                                    chunk=1024, xy_scale=xy_scale)
            early, iters = crf_soft_single(rgb_u8, m, CRFParams(stable_exit=True),
                                           chunk=1024, xy_scale=xy_scale,
                                           return_iters=True)
            agree = float(np.mean(np.asarray(fixed) == np.asarray(early)))
            agreements[kind].append(agree)
            iters_used.append(int(iters))
            print(f"[crf-se] grid={grid} {kind}: agreement {agree:.4f}, "
                  f"early-out after {int(iters)} iters", file=sys.stderr, flush=True)
        for kind, vals in agreements.items():
            out[f"g{grid}_{kind}_agree_mean"] = round(float(np.mean(vals)), 4)
            out[f"g{grid}_{kind}_agree_min"] = round(float(np.min(vals)), 4)
        out[f"g{grid}_iters_mean"] = round(float(np.mean(iters_used)), 1)
        out[f"g{grid}_iters_max"] = int(np.max(iters_used))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
