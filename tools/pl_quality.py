"""Measure pseudo-label quality: IoU of sc-stage PLs against GT annotations.

The semantic-constraints stage (rcf_tpu/grouping/semantic_constraints.py,
mirroring reference tools/semantic_constraint/*.py) emits the stage-2.2
training targets as `pred_seg_<seq>_<frame>_0000000.png` binary masks. Their
IoU against the GT annotations is the discriminating INTERMEDIATE for any
stage-2 A/B: stage 2.2 trains against these masks, so final-metric movement
is bounded by how much better (or worse) they are than the stage-1 model
itself. Round 3 measured 0.973 mean IoU ad hoc on the easy synthetic set;
this tool makes the measurement a first-class, repeatable pipeline step.

Synthetic/DAVIS-2016 single-object contract: binary 0/255 masks both sides.

Usage:
  python tools/pl_quality.py --pl-dir <stage21>/saved_..._torchcrf/<ch> \
      --data-dir <work>/data/data_davis
Prints one JSON line: {"pl_iou_mean": ..., "pl_iou_min": ..., "per_seq": {...}}
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np
from PIL import Image

_PL_RE = re.compile(r"pred_seg_(.+)_(\d+)_\d+\.png$")


def frame_iou(pl: np.ndarray, gt: np.ndarray) -> float:
    a, b = pl > 127, gt > 127
    union = np.logical_or(a, b).sum()
    if union == 0:  # both empty: perfect agreement by convention
        return 1.0
    return float(np.logical_and(a, b).sum() / union)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pl-dir", required=True,
                    help="directory of pred_seg_<seq>_<frame>_*.png pseudo-labels")
    ap.add_argument("--data-dir", required=True,
                    help="DAVIS-layout root containing Annotations/480p/<seq>/")
    args = ap.parse_args()

    per_seq: dict[str, list[float]] = defaultdict(list)
    n_missing = 0
    for name in sorted(os.listdir(args.pl_dir)):
        m = _PL_RE.match(name)
        if not m:
            continue
        seq, frame = m.group(1), int(m.group(2))
        gt_path = os.path.join(args.data_dir, "Annotations", "480p", seq,
                               f"{frame:05d}.png")
        if not os.path.exists(gt_path):
            n_missing += 1
            continue
        pl = np.asarray(Image.open(os.path.join(args.pl_dir, name)).convert("L"))
        gt = np.asarray(Image.open(gt_path).convert("L"))
        if pl.shape != gt.shape:  # PLs are emitted at source resolution; guard anyway
            pl = np.asarray(Image.fromarray(pl).resize(gt.shape[::-1], Image.NEAREST))
        per_seq[seq].append(frame_iou(pl, gt))

    if not per_seq:
        print(json.dumps({"error": "no matching pseudo-labels found"}))
        return 1
    all_ious = [v for vals in per_seq.values() for v in vals]
    result = {
        "pl_iou_mean": round(float(np.mean(all_ious)), 4),
        "pl_iou_min": round(float(np.min(all_ious)), 4),
        "n_frames": len(all_ious),
        "per_seq": {s: round(float(np.mean(v)), 4) for s, v in sorted(per_seq.items())},
    }
    if n_missing:
        result["n_missing_gt"] = n_missing
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
