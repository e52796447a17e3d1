"""DAVIS16 benchmark evaluator: J (region) & F (boundary) with Hungarian
matching for the unsupervised task.

Parity with the reference's vendored `tools/davis2016-evaluation/`:

* mask reading: ``pred_seg_{seq}_{frame}_{step:07}.png`` resized bilinearly
  to 854x480 and binarized at ``> 256 * 0.35`` (`davis2017/results.py:8-48`);
* J = Jaccard with union==0 treated as 1 (`davis2017/metrics.py:6-37`);
* F = boundary F-measure via 1-px boundary maps dilated by a disk of radius
  ``ceil(0.008 * diag)`` (`davis2017/metrics.py:40-119,125-178`);
* unsupervised task: proposals are assigned to GT objects with the
  Hungarian algorithm on mean (J+F)/2 (`davis2017/evaluation.py:48-68`);
* statistics: mean / recall(>0.5) / decay over 4 bins
  (`davis2017/utils.py:135-157`), plus the frame-weighted ``J-FrameMean``
  (`evaluation_method.py:49-60`).

CLI mirror of `evaluation_method.py`:
  python -m rcf_tpu.eval.davis --davis_path data/data_davis \
      --results_path <export>/0 [--set val] [--year 2016] [--step 0]
"""

from __future__ import annotations

import argparse
import math
import os
import warnings
from glob import glob

import cv2
import numpy as np
from PIL import Image
from scipy.optimize import linear_sum_assignment

POS_TH = 0.35


# ---------------------------------------------------------------------------
# Metrics.
# ---------------------------------------------------------------------------


def jaccard(annotation: np.ndarray, segmentation: np.ndarray) -> np.ndarray:
    """Binary IoU over the last two axes; empty-union frames score 1."""
    a = annotation.astype(bool)
    s = segmentation.astype(bool)
    inters = np.sum(s & a, axis=(-2, -1))
    union = np.sum(s | a, axis=(-2, -1))
    with np.errstate(divide="ignore", invalid="ignore"):
        j = inters / union
    j = np.where(np.isclose(union, 0), 1.0, j)
    return j


def _seg2bmap(seg: np.ndarray) -> np.ndarray:
    """1-px-wide boundary map (David Martin's bmap, same-size fast path)."""
    seg = seg.astype(bool)
    e = np.zeros_like(seg)
    s = np.zeros_like(seg)
    se = np.zeros_like(seg)
    e[:, :-1] = seg[:, 1:]
    s[:-1, :] = seg[1:, :]
    se[:-1, :-1] = seg[1:, 1:]
    b = (seg ^ e) | (seg ^ s) | (seg ^ se)
    b[-1, :] = seg[-1, :] ^ e[-1, :]
    b[:, -1] = seg[:, -1] ^ s[:, -1]
    b[-1, -1] = False
    return b


def _disk(radius: int) -> np.ndarray:
    """Boolean disk structuring element (skimage.morphology.disk)."""
    l = np.arange(-radius, radius + 1)
    x, y = np.meshgrid(l, l)
    return ((x**2 + y**2) <= radius**2).astype(np.uint8)


def boundary_f_measure(foreground: np.ndarray, gt: np.ndarray, bound_th: float = 0.008) -> float:
    bound_pix = bound_th if bound_th >= 1 else math.ceil(bound_th * np.linalg.norm(foreground.shape))
    fg_boundary = _seg2bmap(foreground)
    gt_boundary = _seg2bmap(gt)
    kernel = _disk(int(bound_pix))
    fg_dil = cv2.dilate(fg_boundary.astype(np.uint8), kernel)
    gt_dil = cv2.dilate(gt_boundary.astype(np.uint8), kernel)
    gt_match = gt_boundary * fg_dil
    fg_match = fg_boundary * gt_dil
    n_fg, n_gt = fg_boundary.sum(), gt_boundary.sum()
    if n_fg == 0 and n_gt > 0:
        return 0.0
    if n_fg > 0 and n_gt == 0:
        return 0.0  # precision=0, recall=1 -> F=0
    if n_fg == 0 and n_gt == 0:
        return 1.0
    precision = fg_match.sum() / float(n_fg)
    recall = gt_match.sum() / float(n_gt)
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def db_statistics(per_frame: np.ndarray) -> tuple[float, float, float]:
    """(mean, recall@0.5, decay over 4 temporal bins)."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", category=RuntimeWarning)
        m = np.nanmean(per_frame)
        r = np.nanmean(per_frame > 0.5)
    n_bins = 4
    ids = np.round(np.linspace(1, len(per_frame), n_bins + 1) + 1e-10) - 1
    ids = ids.astype(np.uint8)
    bins = [per_frame[ids[i] : ids[i + 1] + 1] for i in range(n_bins)]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", category=RuntimeWarning)
        d = np.nanmean(bins[0]) - np.nanmean(bins[3])
    return float(m), float(r), float(d)


# ---------------------------------------------------------------------------
# Dataset + results IO.
# ---------------------------------------------------------------------------


def list_sequences(davis_root: str, subset: str) -> dict:
    """{seq: [frame_id, ...]} from an rcf-style split (root/<subset>.txt) or
    by listing the Annotations folder for an official DAVIS layout."""
    split_path = os.path.join(davis_root, f"{subset}.txt")
    seqs: dict = {}
    if os.path.exists(split_path):
        with open(split_path) as f:
            for line in sorted(f.readlines()):
                parts = line.split()
                if not parts:
                    continue
                seq = parts[0].rstrip("/").split("/")[-1]
                seqs[seq] = [os.path.splitext(p)[0] for p in parts[1:]]
        return seqs
    ann_root = os.path.join(davis_root, "Annotations", "480p")
    for seq in sorted(os.listdir(ann_root)):
        frames = sorted(glob(os.path.join(ann_root, seq, "*.png")))
        seqs[seq] = [os.path.splitext(os.path.basename(p))[0] for p in frames]
    return seqs


def read_gt_masks(davis_root: str, seq: str, frame_ids, separate_objects: bool):
    ann_dir = os.path.join(davis_root, "Annotations", "480p", seq)
    masks = np.stack(
        [np.array(Image.open(os.path.join(ann_dir, f"{fid}.png"))) for fid in frame_ids]
    )
    if masks.ndim == 4:
        masks = masks[..., 0]
    if separate_objects:
        num_objects = int(masks[0].max())
        ids = np.arange(1, num_objects + 1)[:, None, None, None]
        return (masks[None] == ids)
    return (masks > 0)[None]


def read_result_masks(results_path: str, seq: str, frame_ids, step: int,
                      target_wh: tuple[int, int] = (854, 480)):
    out = []
    for fid in frame_ids:
        path = os.path.join(results_path, f"pred_seg_{seq}_{fid}_{step:07}.png")
        if not os.path.exists(path):
            matches = glob(os.path.join(results_path, f"pred_seg_{seq}_*_{fid}_{step:07}.png"))
            assert len(matches) == 1, f"missing/ambiguous result mask for {seq}/{fid}"
            path = matches[0]
        arr = np.array(Image.open(path).resize(target_wh, resample=Image.BILINEAR))
        if arr.ndim == 3:
            arr = arr[..., 0]
        out.append((arr > 256 * POS_TH).astype(np.uint8))
    masks = np.stack(out)
    num_objects = max(int(masks.max()), 1)
    ids = np.arange(1, num_objects + 1)[:, None, None, None]
    return masks[None] == ids


# ---------------------------------------------------------------------------
# Evaluation.
# ---------------------------------------------------------------------------


def evaluate_unsupervised(gt_masks, res_masks, max_n_proposals: int = 20):
    """gt [O, T, H, W]; res [P, T, H, W] -> matched (J, F) [O, T]."""
    assert res_masks.shape[0] <= max_n_proposals
    if res_masks.shape[0] < gt_masks.shape[0]:
        pad = np.zeros((gt_masks.shape[0] - res_masks.shape[0], *res_masks.shape[1:]))
        res_masks = np.concatenate([res_masks, pad], axis=0)
    n_p, n_o, n_t = res_masks.shape[0], gt_masks.shape[0], gt_masks.shape[1]
    j = np.zeros((n_p, n_o, n_t))
    f = np.zeros((n_p, n_o, n_t))
    for oi in range(n_o):
        for pi in range(n_p):
            j[pi, oi] = jaccard(gt_masks[oi], res_masks[pi])
            f[pi, oi] = [
                boundary_f_measure(res_masks[pi, t], gt_masks[oi, t]) for t in range(n_t)
            ]
    score = (j.mean(axis=2) + f.mean(axis=2)) / 2
    row, col = linear_sum_assignment(-score)
    return j[row, col], f[row, col]


def evaluate(davis_root: str, results_path: str, subset: str = "val", year: str = "2016",
             step: int = 0, metrics=("J", "F")) -> dict:
    seqs = list_sequences(davis_root, subset)
    separate_objects = year != "2016"
    res: dict = {
        m: {"M": [], "R": [], "D": [], "M_per_object": {}, "seq_len": {}} for m in metrics
    }
    for seq, frame_ids in seqs.items():
        gt = read_gt_masks(davis_root, seq, frame_ids, separate_objects)
        # Predictions are resized to the GT resolution (854x480 on real
        # DAVIS, matching the reference's hard-coded target).
        pred = read_result_masks(results_path, seq, frame_ids, step,
                                 target_wh=(gt.shape[-1], gt.shape[-2]))
        j, f = evaluate_unsupervised(gt, pred)
        for oi in range(gt.shape[0]):
            name = f"{seq}_{oi + 1}"
            for metric, values in (("J", j), ("F", f)):
                if metric not in res:
                    continue
                m, r, d = db_statistics(values[oi])
                res[metric]["M"].append(m)
                res[metric]["R"].append(r)
                res[metric]["D"].append(d)
                res[metric]["M_per_object"][name] = m
                res[metric]["seq_len"][name] = gt.shape[1]
    return res


def summarize(res: dict) -> dict:
    j, f = res["J"], res["F"]
    sum_j = sum(j["M_per_object"][k] * j["seq_len"][k] for k in j["M_per_object"])
    n_frames = sum(j["seq_len"].values())
    return {
        "J&F-Mean": (np.mean(j["M"]) + np.mean(f["M"])) / 2,
        "J-Mean": float(np.mean(j["M"])),
        "J-FrameMean": sum_j / n_frames,
        "J-Recall": float(np.mean(j["R"])),
        "J-Decay": float(np.mean(j["D"])),
        "F-Mean": float(np.mean(f["M"])),
        "F-Recall": float(np.mean(f["R"])),
        "F-Decay": float(np.mean(f["D"])),
    }


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="DAVIS J&F evaluation (unsupervised)")
    parser.add_argument("--davis_path", type=str, required=True)
    parser.add_argument("--results_path", type=str, required=True)
    parser.add_argument("--set", type=str, default="val")
    parser.add_argument("--year", type=str, default="2016", choices=["2016", "2017", "2019"])
    parser.add_argument("--step", type=int, default=0)
    args = parser.parse_args(argv)

    res = evaluate(args.davis_path, args.results_path, args.set, args.year, args.step)
    summary = summarize(res)
    print(",".join(summary))
    print(",".join(f"{v:.3f}" for v in summary.values()))
    print("\nPer-sequence J:")
    for name, value in res["J"]["M_per_object"].items():
        print(f"  {name}: {value * 100:.2f}")

    import csv

    out_csv = os.path.join(args.results_path, f"global_results-{args.set}.csv")
    with open(out_csv, "w", newline="") as fh:
        writer = csv.writer(fh)
        writer.writerow(summary.keys())
        writer.writerow(f"{v:.3f}" for v in summary.values())
    print(f"\nGlobal results saved in {out_csv}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
