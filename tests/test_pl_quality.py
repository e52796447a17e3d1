"""tools/pl_quality.py: PL-vs-GT IoU measurement (the stage-2 A/B intermediate)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_mask(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)


@pytest.fixture
def pl_tree(tmp_path):
    """Two seqs x two frames with known IoUs; one PL without GT (skipped)."""
    data = tmp_path / "data_davis"
    pl = tmp_path / "pl"
    gt = np.zeros((32, 48), bool)
    gt[8:24, 12:36] = True  # 16x24 = 384 px
    half = np.zeros_like(gt)
    half[8:24, 12:24] = True  # left half: IoU 0.5
    for seq, masks in (("seq0", [gt, gt]), ("seq1", [half, gt])):
        for i, m in enumerate(masks):
            _write_mask(str(data / "Annotations" / "480p" / seq / f"{i:05d}.png"), gt)
            _write_mask(str(pl / f"pred_seg_{seq}_{i:05d}_0000000.png"), m)
    _write_mask(str(pl / "pred_seg_seq9_00000_0000000.png"), gt)  # no GT
    return str(pl), str(data)


def test_pl_quality_iou(pl_tree):
    pl, data = pl_tree
    proc = subprocess.run(
        [sys.executable, "tools/pl_quality.py", "--pl-dir", pl, "--data-dir", data],
        capture_output=True, text=True, cwd=REPO)
    assert proc.returncode == 0, proc.stderr
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["n_frames"] == 4
    assert out["n_missing_gt"] == 1
    assert out["per_seq"]["seq0"] == 1.0
    assert out["per_seq"]["seq1"] == pytest.approx(0.75, abs=1e-3)
    assert out["pl_iou_mean"] == pytest.approx(0.875, abs=1e-3)
    assert out["pl_iou_min"] == pytest.approx(0.5, abs=1e-3)


def test_pl_quality_empty_agreement(tmp_path):
    """Both-empty frames count as IoU 1.0, and an empty PL dir errors."""
    data = tmp_path / "data_davis"
    pl = tmp_path / "pl"
    empty = np.zeros((16, 16), bool)
    _write_mask(str(data / "Annotations" / "480p" / "s" / "00000.png"), empty)
    _write_mask(str(pl / "pred_seg_s_00000_0000000.png"), empty)
    proc = subprocess.run(
        [sys.executable, "tools/pl_quality.py", "--pl-dir", str(pl),
         "--data-dir", str(data)], capture_output=True, text=True, cwd=REPO)
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["pl_iou_mean"] == 1.0

    os.remove(str(pl / "pred_seg_s_00000_0000000.png"))
    proc = subprocess.run(
        [sys.executable, "tools/pl_quality.py", "--pl-dir", str(pl),
         "--data-dir", str(data)], capture_output=True, text=True, cwd=REPO)
    assert proc.returncode == 1
    assert "error" in json.loads(proc.stdout.strip().splitlines()[-1])
