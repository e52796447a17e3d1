import os

import numpy as np
import pytest
from PIL import Image

from rcf_tpu.eval.davis import (
    boundary_f_measure,
    db_statistics,
    evaluate,
    jaccard,
    summarize,
)
from rcf_tpu.eval.stv2_fbms import evaluate as stv2_evaluate


def test_jaccard_and_empty_union():
    a = np.zeros((4, 4), bool)
    b = np.zeros((4, 4), bool)
    assert jaccard(a, b) == 1.0  # empty union counts as perfect
    a[:2] = True
    b[:2] = True
    assert jaccard(a, b) == 1.0
    b[:] = False
    b[0] = True
    assert jaccard(a, b) == pytest.approx(0.5)


def test_boundary_f_perfect_and_disjoint():
    m = np.zeros((32, 32), bool)
    m[8:20, 8:20] = True
    assert boundary_f_measure(m, m) == 1.0
    other = np.zeros_like(m)
    other[26:30, 26:30] = True
    assert boundary_f_measure(other, m) < 0.2


def test_db_statistics_decay():
    vals = np.linspace(1.0, 0.0, 20)
    m, r, d = db_statistics(vals)
    assert m == pytest.approx(0.5)
    assert r == pytest.approx(np.mean(vals > 0.5))
    assert d > 0.5  # strong decay


@pytest.fixture()
def mini_davis(tmp_path):
    """DAVIS-layout dataset: 2 sequences x 3 frames at 480x854 with square
    objects, plus exported predictions (one perfect, one shifted)."""
    rng = np.random.default_rng(0)
    root = tmp_path / "davis"
    results = tmp_path / "results"
    results.mkdir()
    lines = []
    for seq, shift in (("boxy", 0), ("shifty", 30)):
        (root / "Annotations/480p" / seq).mkdir(parents=True)
        (root / "JPEGImages/480p" / seq).mkdir(parents=True)
        frames = []
        for t in range(3):
            ann = np.zeros((480, 854), np.uint8)
            ann[100 + 10 * t : 300 + 10 * t, 200 : 500] = 255
            Image.fromarray(ann).save(root / "Annotations/480p" / seq / f"{t:05d}.png")
            pred = np.zeros((480, 854), np.uint8)
            pred[100 + 10 * t + shift : 300 + 10 * t + shift, 200 + shift : 500 + shift] = 255
            Image.fromarray(pred).save(results / f"pred_seg_{seq}_{t:05d}_0000000.png")
            frames.append(f"{t:05d}.jpg")
        lines.append(f"JPEGImages/480p/{seq}/ " + " ".join(frames))
    (root / "val.txt").write_text("\n".join(lines) + "\n")
    return root, results


def test_davis_evaluation_end_to_end(mini_davis):
    root, results = mini_davis
    res = evaluate(str(root), str(results), subset="val", year="2016", step=0)
    summary = summarize(res)
    assert res["J"]["M_per_object"]["boxy_1"] == pytest.approx(1.0)
    # Shifted box: IoU analytically = inter/union of shifted rectangles.
    inter = (200 - 30) * (300 - 30)
    union = 2 * 200 * 300 - inter
    assert res["J"]["M_per_object"]["shifty_1"] == pytest.approx(inter / union, abs=0.01)
    assert 0.0 < summary["J&F-Mean"] <= 1.0
    assert summary["J-FrameMean"] == pytest.approx(
        (1.0 + inter / union) / 2, abs=0.01
    )


def test_stv2_evaluation(tmp_path):
    root = tmp_path / "stv2"
    pred_dir = tmp_path / "preds"
    pred_dir.mkdir()
    (root / "Annotations" / "worm").mkdir(parents=True)
    frames = []
    for t in range(2):
        ann = np.zeros((100, 160), np.uint8)
        ann[20:60, 40:100] = 255
        Image.fromarray(ann).save(root / "Annotations/worm" / f"{t:05d}.png")
        pred = np.zeros((100, 160), np.uint8)
        pred[20:60, 40:100] = 255 if t == 0 else 0  # second frame misses
        Image.fromarray(pred).save(pred_dir / f"pred_seg_worm_{t:05d}_0000000.png")
        frames.append(f"{t:05d}.png")
    (root / "trainval.txt").write_text("JPEGImages/worm/ " + " ".join(frames) + "\n")
    res = stv2_evaluate("SegTrackv2", str(pred_dir), data_root=str(root))
    assert res["per_sequence"]["worm"] == pytest.approx(0.5)
    assert res["num_frames"] == 2


def test_crf_pp_smoke(tmp_path):
    from rcf_tpu.eval.crf_pp import run

    rng = np.random.default_rng(1)
    img_dir = tmp_path / "JPEGImages" / "seqA"
    ann_dir = tmp_path / "export"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir()
    for t in range(2):
        img = np.zeros((40, 60, 3), np.uint8)
        img[:, :30] = (200, 30, 30)
        img[:, 30:] = (30, 30, 200)
        Image.fromarray(img).save(img_dir / f"{t:05d}.jpg")
        mask = np.zeros((40, 60), np.uint8)
        mask[:, :30] = 180
        mask = np.clip(mask + rng.integers(-60, 60, mask.shape), 0, 255).astype(np.uint8)
        Image.fromarray(mask).save(ann_dir / f"pred_seg_seqA_{t:05d}_0000000.png")
    out_dir = run(str(tmp_path / "JPEGImages"), str(ann_dir), batch=2, chunk=64, iters=10)
    outs = sorted(os.listdir(out_dir))
    assert outs == ["pred_seg_seqA_00000_0000000.png", "pred_seg_seqA_00001_0000000.png"]
    refined = np.array(Image.open(os.path.join(out_dir, outs[0])))
    assert refined[:, :28].mean() > 200
    assert refined[:, 32:].mean() < 50


def test_crf_pp_device_engine(tmp_path):
    """Device engine with a reduced grid produces masks of the right shape."""
    from rcf_tpu.eval.crf_pp import run

    rng = np.random.default_rng(2)
    img_dir = tmp_path / "JPEGImages" / "seqB"
    ann_dir = tmp_path / "export"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir()
    img = np.zeros((40, 60, 3), np.uint8)
    img[:, :30] = (200, 30, 30)
    img[:, 30:] = (30, 30, 200)
    Image.fromarray(img).save(img_dir / "00000.jpg")
    mask = np.zeros((40, 60), np.uint8)
    mask[:, :30] = 180
    Image.fromarray(mask).save(ann_dir / "pred_seg_seqB_00000_0000000.png")
    out_dir = run(str(tmp_path / "JPEGImages"), str(ann_dir), batch=1, chunk=64,
                  iters=10, engine="device", resolution=(20, 30))
    refined = np.array(Image.open(os.path.join(out_dir, "pred_seg_seqB_00000_0000000.png")))
    assert refined.shape == (40, 60)
    assert refined[:, :26].mean() > 180
