import numpy as np
import pytest
from PIL import Image

from rcf_tpu.data import DataLoader, EvalTransform, TrainTransform, VideoDataset, parse_split


# `davis_like` fixture lives in conftest.py (shared with the e2e loop test).


def test_parse_split(davis_like):
    names, paths = parse_split(str(davis_like), "trainval.txt")
    assert names == ["bear", "cows"]
    assert len(paths[0]) == 4 and len(paths[1]) == 3
    assert paths[0][0].endswith("bear/00000.jpg")


def test_index_overhang_shifts_window(davis_like):
    ds = VideoDataset(str(davis_like), "trainval.txt", training=True, frame_num=2, load_flow=True, flow_suffix="_T")
    assert len(ds) == 7
    # Last index of seq 0 (index 3) must shift back to start at frame 2.
    s = ds[3]
    assert s["frame_ind_start"] == 2
    assert s["paths"][0].endswith("00002.jpg") and s["paths"][1].endswith("00003.jpg")
    # Flow file i is the flow between frames i-1 and i.
    fw = np.load(davis_like / "Flows_T/480p/bear/00003.npy")
    np.testing.assert_array_equal(s["gt_fw_flows"][0], fw)


def test_eval_sample_has_original_res_ann(davis_like):
    ds = VideoDataset(str(davis_like), "val.txt", training=False, frame_num=1)
    s = ds[0]
    assert s["ann"].shape == (120, 214)
    out = EvalTransform()(s)
    assert out["ann"].shape == (120, 214)
    # 0.98 ratio of short side 400 -> short side 392 keep-ratio.
    assert out["imgs"].shape[1] == 392
    assert abs(out["imgs"].shape[2] - round(214 * 392 / 120)) <= 1


def test_train_transform_shapes_and_determinism(davis_like):
    ds = VideoDataset(str(davis_like), "trainval.txt", training=True, frame_num=2, load_flow=True, flow_suffix="_T")
    tf = TrainTransform(strong_aug=True)
    s1 = tf(ds[0], np.random.default_rng(42))
    s2 = tf(ds[0], np.random.default_rng(42))
    assert s1["imgs"].shape == (2, 384, 384, 3)
    assert s1["gt_fw_flows"].shape == (1, 384, 384, 2)
    np.testing.assert_array_equal(s1["imgs"], s2["imgs"])
    s3 = tf(ds[0], np.random.default_rng(43))
    assert not np.array_equal(s1["imgs"], s3["imgs"])


def test_pair_gets_identical_geometry(davis_like):
    ds = VideoDataset(str(davis_like), "trainval.txt", training=True, frame_num=2, load_flow=True, flow_suffix="_T")
    sample = ds[0]
    sample["imgs"][1] = sample["imgs"][0].copy()  # make the two frames identical
    out = TrainTransform(strong_aug=True)(sample, np.random.default_rng(7))
    np.testing.assert_allclose(out["imgs"][0], out["imgs"][1], atol=1e-6)


def test_flip_moves_flow_without_negating(davis_like):
    ds = VideoDataset(str(davis_like), "trainval.txt", training=True, frame_num=2, load_flow=True, flow_suffix="_T")
    tf_flip = TrainTransform(strong_aug=True)
    # Find a seed where the flip triggers by comparing with strong_aug=False
    # (photometric doesn't touch flow; flip is the only flow-affecting aug).
    base = TrainTransform(strong_aug=False)
    for seed in range(20):
        a = base(ds[0], np.random.default_rng(seed))
        b = tf_flip(ds[0], np.random.default_rng(seed))
        if not np.array_equal(a["gt_fw_flows"], b["gt_fw_flows"]):
            np.testing.assert_array_equal(a["gt_fw_flows"][:, :, ::-1], b["gt_fw_flows"])
            # Values are moved, never negated (reference behavior).
            assert a["gt_fw_flows"].min() == b["gt_fw_flows"].min()
            return
    pytest.fail("no flip triggered in 20 seeds")


def test_loader_batching_and_sharding(davis_like):
    ds = VideoDataset(str(davis_like), "trainval.txt", training=True, frame_num=2, load_flow=True, flow_suffix="_T")
    tf = TrainTransform(strong_aug=False)
    shards = []
    for shard in range(2):
        dl = DataLoader(ds, tf, batch_size=2, shuffle=True, seed=5, num_workers=2,
                        shard_index=shard, num_shards=2)
        batches = list(dl)
        assert all(b["imgs"].shape == (2, 2, 384, 384, 3) for b in batches)
        shards.append(batches)
    # Both shards see the same number of batches (wrap-padded).
    assert len(shards[0]) == len(shards[1])


def test_loader_eval_sequential(davis_like):
    ds = VideoDataset(str(davis_like), "val.txt", training=False, frame_num=1)
    dl = DataLoader(ds, EvalTransform(), batch_size=4, shuffle=False, drop_last=False, group_by_shape=True)
    seen = []
    for b in dl:
        assert b["imgs"].shape[2] == 392
        seen += b["seq_names"]
    assert len(seen) == 7


def test_geometry_helpers():
    from rcf_tpu.data.transforms import center_crop, pad_to, seg_rescale

    arr = np.arange(48).reshape(6, 8).astype(np.uint8)
    c = center_crop(arr, (4, 4))
    assert c.shape == (4, 4) and c[0, 0] == arr[1, 2]
    p = pad_to(arr, size_hw=(8, 10), pad_val=7)
    assert p.shape == (8, 10) and p[-1, -1] == 7 and p[0, 0] == arr[0, 0]
    d = pad_to(arr, size_divisor=5)
    assert d.shape == (10, 10)
    r = seg_rescale(arr[..., None].repeat(3, -1), 0.5)
    assert r.shape == (3, 4, 3)
