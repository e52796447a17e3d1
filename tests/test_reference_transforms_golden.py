"""Golden test: our train/eval transform pipelines vs the ACTUAL reference
`dataset/transforms.py` (imported via tests/reference_harness.py).

Both pipelines consume one scripted sequence of unit draws, mapped through
each side's RNG surface (reference: global numpy legacy fns; ours: a
Generator-like adapter), so the sampled ratio/crop/flip/photometric
parameters are identical and the outputs must agree bitwise (both are
cv2-backed). Covers Resize(keep-ratio + ratio_range), RandomCrop incl. the
upscale-when-short path, RandomFlip (incl. the reference's
flow-not-negated quirk), PhotoMetricDistortion (uint8 truncation, HSV
convention, contrast-order coin), FlowTransform and normalization
(`dataset/transforms.py:884-914`).
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

from reference_harness import load_reference


@pytest.fixture(scope="module")
def ref():
    return load_reference()


class ScriptRNG:
    """Replays a fixed list of unit draws through both RNG surfaces."""

    def __init__(self, units):
        self.units = list(units)

    def _next(self) -> float:
        return self.units.pop(0)

    # reference surface (numpy legacy, patched into np.random)
    def random_sample(self):
        return self._next()

    def rand(self):
        return self._next()

    def randint(self, low, high=None, size=None):
        assert size is None
        base, n = (0, low) if high is None else (low, high - low)
        return base + min(int(self._next() * n), n - 1)

    def uniform(self, low, high):
        return low + self._next() * (high - low)

    # our surface (np.random.Generator-like)
    def random(self):
        return self._next()

    def integers(self, low, high=None):
        return self.randint(low, high)


def _patched_np_random(script: ScriptRNG):
    import contextlib

    @contextlib.contextmanager
    def ctx():
        saved = {k: getattr(np.random, k)
                 for k in ("random_sample", "rand", "randint", "uniform")}
        for k in saved:
            setattr(np.random, k, getattr(script, k))
        try:
            yield
        finally:
            for k, v in saved.items():
                setattr(np.random, k, v)

    return ctx()


def _sample(h=120, w=214, seed=0):
    rng = np.random.default_rng(seed)
    imgs = [rng.integers(0, 255, (h, w, 3), np.uint8) for _ in range(2)]
    flow = (rng.standard_normal((h, w, 2)) * 8).astype(np.float32)
    return imgs, flow


def _run_reference_train(ref, imgs, flow, units):
    t = ref.transforms.Transform(training=True, strong_aug=True, has_flow=True)
    data = {
        "imgs": [im.copy() for im in imgs],
        "gt_fw_flows": [flow.copy()],
        "gt_bw_flows": [(-flow).copy()],
        "seg_fields": ["gt_fw_flows", "gt_bw_flows"],
    }
    with _patched_np_random(ScriptRNG(units)):
        out = t(data)
    return out


def _run_ours_train(imgs, flow, units, crop=(384, 384)):
    from rcf_tpu.data.transforms import TrainTransform

    t = TrainTransform(strong_aug=True, crop_size=crop)
    sample = {
        "imgs": [im.copy() for im in imgs],
        "gt_fw_flows": [flow.copy()],
        "gt_bw_flows": [(-flow).copy()],
        "seg_fields": ["gt_fw_flows", "gt_bw_flows"],
        "seq_ids": 0, "seq_names": "seq", "paths": ["a.jpg", "b.jpg"],
        "frame_ind_start": 0,
    }
    return t(sample, ScriptRNG(units))


# A draw script long enough for every coin to fire both ways across cases:
# [ratio, crop_oy, crop_ox, flip, bright_coin, bright_beta, mode,
#  contrast_coin, contrast_alpha, sat_coin, sat_alpha, hue_coin, hue_delta,
#  contrast_coin2, contrast_alpha2]
CASES = [
    [0.5, 0.3, 0.7, 0.2, 0.9, 0.25, 0.9, 0.9, 0.8, 0.9, 0.3, 0.9, 0.6, 0.0, 0.0],
    [0.0, 0.0, 0.0, 0.9, 0.0, 0.0, 0.0, 0.9, 0.2, 0.0, 0.0, 0.9, 0.1, 0.9, 0.9],
    [1.0, 0.99, 0.99, 0.49, 0.9, 0.0, 0.4, 0.0, 0.0, 0.9, 0.99, 0.0, 0.0, 0.0, 0.0],
]


@pytest.mark.parametrize("units", CASES)
def test_train_pipeline_golden(ref, units):
    imgs, flow = _sample()
    t_out = _run_reference_train(ref, imgs, flow, list(units))
    ours = _run_ours_train(imgs, flow, list(units), crop=(384, 384))

    # reference: list of CHW normalized torch tensors; ours: [I, H, W, 3] f32.
    ref_imgs = torch.stack(t_out["imgs"]).numpy()  # [2, 3, H, W]
    np.testing.assert_allclose(
        np.moveaxis(ours["imgs"], -1, 1), ref_imgs, rtol=1e-5, atol=1e-5)

    ref_fw = t_out["gt_fw_flows"][0].numpy()  # [2, H, W]
    np.testing.assert_array_equal(np.moveaxis(ours["gt_fw_flows"][0], -1, 0), ref_fw)
    ref_bw = t_out["gt_bw_flows"][0].numpy()
    np.testing.assert_array_equal(np.moveaxis(ours["gt_bw_flows"][0], -1, 0), ref_bw)


def test_train_pipeline_flip_quirk(ref):
    """When the flip coin fires, flows are spatially flipped but the x
    component is NOT negated (reference quirk, RandomFlip + seg_fields)."""
    units = CASES[1]  # flip draw 0.9 -> ... wait: flip fires when rand<0.5
    units = list(units)
    units[3] = 0.1  # force flip
    imgs, flow = _sample(seed=3)
    t_out = _run_reference_train(ref, imgs, flow, list(units))
    ours = _run_ours_train(imgs, flow, list(units))
    ref_fw = t_out["gt_fw_flows"][0].numpy()
    np.testing.assert_array_equal(np.moveaxis(ours["gt_fw_flows"][0], -1, 0), ref_fw)
    # x-flow on the flipped output equals the mirrored (un-negated) input
    # column at the crop location — signs unchanged:
    assert (ref_fw[0] >= 0).mean() == pytest.approx((flow[..., 0] >= 0).mean(), abs=0.05)


def test_train_pipeline_upscale_when_short(ref):
    """Images shorter than the crop trigger the imrescale(2000, crop_h)
    upscale path in both pipelines (RandomCrop, transforms.py:470-483)."""
    imgs, flow = _sample(h=90, w=160, seed=5)
    units = [0.5, 0.4, 0.6, 0.9] + [0.0] * 11
    t_out = _run_reference_train(ref, imgs, flow, list(units))
    ours = _run_ours_train(imgs, flow, list(units), crop=(384, 384))
    ref_imgs = torch.stack(t_out["imgs"]).numpy()
    assert ref_imgs.shape[-2:] == (384, 384)
    np.testing.assert_allclose(
        np.moveaxis(ours["imgs"], -1, 1), ref_imgs, rtol=1e-5, atol=1e-5)


def test_eval_pipeline_golden(ref):
    from rcf_tpu.data.transforms import EvalTransform

    imgs, _ = _sample(h=120, w=214, seed=7)
    from PIL import Image

    ann = np.stack([(np.arange(120 * 214).reshape(120, 214) % 255).astype(np.uint8)] * 3, -1)
    t = ref.transforms.Transform(training=False, strong_aug=False, has_flow=False)
    data = {"imgs": [imgs[0].copy()], "ann": Image.fromarray(ann),
            "seg_fields": []}
    with _patched_np_random(ScriptRNG([0.0] * 4)):
        t_out = t(data)

    ours = EvalTransform()(
        {"imgs": [imgs[0].copy()], "ann": ann[..., 0],
         "seg_fields": [], "seq_ids": 0, "seq_names": "seq",
         "paths": ["a.jpg"], "frame_ind_start": 0},
        np.random.default_rng(0),
    )
    ref_img = t_out["imgs"][0].numpy()
    np.testing.assert_allclose(
        np.moveaxis(ours["imgs"][0], -1, 0), ref_img, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(ours["ann"], t_out["ann"])
