"""Paired augmentation pipeline (host-side numpy/cv2).

Capability parity with `dataset/transforms.py` in the reference. Every
transform is applied with the *same* sampled parameters across the frame
pair and its aligned fields (flows, pseudo-labels), which is the invariant
the relaxed common-fate loss depends on.

Train pipeline (`dataset/transforms.py:895-907`):
    keep-ratio Resize(scale=(9999, 400), ratio in (0.96, 1.0))  [bilinear
    for images, nearest for flow/PL fields, values unscaled]
  → RandomCrop(384x384) (upscales first if the image is shorter than crop)
  → [strong_aug] RandomFlip(p=0.5, horizontal; flow values NOT negated,
    matching the reference) → PhotoMetricDistortion
  → float32 [0,1] → ImageNet mean/std normalize.

Eval pipeline (`:909-914`): keep-ratio Resize(ratio 0.98), annotation kept
at original resolution, normalize.

Differences by design: explicit `np.random.Generator` threading (worker-safe
determinism) instead of global numpy RNG; channel-last throughout; output is
a stacked `[I, H, W, C]` array per field instead of torch tensors.
"""

from __future__ import annotations

from dataclasses import dataclass

import cv2
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_CV2_INTERP = {"bilinear": cv2.INTER_LINEAR, "nearest": cv2.INTER_NEAREST}


def rescale_size(old_hw: tuple[int, int], scale: tuple[int, int]) -> tuple[int, int]:
    """Keep-ratio target size fitting within (long_edge, short_edge) bounds."""
    h, w = old_hw
    max_long, max_short = max(scale), min(scale)
    factor = min(max_long / max(h, w), max_short / min(h, w))
    return int(h * factor + 0.5), int(w * factor + 0.5)


def imrescale(img: np.ndarray, scale: tuple[int, int], interpolation: str = "bilinear") -> np.ndarray:
    """Keep-ratio rescale (mmcv.imrescale semantics, cv2 backend)."""
    new_h, new_w = rescale_size(img.shape[:2], scale)
    return imresize(img, (new_h, new_w), interpolation)


def imresize(img: np.ndarray, out_hw: tuple[int, int], interpolation: str = "bilinear") -> np.ndarray:
    out = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=_CV2_INTERP[interpolation])
    if out.ndim == img.ndim - 1:  # cv2 drops trailing singleton channels
        out = out[..., None]
    return out


# ---------------------------------------------------------------------------
# Photometric distortion (uint8 RGB, cv2 HSV convention).
# ---------------------------------------------------------------------------


def _convert(img: np.ndarray, alpha: float = 1.0, beta: float = 0.0) -> np.ndarray:
    return np.clip(img.astype(np.float32) * alpha + beta, 0, 255).astype(np.uint8)


@dataclass
class PhotoMetricDistortion:
    """Brightness/contrast/saturation/hue jitter, identical across the pair.

    Parity with `dataset/transforms.py:557-697` (each sub-op fires with
    p=0.5; contrast is applied first or last at random).
    """

    brightness_delta: float = 32.0
    contrast_range: tuple[float, float] = (0.5, 1.5)
    saturation_range: tuple[float, float] = (0.5, 1.5)
    hue_delta: float = 18.0

    def _saturation(self, imgs, alpha):
        out = []
        for img in imgs:
            hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
            hsv[:, :, 1] = _convert(hsv[:, :, 1], alpha=alpha)
            out.append(cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB))
        return out

    def _hue(self, imgs, delta):
        out = []
        for img in imgs:
            hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
            hsv[:, :, 0] = (hsv[:, :, 0].astype(int) + delta) % 180
            out.append(cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB))
        return out

    def __call__(self, imgs: list[np.ndarray], rng: np.random.Generator) -> list[np.ndarray]:
        if rng.integers(2):
            beta = rng.uniform(-self.brightness_delta, self.brightness_delta)
            imgs = [_convert(im, beta=beta) for im in imgs]
        contrast_last = rng.integers(2) == 0
        if not contrast_last and rng.integers(2):
            alpha = rng.uniform(*self.contrast_range)
            imgs = [_convert(im, alpha=alpha) for im in imgs]
        if rng.integers(2):
            imgs = self._saturation(imgs, rng.uniform(*self.saturation_range))
        if rng.integers(2):
            imgs = self._hue(imgs, rng.uniform(-self.hue_delta, self.hue_delta))
        if contrast_last and rng.integers(2):
            alpha = rng.uniform(*self.contrast_range)
            imgs = [_convert(im, alpha=alpha) for im in imgs]
        return imgs


# ---------------------------------------------------------------------------
# Standalone geometry helpers (API parity with the reference's CenterCrop /
# Pad / SegRescale classes, `dataset/transforms.py:309-379,513-552`; the
# shipped pipelines don't use them, but they are part of the transform API).
# ---------------------------------------------------------------------------


def center_crop(arr: np.ndarray, crop_hw: tuple[int, int]) -> np.ndarray:
    ch, cw = crop_hw
    oy = max(arr.shape[0] - ch, 0) // 2
    ox = max(arr.shape[1] - cw, 0) // 2
    return arr[oy : oy + ch, ox : ox + cw]


def pad_to(arr: np.ndarray, size_hw: tuple[int, int] | None = None,
           size_divisor: int | None = None, pad_val: float = 0) -> np.ndarray:
    """Bottom/right pad to a fixed size or to a multiple of size_divisor."""
    assert (size_hw is None) != (size_divisor is None)
    h, w = arr.shape[:2]
    if size_divisor is not None:
        size_hw = (-(-h // size_divisor) * size_divisor, -(-w // size_divisor) * size_divisor)
    pads = [(0, size_hw[0] - h), (0, size_hw[1] - w)] + [(0, 0)] * (arr.ndim - 2)
    return np.pad(arr, pads, constant_values=pad_val)


def seg_rescale(arr: np.ndarray, scale_factor: float) -> np.ndarray:
    if scale_factor == 1:
        return arr
    out_hw = (int(arr.shape[0] * scale_factor + 0.5), int(arr.shape[1] * scale_factor + 0.5))
    return imresize(arr, out_hw, "nearest")


# ---------------------------------------------------------------------------
# Composite pipelines.
# ---------------------------------------------------------------------------


def _resize_all(sample: dict, scale: tuple[int, int]) -> dict:
    sample["imgs"] = [imrescale(im, scale, "bilinear") for im in sample["imgs"]]
    for key in sample["seg_fields"]:
        sample[key] = [imrescale(arr, scale, "nearest") for arr in sample[key]]
    return sample


# Fused uint8 -> normalized-f32 affine (a plain /255 would promote to f64).
_NORM_SCALE = (1.0 / (255.0 * IMAGENET_STD)).astype(np.float32)
_NORM_BIAS = (-IMAGENET_MEAN / IMAGENET_STD).astype(np.float32)


def _normalize(imgs: list[np.ndarray]) -> np.ndarray:
    stacked = np.stack(imgs)
    return stacked.astype(np.float32) * _NORM_SCALE + _NORM_BIAS


@dataclass
class TrainTransform:
    strong_aug: bool = True
    has_pl: bool = False
    scale_flow: bool = False
    crop_size: tuple[int, int] = (384, 384)
    base_scale: tuple[int, int] = (9999, 400)
    ratio_range: tuple[float, float] = (0.96, 1.0)
    # keep_uint8: emit uint8 frames and let the model normalize on device
    # (saves host float math + 4x host->device transfer; tpu.device_normalize).
    keep_uint8: bool = False

    def __call__(self, sample: dict, rng: np.random.Generator) -> dict:
        # 1. Keep-ratio resize with a sampled global ratio.
        ratio = rng.random() * (self.ratio_range[1] - self.ratio_range[0]) + self.ratio_range[0]
        scale = (int(self.base_scale[0] * ratio), int(self.base_scale[1] * ratio))
        old_hw = sample["imgs"][0].shape[:2]
        sample = _resize_all(sample, scale)
        new_hw = sample["imgs"][0].shape[:2]
        scale_factor = np.array(
            [new_hw[1] / old_hw[1], new_hw[0] / old_hw[0]], np.float32
        )  # (w_scale, h_scale)

        # 2. Random crop (upscale first if shorter than the crop).
        ch, cw = self.crop_size
        if sample["imgs"][0].shape[0] < ch:
            sample = _resize_all(sample, (2000, ch))
        h, w = sample["imgs"][0].shape[:2]
        oy = int(rng.integers(0, max(h - ch, 0) + 1))
        ox = int(rng.integers(0, max(w - cw, 0) + 1))
        sample["imgs"] = [im[oy : oy + ch, ox : ox + cw] for im in sample["imgs"]]
        for key in sample["seg_fields"]:
            sample[key] = [arr[oy : oy + ch, ox : ox + cw] for arr in sample[key]]

        # 3. Strong augmentation: flip + photometric.
        if self.strong_aug:
            if rng.random() < 0.5:
                sample["imgs"] = [im[:, ::-1] for im in sample["imgs"]]
                for key in sample["seg_fields"]:
                    sample[key] = [np.ascontiguousarray(arr[:, ::-1]) for arr in sample[key]]
            sample["imgs"] = PhotoMetricDistortion()(sample["imgs"], rng)

        # 4. To arrays (normalized f32, or uint8 for device-side normalize).
        out = {
            "imgs": np.stack(sample["imgs"]) if self.keep_uint8 else _normalize(sample["imgs"]),
            "seq_ids": sample["seq_ids"],
            "seq_names": sample["seq_names"],
            "paths": sample["paths"],
            "frame_ind_start": sample["frame_ind_start"],
        }
        if "gt_fw_flows" in sample:
            fw = np.stack(sample["gt_fw_flows"]).astype(np.float32)
            bw = np.stack(sample["gt_bw_flows"]).astype(np.float32)
            if self.scale_flow:
                fw = fw * scale_factor
                bw = bw * scale_factor
            out["gt_fw_flows"], out["gt_bw_flows"] = fw, bw
        if self.has_pl and "pl_masks" in sample:
            out["pl_masks"] = np.stack(sample["pl_masks"]).astype(np.float32) / 255.0
        return out


@dataclass
class EvalTransform:
    strong_aug: bool = False  # accepted for config parity; unused
    base_scale: tuple[int, int] = (9999, 400)
    ratio: float = 0.98
    keep_uint8: bool = False

    def __call__(self, sample: dict, rng: np.random.Generator | None = None) -> dict:
        scale = (int(self.base_scale[0] * self.ratio), int(self.base_scale[1] * self.ratio))
        sample = _resize_all(sample, scale)
        out = {
            "imgs": np.stack(sample["imgs"]) if self.keep_uint8 else _normalize(sample["imgs"]),
            "seq_ids": sample["seq_ids"],
            "seq_names": sample["seq_names"],
            "paths": sample["paths"],
            "frame_ind_start": sample["frame_ind_start"],
        }
        if "ann" in sample:
            out["ann"] = sample["ann"]  # original resolution, never resized
        return out


def get_transform(cfg, training: bool):
    kwargs = dict(cfg.train_transform_kwargs if training else cfg.test_transform_kwargs)
    if training:
        return TrainTransform(**kwargs)
    return EvalTransform(**kwargs)
