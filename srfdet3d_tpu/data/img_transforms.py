"""Multi-view image pipeline transforms (host-side numpy).

Replacements for the reference's datasets/pipelines/transform_3d.py:
  PadMultiViewImage (:8)               -> :func:`pad_multiview`
  NormalizeMultiviewImage (:60)        -> :func:`normalize_multiview`
  PhotoMetricDistortionMultiViewImage (:96) -> :func:`photometric_distortion`
  CropMultiViewImage (:196)            -> :func:`crop_multiview`
  RandomScaleImageMultiViewImage (:224) -> :func:`random_scale_multiview`
  ResizeImageMultiViewImage (:270)     -> :func:`resize_multiview`
  HorizontalRandomFlipMultiViewImage (:325) -> :func:`horizontal_flip_multiview`
  RandomFlip3DMultiViewImage (:374)    -> (use with transforms.random_flip_3d)

All functions take/return a sample dict with:
  "images": list/array of (H, W, 3) float32,
  "lidar2img": (n_cam, 4, 4) — updated consistently with image-space edits.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np


def _resize(img: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize preserving float values (mmcv imresize semantics).

    A uint8 round-trip would clip normalized (mean-subtracted, negative)
    pixels to 0 and quantize floats — resize per channel in PIL 'F' mode
    instead."""
    from PIL import Image
    img = img.astype(np.float32, copy=False)
    size = (hw[1], hw[0])
    chans = [np.asarray(
        Image.fromarray(np.ascontiguousarray(img[..., c]), mode="F")
        .resize(size, Image.BILINEAR), np.float32)
        for c in range(img.shape[-1])]
    return np.stack(chans, axis=-1)


def pad_multiview(sample: Dict, size_divisor: int = 32,
                  pad_val: float = 0.0) -> Dict:
    """Bottom/right zero-pad every view to a multiple of size_divisor."""
    imgs = sample["images"]
    h = max(i.shape[0] for i in imgs)
    w = max(i.shape[1] for i in imgs)
    h = -(-h // size_divisor) * size_divisor
    w = -(-w // size_divisor) * size_divisor
    out = []
    for img in imgs:
        pad = np.full((h, w, img.shape[2]), pad_val, np.float32)
        pad[:img.shape[0], :img.shape[1]] = img
        out.append(pad)
    sample["images"] = out
    return sample


def normalize_multiview(sample: Dict,
                        mean=(123.675, 116.28, 103.53),
                        std=(58.395, 57.12, 57.375)) -> Dict:
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    sample["images"] = [(i - mean) / std for i in sample["images"]]
    return sample


def photometric_distortion(sample: Dict, rng: np.random.Generator,
                           brightness_delta: float = 32,
                           contrast_range=(0.5, 1.5),
                           saturation_range=(0.5, 1.5),
                           hue_delta: float = 18) -> Dict:
    """Random brightness/contrast/saturation/hue, same order semantics as
    mmdet's PhotoMetricDistortion (applied per view, pre-normalization)."""
    out = []
    for img in sample["images"]:
        img = img.astype(np.float32)
        if rng.integers(2):
            img = img + rng.uniform(-brightness_delta, brightness_delta)
        contrast_first = rng.integers(2)
        if contrast_first and rng.integers(2):
            img = img * rng.uniform(*contrast_range)
        # saturation and hue applied INDEPENDENTLY w.p. 0.5 each (mmdet)
        do_sat = bool(rng.integers(2))
        do_hue = bool(rng.integers(2))
        if do_sat or do_hue:
            import cv2
            hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                               cv2.COLOR_RGB2HSV).astype(np.float32)
            if do_sat:
                hsv[..., 1] *= rng.uniform(*saturation_range)
            if do_hue:
                hsv[..., 0] = (hsv[..., 0] +
                               rng.uniform(-hue_delta, hue_delta)) % 180
            img = cv2.cvtColor(
                np.clip(hsv, 0, 255).astype(np.uint8),
                cv2.COLOR_HSV2RGB).astype(np.float32)
        if not contrast_first and rng.integers(2):
            img = img * rng.uniform(*contrast_range)
        out.append(np.clip(img, 0, 255))
    sample["images"] = out
    return sample


def crop_multiview(sample: Dict, crop_hw: Tuple[int, int]) -> Dict:
    """Top-left crop (reference CropMultiViewImage: fixed-size corner crop;
    the principal point shifts only for non-corner crops, so lidar2img is
    unchanged here like the reference)."""
    h, w = crop_hw
    sample["images"] = [i[:h, :w] for i in sample["images"]]
    return sample


def random_scale_multiview(sample: Dict, rng: np.random.Generator,
                           scales: Sequence[float] = (0.5,)) -> Dict:
    """Scale every view by one randomly chosen factor; the projection's
    first two rows scale with it (reference :224-268)."""
    s = float(scales[int(rng.integers(len(scales)))])
    out = []
    for img in sample["images"]:
        hw = (int(img.shape[0] * s), int(img.shape[1] * s))
        out.append(_resize(img, hw))
    sample["images"] = out
    l2i = sample["lidar2img"].copy()
    l2i[:, :2, :] *= s
    sample["lidar2img"] = l2i
    return sample


def resize_multiview(sample: Dict, target_hw: Tuple[int, int]) -> Dict:
    """Resize all views to a fixed size, rescaling lidar2img per view
    (reference ResizeImageMultiViewImage, Waymo 5-cam path :270-323)."""
    out = []
    l2i = sample["lidar2img"].copy()
    for i, img in enumerate(sample["images"]):
        sy = target_hw[0] / img.shape[0]
        sx = target_hw[1] / img.shape[1]
        out.append(_resize(img, target_hw))
        l2i[i, 0, :] *= sx
        l2i[i, 1, :] *= sy
    sample["images"] = out
    sample["lidar2img"] = l2i
    return sample


def horizontal_flip_multiview(sample: Dict, rng: np.random.Generator,
                              flip_ratio: float = 0.5) -> Dict:
    """Mirror every view horizontally; u' = (W-1) - u, i.e. the projection
    row 0 negates with an offset (reference :325-372)."""
    if rng.uniform() >= flip_ratio:
        return sample
    out = []
    l2i = sample["lidar2img"].copy()
    for i, img in enumerate(sample["images"]):
        w = img.shape[1]
        out.append(img[:, ::-1].copy())
        l2i[i, 0, :] = -l2i[i, 0, :] + (w - 1) * l2i[i, 2, :]
    sample["images"] = out
    sample["lidar2img"] = l2i
    sample["img_flip"] = True
    return sample
