"""Host-side image transforms — the offline/cheap half of component C8.

The reference chains grayscale -> scale-to-fixed-line-height (aspect
preserved) -> tensorize, with optional train-time augmentation
(SURVEY.md C8 [H-behavior]). In the rebuild the chain is split:

- PREP time (here, host): decode, grayscale, deskew, height-normalize.
  Runs once per corpus, so the online loop never touches PIL.
- STEP time (on device): uint8 -> float scaling, mean/var normalization,
  and train-time degradation live in ops/preprocess.py, fused into the
  forward pass by XLA (BASELINE.json requires the preprocess chain
  on-device).

Convention: ink is DARK on LIGHT background in the stored uint8 images
(0 = black ink, 255 = paper), matching scanned corpora. The on-device
normalizer flips polarity so ink activates positively.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from PIL import Image


def to_grayscale(img: "Image.Image | np.ndarray") -> np.ndarray:
    """Any PIL image or HxWx{1,3,4} array -> [H, W] uint8 grayscale."""
    if isinstance(img, np.ndarray):
        if img.ndim == 2:
            arr = img
        elif img.ndim == 3 and img.shape[2] in (1, 3, 4):
            arr = np.asarray(Image.fromarray(img).convert("L"))
        else:
            raise ValueError(f"unsupported array shape {img.shape}")
    else:
        arr = np.asarray(img.convert("L"))
    return arr.astype(np.uint8)


def maybe_invert(img: np.ndarray) -> np.ndarray:
    """Ensure dark-ink-on-light-paper polarity: if the image is mostly dark
    (mean < 128) it is photographic-negative; flip it."""
    if float(img.mean()) < 128.0:
        return (255 - img).astype(np.uint8)
    return img


def estimate_skew(img: np.ndarray, max_angle: float = 5.0, steps: int = 21) -> float:
    """Projection-profile deskew estimate (degrees). Rotates candidates and
    picks the angle maximizing row-profile variance — the classic cheap
    deskew for scanned text lines. Host-side, prep-time only."""
    h, w = img.shape
    if w < 8 or h < 8:
        return 0.0
    small = img
    if w > 512:  # subsample for speed; skew estimate is scale-invariant
        small = np.asarray(
            Image.fromarray(img).resize((512, max(8, int(h * 512 / w))))
        )
    ink = 255.0 - small.astype(np.float32)
    best_angle, best_score = 0.0, -1.0
    for a in np.linspace(-max_angle, max_angle, steps):
        rot = np.asarray(
            Image.fromarray(ink.astype(np.uint8)).rotate(
                float(a), resample=Image.BILINEAR, expand=False, fillcolor=0
            ),
            dtype=np.float32,
        )
        profile = rot.sum(axis=1)
        score = float(profile.var())
        if score > best_score:
            best_score, best_angle = score, float(a)
    return best_angle


def deskew(img: np.ndarray, max_angle: float = 5.0) -> np.ndarray:
    angle = estimate_skew(img, max_angle=max_angle)
    if abs(angle) < 0.25:
        return img
    return np.asarray(
        Image.fromarray(img).rotate(
            angle, resample=Image.BILINEAR, expand=True, fillcolor=255
        ),
        dtype=np.uint8,
    )


def height_normalize(
    img: np.ndarray, height: int, max_width: Optional[int] = None
) -> np.ndarray:
    """Scale [H, W] uint8 to the contract height, preserving aspect ratio
    (the reference's Scale(h=30) [M]); optionally clamp width by further
    rescaling (never truncation)."""
    h, w = img.shape
    new_w = max(1, round(w * height / h))
    if max_width is not None and new_w > max_width:
        new_w = max_width
    if (h, w) == (height, new_w):
        return img
    return np.asarray(
        Image.fromarray(img).resize((new_w, height), resample=Image.BILINEAR),
        dtype=np.uint8,
    )


def normalize_line(
    img: "Image.Image | np.ndarray",
    height: int,
    *,
    do_deskew: bool = False,
    max_width: Optional[int] = None,
) -> np.ndarray:
    """Full prep-time chain: grayscale -> polarity -> (deskew) -> height
    normalize. Output is the shard-store format: [height, W] uint8."""
    arr = to_grayscale(img)
    arr = maybe_invert(arr)
    if do_deskew:
        arr = deskew(arr)
    return height_normalize(arr, height, max_width=max_width)
