"""On-device deskew — the last item of the north-star preprocess chain
(BASELINE.json: "grayscale, deskew, height-normalization, width-bucketed
padding ... fused into Pallas/XLA kernels executed on-device").

Same estimator as the host prep-time oracle (data/transforms.py
estimate_skew): score a static fan of candidate angles by the variance
of the ink row-profile, pick the argmax per sample. Two device-shaped
choices, both documented divergences from the host PIL path:

- candidate profiles come from a VERTICAL SHEAR (y' = y + (x-cx)tanθ)
  rather than a true rotation — for the ±5° line-skew regime the row
  profile of the shear matches the rotation's to first order, and the
  shear needs only one clipped gather per angle (no resampling grid);
- the correction applied is the inverse shear with bilinear
  interpolation along H and background fill, NOT a rotate-with-expand:
  static shapes forbid growing the canvas, and a vertical shear
  preserves width exactly (the routed bucket stays valid).

Host deskew (rotate) remains the prep-time oracle; the parity test
asserts FUNCTIONAL equivalence — a skewed line decodes like its
unskewed original — not pixel equality.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

# Candidate fan matching the host estimator's defaults.
MAX_ANGLE_DEG = 5.0
NUM_ANGLES = 21


def _angles() -> jnp.ndarray:
    return jnp.asarray(
        [math.tan(math.radians(a))
         for a in [-MAX_ANGLE_DEG + i * (2 * MAX_ANGLE_DEG) /
                   (NUM_ANGLES - 1) for i in range(NUM_ANGLES)]],
        jnp.float32,
    )


def estimate_skew_tan(
    images: jax.Array,  # [B, H, W] uint8 (255 = background)
    widths: jax.Array,  # [B] true widths
) -> jax.Array:
    """Per-sample tan(skew angle), chosen from the static candidate fan
    by maximum row-profile variance of the sheared ink image."""
    B, H, W = images.shape
    ink = (255.0 - images.astype(jnp.float32))
    col_mask = (jnp.arange(W)[None, :] < widths[:, None]).astype(jnp.float32)
    ink = ink * col_mask[:, None, :]
    x = jnp.arange(W, dtype=jnp.float32)[None, :] - (
        widths[:, None].astype(jnp.float32) - 1.0
    ) / 2.0  # [B, W] centered columns
    ys = jnp.arange(H, dtype=jnp.float32)

    def score_one(tan_a):
        # profile[b, y] = sum_x ink[b, y + x*tan, x] (nearest row, clipped
        # rows contribute 0 like the host's fillcolor=0 ink rotation)
        src = ys[None, :, None] + x[:, None, :] * tan_a  # [B, H, W]
        idx = jnp.clip(jnp.round(src).astype(jnp.int32), 0, H - 1)
        inb = (src >= -0.5) & (src <= H - 0.5)
        gathered = jnp.take_along_axis(ink, idx, axis=1)
        profile = jnp.sum(jnp.where(inb, gathered, 0.0), axis=2)  # [B, H]
        return jnp.var(profile, axis=1)  # [B]

    scores = jax.lax.map(score_one, _angles())  # [A, B]
    best = jnp.argmax(scores, axis=0)  # [B]
    return jnp.take(_angles(), best)


def shear_deskew(
    images: jax.Array,  # [B, H, W] uint8
    widths: jax.Array,  # [B]
    tan_theta: jax.Array,  # [B] from estimate_skew_tan
) -> jax.Array:
    """Apply the inverse vertical shear with bilinear interpolation along
    H; background (255) fills rows sheared in from outside. uint8 out."""
    B, H, W = images.shape
    img_f = images.astype(jnp.float32)
    x = jnp.arange(W, dtype=jnp.float32)[None, :] - (
        widths[:, None].astype(jnp.float32) - 1.0
    ) / 2.0
    ys = jnp.arange(H, dtype=jnp.float32)
    src = ys[None, :, None] + x[:, None, :] * tan_theta[:, None, None]
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, H - 1)
    hi = jnp.clip(lo + 1, 0, H - 1)
    frac = src - lo.astype(jnp.float32)
    v = (jnp.take_along_axis(img_f, lo, axis=1) * (1.0 - frac)
         + jnp.take_along_axis(img_f, hi, axis=1) * frac)
    inb = (src >= 0.0) & (src <= H - 1.0)
    out = jnp.where(inb, v, 255.0)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def device_deskew(
    images: jax.Array, widths: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Estimate + correct in one traceable step. Returns (deskewed uint8
    [B, H, W], tan_theta [B]). Samples whose best angle is the fan's
    near-zero bin pass through numerically unchanged (the applied shear
    is identically zero there, matching the host's |angle|<0.25° skip)."""
    tan_theta = estimate_skew_tan(images, widths)
    # snap the near-zero bin to exactly 0 so the no-skew path is identity
    tan_theta = jnp.where(
        jnp.abs(tan_theta) < math.tan(math.radians(0.25)), 0.0, tan_theta
    )
    return shear_deskew(images, widths, tan_theta), tan_theta
