"""On-device line height-normalization — the serve-time half of C8.

The north-star preprocess chain (BASELINE.json: grayscale, deskew,
height-normalization to fixed rows, width-bucketed padding, normalize)
runs ON DEVICE at serve time. Training corpora are height-normalized once
at prep time (data/transforms.py), but a serving request arrives at its
native height — round 2 resized it with PIL on the single host core,
inside the hot path. Here the resize is a jittable gather+matmul-free
separable filter that fuses into the per-bucket serve graph.

Filter semantics match PIL BILINEAR (data/transforms.height_normalize,
the prep-time oracle): a triangle filter whose support scales with the
downscale factor — NOT a fixed 2-tap lerp, which aliases on downscale.
For output pixel i at scale s (src/dst): center = (i+0.5)*s,
filterscale = max(s, 1), taps j weighted max(0, 1 - |j+0.5-center|/fs),
normalized over in-bounds taps. Per-sample scales are DYNAMIC (heights/
widths are data); only the tap COUNT is static, bounded by the buffer
geometry: callers guarantee raw height <= MAX_SCALE * out_h (the service
integer-pools taller images host-side, a cheap vectorized numpy op), and
the raw buffer width is <= MAX_SCALE * out_w by construction, so
TAPS = 2*MAX_SCALE + 2 covers every reachable scale on both axes.

Width arithmetic: the HOST computes each sample's normalized width
(round(w * out_h / h), the parity-pinned formula) and passes it in — the
device never rounds, so bucket routing and frame counts stay bit-equal
to the host path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Callers keep raw dims within MAX_SCALE x the output dims (the service
# host-pools taller lines by an integer factor first).
MAX_SCALE = 2
TAPS = 2 * MAX_SCALE + 2


def _axis_weights(out_size: int, scale: jax.Array, in_size_valid: jax.Array):
    """Tap indices + normalized triangle weights for one axis.
    scale: [B] f32 (src pixels per dst pixel); in_size_valid: [B] valid
    source extent (taps beyond it get zero weight).
    Returns (idx [B, out_size, TAPS] int32, w [B, out_size, TAPS] f32)."""
    B = scale.shape[0]
    i = jnp.arange(out_size, dtype=jnp.float32)  # [O]
    center = (i[None, :] + 0.5) * scale[:, None]  # [B, O]
    fs = jnp.maximum(scale, 1.0)[:, None]  # [B, 1]
    base = jnp.floor(center - fs + 0.5).astype(jnp.int32)  # first tap
    t = jnp.arange(TAPS, dtype=jnp.int32)
    idx = base[:, :, None] + t[None, None, :]  # [B, O, TAPS]
    dist = (idx.astype(jnp.float32) + 0.5 - center[:, :, None]) / fs[:, :, None]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(dist))
    inb = (idx >= 0) & (idx < in_size_valid[:, None, None])
    w = jnp.where(inb, w, 0.0)
    w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-8)
    idx = jnp.clip(idx, 0, in_size_valid[:, None, None] - 1)
    return idx, w


def resize_lines(
    raw: jax.Array,  # [B, Hr, Wr] uint8 (or float), 255-padded
    heights: jax.Array,  # [B] int32 true heights (<= Hr)
    widths: jax.Array,  # [B] int32 true raw widths (<= Wr)
    new_widths: jax.Array,  # [B] int32 host-computed normalized widths
    *,
    out_h: int,
    out_w: int,
) -> jax.Array:
    """Per-sample aspect resize of raw line crops to the contract height.
    Output [B, out_h, out_w] float32 in [0, 255]; columns >= new_widths
    are forced to 255 (paper), matching the host assembly convention."""
    B, Hr, Wr = raw.shape
    x = raw.astype(jnp.float32)
    hf = heights.astype(jnp.float32)
    wf = widths.astype(jnp.float32)
    nwf = jnp.maximum(new_widths.astype(jnp.float32), 1.0)

    # rows: scale_y = h / out_h
    idx_y, w_y = _axis_weights(out_h, hf / float(out_h), heights)
    g = jnp.take_along_axis(
        x, idx_y.reshape(B, out_h * TAPS)[:, :, None], axis=1
    ).reshape(B, out_h, TAPS, Wr)
    x = (g * w_y[:, :, :, None]).sum(axis=2)  # [B, out_h, Wr]

    # cols: scale_x = w / new_w (can differ from scale_y only when the
    # host clamped new_w to the ladder's max width)
    idx_x, w_x = _axis_weights(out_w, wf / nwf, widths)
    g = jnp.take_along_axis(
        x, idx_x.reshape(B, 1, out_w * TAPS), axis=2
    ).reshape(B, out_h, out_w, TAPS)
    x = (g * w_x[:, None, :, :]).sum(axis=3)  # [B, out_h, out_w]

    col = jax.lax.broadcasted_iota(jnp.int32, (B, out_h, out_w), dimension=2)
    return jnp.where(col < new_widths[:, None, None], x, 255.0)


def resized_to_uint8(x: jax.Array) -> jax.Array:
    """Quantize resize output exactly as PIL does (round half away from
    zero, clip) so the fused serve graph feeds preprocess_images the same
    uint8 levels the prep-time host path stores."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0).astype(jnp.uint8)


@functools.lru_cache(maxsize=None)
def pooled_geometry(out_h: int):
    """Host-side helper constants: a raw line taller than MAX_SCALE*out_h
    is integer mean-pooled by k = ceil(h / (MAX_SCALE*out_h)) before
    shipping (vectorized numpy; content-preserving box filter)."""
    return MAX_SCALE * out_h


def host_pool(img, cap: int):
    """[H, W] uint8 -> mean-pooled uint8 with height <= cap via an integer
    box filter (pads to a multiple of k with paper). Cheap numpy; only
    runs for unusually tall inputs."""
    import numpy as np

    h, w = img.shape
    if h <= cap:
        return img
    k = -(-h // cap)
    ph = -(-h // k) * k
    pw = -(-w // k) * k
    if (ph, pw) != (h, w):
        pad = np.full((ph, pw), 255, np.uint8)
        pad[:h, :w] = img
        img = pad
    pooled = img.reshape(ph // k, k, pw // k, k).mean(axis=(1, 3))
    return np.clip(np.floor(pooled + 0.5), 0, 255).astype(np.uint8)
