"""On-device image preprocessing — the hot half of component C8.

BASELINE.json requires the preprocess chain (polarity, normalization,
padding semantics) to run ON DEVICE, fused by XLA into the first conv.
The host ships raw uint8 pixels (4x fewer H2D bytes than f32); everything
numeric happens here, inside the jitted step:

- polarity flip: stored lines are dark-ink-on-light-paper (transforms.py
  convention); the network sees ink as positive activation: x = (255-u)/255
- width masking: pixels at columns >= width are forced to exactly 0 (the
  background value), making padding semantics independent of what the host
  wrote in the pad region;
- optional per-image standardization over the VALID region only (masked
  mean/var), matching the reference's per-image normalize [M] while being
  correct under bucket padding.

These are elementwise + small reductions: XLA fuses them with the
following convolution, so there is no extra HBM round-trip. A Pallas
version is unnecessary — this is exactly the kind of fusion the compiler
already does well (see pallas_guide: don't hand-schedule what XLA fuses).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def preprocess_images(
    images: jax.Array,  # [B, H, W] uint8
    widths: jax.Array,  # [B] int32 true pixel widths
    *,
    standardize: bool = True,
    dtype: jnp.dtype = jnp.float32,
    eps: float = 1e-6,
) -> jax.Array:
    """uint8 line images -> normalized [B, H, W, 1] float feature maps."""
    if images.dtype != jnp.uint8:
        raise TypeError(f"expected uint8 images, got {images.dtype}")
    b, h, w = images.shape
    x = (255.0 - images.astype(jnp.float32)) * (1.0 / 255.0)  # ink=1, paper=0
    col = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), dimension=2)
    mask = (col < widths[:, None, None]).astype(jnp.float32)
    x = x * mask
    if standardize:
        n = jnp.maximum(widths.astype(jnp.float32) * h, 1.0)[:, None, None]
        mean = jnp.sum(x, axis=(1, 2), keepdims=True) / n
        var = jnp.sum(jnp.square(x - mean) * mask, axis=(1, 2), keepdims=True) / n
        x = (x - mean) * jax.lax.rsqrt(var + eps)
        x = x * mask  # padding stays exactly 0 after standardization
    return x.astype(dtype)[..., None]


def augment_images(
    x: jax.Array,  # [B, H, W, 1] preprocessed (ink-positive) images
    widths: jax.Array,  # [B]
    rng: jax.Array,
    *,
    strength: float = 1.0,
) -> jax.Array:
    """Train-time on-device degradation (C8's optional augment, run inside
    the jitted step so it costs one fused elementwise pass):

    - per-image contrast jitter: x * U[1-0.2s, 1+0.2s]
    - per-image ink-level shift of the inked region: + U[-0.1s, 0.1s]
    - additive pixel noise: N(0, 0.05s)

    The width mask is re-applied so padding stays exactly 0.
    """
    b, h, w, _ = x.shape
    k1, k2, k3 = jax.random.split(rng, 3)
    contrast = 1.0 + jax.random.uniform(
        k1, (b, 1, 1, 1), minval=-0.2, maxval=0.2
    ) * strength
    shift = jax.random.uniform(
        k2, (b, 1, 1, 1), minval=-0.1, maxval=0.1
    ) * strength
    noise = jax.random.normal(k3, x.shape) * (0.05 * strength)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), dimension=2)
    mask = (col < widths[:, None, None]).astype(x.dtype)[..., None]
    out = (x * contrast.astype(x.dtype) + shift.astype(x.dtype)
           + noise.astype(x.dtype))
    return out * mask
