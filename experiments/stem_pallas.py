"""Fused input stem: preprocess + first conv as ONE Pallas kernel.

Why: the first convolution has C_in = 1 (grayscale), which the MXU
cannot use — XLA's conv runs it at ~1 TFLOPs (5.5ms at B=512, W=256,
nearly as long as the 64->64 conv that does 40x the FLOPs). It is pure
memory traffic: read pixels, write [B,H,W,64]. The separate preprocess
pass writes another [B,H,W] float tensor first.

This kernel fuses, per batch row, entirely in VMEM:
    uint8 pixels -> polarity flip -> width mask -> masked per-image
    standardization -> 3x3 stencil x CO output channels
reading 1 byte/pixel from HBM and writing the conv output (+ the
normalized image as the backward residual) exactly once. The 9-tap
stencil is VPU work (576 MACs/pixel), far below the bandwidth bound.

Layout note (Mosaic constraint): broadcasting a [H, W] tile against a
per-channel vector must NOT create a new minor dim (that forces a lane
relayout Mosaic refuses). So the kernel keeps (H, W) in (sublanes,
lanes) and stacks channels on a MAJOR axis: weights arrive pre-shaped
[9, CO, 1, 1] and the conv output leaves as [B, CO, H, W]; the cheap
NCHW->NHWC transpose happens outside in XLA.

Backward: the input is data (no gradient), so only dK is needed — a
second kernel re-reads (xn, dout) and accumulates [9, CO] reductions in
VMEM across the batch grid.

MEASURED-AND-REJECTED: on real v5e the fused stem LOSES to XLA's conv
(10.0ms vs 5.6ms at B=512 — Mosaic's layout rules force major-axis
channel stacking and the 9-tap broadcast churns VMEM relayouts; the
backward trips a Mosaic layout assertion outright). Quarantined here so
the product package carries only product code; the plain XLA path
(vistaocr_tpu/ops/preprocess.py + lax.conv) is the oracle
(experiments/test_stem_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stem_kernel(img_ref, width_ref, k_ref, out_ref, xn_ref,
                 *, standardize, dtype, eps=1e-6):
    H = img_ref.shape[1]
    W = img_ref.shape[2]
    # Mosaic has no direct uint8->f32 cast; hop through int32.
    img = img_ref[0].astype(jnp.int32).astype(jnp.float32)  # [H, W]
    width = width_ref[0, pl.program_id(0)]
    x = (255.0 - img) * (1.0 / 255.0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), dimension=1)
    mask = (col < width).astype(jnp.float32)
    x = x * mask
    if standardize:
        n = jnp.maximum(width.astype(jnp.float32) * H, 1.0)
        mean = jnp.sum(x) / n
        var = jnp.sum(jnp.square(x - mean) * mask) / n
        x = (x - mean) * jax.lax.rsqrt(var + eps) * mask
    xn_ref[0] = x.astype(dtype)

    xp = jnp.pad(x, ((1, 1), (1, 1)))  # [H+2, W+2] f32
    CO = k_ref.shape[1]
    acc = jnp.zeros((CO, H, W), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            tap = xp[dh : dh + H, dw : dw + W]  # [H, W]
            # [CO,1,1] * [1,H,W] -> [CO,H,W]: only MAJOR-dim broadcasts.
            acc = acc + k_ref[3 * dh + dw] * tap[None, :, :]
    out_ref[0] = acc.astype(dtype)


def _stem_fwd(images, widths, kernel, *, standardize, dtype, interpret):
    B, H, W = images.shape
    CO = kernel.shape[-1]
    # [3,3,1,CO] -> [9, CO, 1, 1]: channel vector on a major axis.
    k9 = kernel.reshape(9, CO, 1, 1)
    out_nchw, xn = pl.pallas_call(
        functools.partial(_stem_kernel, standardize=standardize, dtype=dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            # full [1, B] widths vector in SMEM, indexed by program_id
            pl.BlockSpec((1, B), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((9, CO, 1, 1), lambda b: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, CO, H, W), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, CO, H, W), dtype),
            jax.ShapeDtypeStruct((B, H, W), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(images, widths.reshape(1, B).astype(jnp.int32), k9)
    out = jnp.transpose(out_nchw, (0, 2, 3, 1))  # NCHW -> NHWC (XLA side)
    return out, xn


def _dk_kernel(xn_ref, dout_ref, dk_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dk_ref[:] = jnp.zeros_like(dk_ref)

    H = xn_ref.shape[1]
    W = xn_ref.shape[2]
    xp = jnp.pad(xn_ref[0].astype(jnp.float32), ((1, 1), (1, 1)))
    dout = dout_ref[0].astype(jnp.float32)  # [CO, H, W]
    for dh in range(3):
        for dw in range(3):
            tap = xp[dh : dh + H, dw : dw + W]  # [H, W]
            # sum over (H, W) of [CO,H,W] * [1,H,W] -> [CO]
            dk_ref[3 * dh + dw, :] += jnp.sum(
                dout * tap[None, :, :], axis=(1, 2)
            )


def _stem_dk(xn, dout_nhwc, CO, *, interpret):
    B, H, W = xn.shape
    dout = jnp.transpose(dout_nhwc, (0, 3, 1, 2))  # NHWC -> NCHW
    dk9 = pl.pallas_call(
        _dk_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CO, H, W), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, CO), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, CO), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(xn, dout)
    return dk9.reshape(3, 3, 1, CO)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_stem(images, widths, kernel,
               standardize: bool = True, dtype=jnp.float32,
               interpret: bool = False):
    """uint8 [B,H,W] + widths [B] + kernel [3,3,1,CO] -> [B,H,W,CO].
    Equivalent to preprocess_images followed by a SAME 3x3 conv."""
    out, _ = _stem_fwd(images, widths, kernel,
                       standardize=standardize, dtype=dtype,
                       interpret=interpret)
    return out


def _fwd_rule(images, widths, kernel, standardize, dtype, interpret):
    out, xn = _stem_fwd(images, widths, kernel,
                        standardize=standardize, dtype=dtype,
                        interpret=interpret)
    return out, (xn, kernel.shape)


def _bwd_rule(standardize, dtype, interpret, residuals, g):
    xn, kshape = residuals
    CO = kshape[-1]
    dk = _stem_dk(xn, g, CO, interpret=interpret)
    return (None, None, dk.reshape(kshape).astype(jnp.float32))


fused_stem.defvjp(_fwd_rule, _bwd_rule)
