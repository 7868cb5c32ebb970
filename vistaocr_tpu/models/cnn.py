"""CNN feature extractor — component C9 (SURVEY.md §2).

VGG-style conv-BN-ReLU blocks with pooling, as in the reference's
CnnOcrModel conv stack [H], but laid out TPU-first:

- NHWC layout throughout (XLA's preferred conv layout on TPU; the MXU
  consumes the channel axis as the contraction dim);
- channel counts are multiples of 8/128 where it matters;
- SAME padding + stride-2 pooling gives the exact frame arithmetic
  out_w = ceil(in_w / stride) pinned by ShapeContract.frames_for_width;
- compute dtype is configurable (bf16 on TPU), params stay f32.

BatchNorm note: under pjit with batch-sharded inputs, flax BatchNorm's
batch statistics are computed over the GLOBAL batch — XLA inserts the
cross-device reductions — so no axis_name plumbing is needed (unlike
pmap-era code).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ConvStageSpec:
    """One stage: N same-channel 3x3 convs followed by a pool."""

    channels: int
    num_convs: int = 2
    pool: Tuple[int, int] = (2, 2)  # (pool_h, pool_w); (1, 1) = no pool


# Flagship stack: 32-row lines -> 4-row feature maps, width stride 4.
DEFAULT_STAGES: Tuple[ConvStageSpec, ...] = (
    ConvStageSpec(64, 2, (2, 2)),
    ConvStageSpec(128, 2, (2, 2)),
    ConvStageSpec(256, 2, (2, 1)),
)


def width_stride_of(stages: Sequence[ConvStageSpec]) -> int:
    s = 1
    for st in stages:
        s *= st.pool[1]
    return s


def height_stride_of(stages: Sequence[ConvStageSpec]) -> int:
    s = 1
    for st in stages:
        s *= st.pool[0]
    return s


class ConvStack(nn.Module):
    """``skip_first=True`` omits conv0_0 (its output arrives precomputed
    from the fused input stem, ops/stem_pallas.py) but still applies the
    matching bn0_0 + relu so the parameter tree and math line up."""

    stages: Tuple[ConvStageSpec, ...] = DEFAULT_STAGES
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    skip_first: bool = False
    norm: str = "batch"  # "batch" | "none" (ablation/experiments)
    pool_impl: str = "max"  # "max" | "stride" (ablation: stride = subsample)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        """[B, H, W, C_in] -> [B, H', W', C_out]; W' = ceil(W / width_stride)."""
        x = x.astype(self.dtype)
        for si, stage in enumerate(self.stages):
            for ci in range(stage.num_convs):
                if not (self.skip_first and si == 0 and ci == 0):
                    x = nn.Conv(
                        stage.channels,
                        (3, 3),
                        padding="SAME",
                        use_bias=False,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"conv{si}_{ci}",
                    )(x)
                if self.norm == "batch":
                    x = nn.BatchNorm(
                        use_running_average=not train,
                        momentum=0.9,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"bn{si}_{ci}",
                    )(x)
                x = nn.relu(x)
            if stage.pool != (1, 1):
                if self.pool_impl == "stride":
                    x = x[:, :: stage.pool[0], :: stage.pool[1], :]
                else:
                    x = nn.max_pool(
                        x, window_shape=stage.pool, strides=stage.pool,
                        padding="SAME",
                    )
        return x

    @property
    def width_stride(self) -> int:
        return width_stride_of(self.stages)

    @property
    def height_stride(self) -> int:
        return height_stride_of(self.stages)
