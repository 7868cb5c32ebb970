"""Flagship CNN-BLSTM-CTC line-OCR model — components C9-C11 assembled.

Mirrors the reference's CnnOcrModel capability (SURVEY.md §3.2):

    uint8 lines [B,H,W] --preprocess--> [B,H,W,1]
      --ConvStack--> [B,H',W',C]
      --width-major reshape--> [B, T=W', C*H']
      --bridge Linear+ReLU--> [B, T, D]
      --BLSTMStack--> [B, T, 2H]
      --head Linear--> logits [B, T, |alphabet|] (f32, even under bf16)

and returns (log_probs, frame_mask) where frame_mask[b, t] marks frames
that correspond to real pixels: t < ceil(width_b / width_stride) — the
`out_widths` arithmetic the survey flags as parity-critical (§3.2).

TPU notes: everything is NHWC; the width-major reshape is a transpose
XLA folds into the surrounding ops; the head computes in f32 so CTC sees
full-precision log-probs regardless of compute dtype.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.preprocess import preprocess_images
from .blstm import BLSTMStack
from .cnn import DEFAULT_STAGES, ConvStack, ConvStageSpec, width_stride_of


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters — serialized into every checkpoint
    (C16: snapshots are self-describing)."""

    num_classes: int  # |alphabet| incl. blank
    line_height: int = 32
    stages: Tuple[ConvStageSpec, ...] = DEFAULT_STAGES
    bridge_dim: int = 512
    lstm_hidden: int = 512
    lstm_layers: int = 2
    dropout: float = 0.1
    standardize_input: bool = True
    compute_dtype: str = "float32"  # "bfloat16" on TPU
    lstm_impl: str = "auto"  # auto | scan | pallas (see models/blstm.py)
    # "auto"/"plain" only. A fused Pallas stem was measured and REJECTED
    # (10.0ms vs XLA's 5.6ms at B=512; Mosaic layout limits) — it lives in
    # experiments/stem_pallas.py. The field stays so old checkpoints load.
    stem_impl: str = "auto"
    augment: float = 0.0  # train-time degradation strength (0 = off)
    conv_norm: str = "batch"  # "batch" | "none" (ablation knob)
    conv_pool: str = "max"  # "max" | "stride" (ablation knob)

    @property
    def width_stride(self) -> int:
        return width_stride_of(self.stages)

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["stages"] = [dataclasses.asdict(s) for s in self.stages]
        return json.dumps(d)

    @classmethod
    def from_json(cls, payload: str) -> "ModelConfig":
        d = json.loads(payload)
        d["stages"] = tuple(
            ConvStageSpec(
                channels=s["channels"],
                num_convs=s["num_convs"],
                pool=tuple(s["pool"]),
            )
            for s in d["stages"]
        )
        return cls(**d)


class CnnLstmOcr(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        images: jax.Array,  # [B, H, W] uint8
        widths: jax.Array,  # [B] int32
        *,
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        dtype = cfg.dtype

        # Input stem: preprocess + first conv (C_in=1). XLA's conv + fused
        # elementwise preprocess is the production path; a hand-fused Pallas
        # stem measured SLOWER and is quarantined in experiments/.
        c0 = cfg.stages[0].channels
        stem_kernel = self.param(
            "stem_kernel",
            nn.initializers.xavier_uniform(),
            (3, 3, 1, c0),
            jnp.float32,
        )
        if cfg.stem_impl not in ("auto", "plain"):
            raise ValueError(
                f"stem_impl={cfg.stem_impl!r}: the fused stem was rejected "
                "on measurement and moved to experiments/stem_pallas.py"
            )
        xpre = preprocess_images(
            images, widths, standardize=cfg.standardize_input, dtype=dtype
        )
        if train and cfg.augment > 0:
            from ..ops.preprocess import augment_images

            xpre = augment_images(
                xpre, widths, self.make_rng("dropout"),
                strength=cfg.augment,
            )
        x = jax.lax.conv_general_dilated(
            xpre, stem_kernel.astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dtype,
        )
        x = ConvStack(
            stages=cfg.stages, dtype=dtype, skip_first=True, name="cnn",
            norm=cfg.conv_norm, pool_impl=cfg.conv_pool,
        )(x, train=train)

        # Width-major sequence: [B, H', T, C] -> [B, T, C*H']
        b, hp, t, c = x.shape
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, t, hp * c)

        # Valid-frame arithmetic (parity-critical, SURVEY.md §3.2): the first
        # ceil(width / width_stride) frames carry real pixels.
        frames = -(-widths // cfg.width_stride)  # ceil div, [B] int32
        tpos = jax.lax.broadcasted_iota(jnp.int32, (b, t), dimension=1)
        frame_mask = tpos < frames[:, None]

        x = nn.Dense(cfg.bridge_dim, dtype=dtype, name="bridge")(x)
        x = nn.relu(x)
        if cfg.dropout > 0:
            x = nn.Dropout(cfg.dropout, deterministic=not train)(x)

        x = BLSTMStack(
            hidden=cfg.lstm_hidden,
            layers=cfg.lstm_layers,
            dropout=cfg.dropout,
            dtype=dtype,
            impl=cfg.lstm_impl,
            name="blstm",
        )(x, frame_mask, train=train)

        # Head in f32: CTC needs full-precision log-probs.
        logits = nn.Dense(
            cfg.num_classes, dtype=jnp.float32, param_dtype=jnp.float32, name="head"
        )(x.astype(jnp.float32))
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return log_probs, frame_mask

    def init_params(self, rng: jax.Array, batch: int = 2, width: Optional[int] = None):
        cfg = self.config
        w = width or cfg.width_stride * 8
        images = jnp.zeros((batch, cfg.line_height, w), jnp.uint8)
        widths = jnp.full((batch,), w, jnp.int32)
        return self.init(rng, images, widths, train=False)
