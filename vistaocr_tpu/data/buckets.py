"""Static-shape contract: width-bucket ladder + frame-count arithmetic.

Component C7 (SURVEY.md §2). The reference groups lines of similar width
and pads to the max width in each batch [H-behavior], emitting true widths
so CTC sees real frame counts. XLA wants STATIC shapes, so the rebuild
replaces per-batch max-width padding with a fixed ladder of bucket widths:
every batch is padded to one of a small set of widths, each of which
compiles exactly once. The ladder is tuned so padding waste stays small
(SURVEY.md targets <10%).

The width -> CTC-frame-count formula lives here because it is the single
most parity-critical piece of arithmetic in the system (SURVEY.md §3.2,
§7 hard-part #1): CTC must be told exactly how many output frames of the
CNN correspond to real pixels. It is pinned by tests against the actual
conv-stack output shapes (tests/test_model.py).
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import List, Sequence, Tuple


def ceil_div(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass(frozen=True)
class ShapeContract:
    """The static-shape agreement between data pipeline, model and loss.

    - ``height``: fixed line height (rows) after host-side height
      normalization. 32 by default (reference used 30 [M]; 32 keeps the
      post-pool feature height a multiple of hardware sublanes).
    - ``bucket_widths``: ascending ladder of padded widths. Each width is a
      multiple of 128 for lane alignment of the downstream reshape.
    - ``width_stride``: cumulative width downsampling of the CNN stack
      (product of pool/conv strides along W). With SAME padding and
      stride-2 stages, out_w = ceil(in_w / stride) per stage, and because
      bucket widths are multiples of ``width_stride`` the composition
      collapses to exact division for the padded width.
    - ``labels_per_frame_cap``: labels are padded to
      ``min(max_label_len, frames(bucket_w))`` — CTC needs
      label_len <= frame_count to have any valid alignment.
    """

    height: int = 32
    bucket_widths: Tuple[int, ...] = (128, 256, 384, 512, 768, 1024, 1536, 2048)
    width_stride: int = 4
    max_label_len: int = 256

    def __post_init__(self):
        ws = self.bucket_widths
        if list(ws) != sorted(set(ws)):
            raise ValueError("bucket_widths must be strictly ascending")
        for w in ws:
            if w % self.width_stride:
                raise ValueError(
                    f"bucket width {w} not a multiple of width_stride={self.width_stride}"
                )

    # ---- frame arithmetic ---------------------------------------------------
    def frames_for_width(self, width) -> "int | object":
        """True pixel width -> number of valid CTC frames.

        Works on Python ints and on integer arrays (numpy/jax) alike: the
        formula is ceil(width / width_stride), matching a stack of SAME-padded
        stride-2 stages evaluated on the padded bucket width (exactly
        divisible), with the valid region being the first ceil(w/stride)
        frames. Pinned against real conv output shapes in tests.
        """
        return -(-width // self.width_stride)

    def frames_for_bucket(self, bucket_width: int) -> int:
        return bucket_width // self.width_stride

    def label_cap(self, bucket_width: int) -> int:
        return min(self.max_label_len, self.frames_for_bucket(bucket_width))

    # ---- bucket assignment --------------------------------------------------
    def bucket_for_width(self, width: int) -> int:
        """Smallest bucket index whose width >= ``width``; -1 if wider than
        the ladder (caller must rescale or reject)."""
        for i, bw in enumerate(self.bucket_widths):
            if width <= bw:
                return i
        return -1

    def clamp_width(self, width: int) -> int:
        """Widths beyond the ladder are squashed to the max bucket width
        (the image is rescaled at load time, preserving readability better
        than truncation)."""
        return min(width, self.bucket_widths[-1])

    # ---- serialization (frozen into checkpoints, C16) ------------------------
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @classmethod
    def from_json(cls, payload: str) -> "ShapeContract":
        obj = json.loads(payload)
        obj["bucket_widths"] = tuple(obj["bucket_widths"])
        return cls(**obj)


@dataclasses.dataclass(frozen=True)
class BucketSpec:
    """Resolved static shapes for one bucket — what a compiled graph sees."""

    width: int
    height: int
    frames: int
    label_len: int

    @classmethod
    def of(cls, contract: ShapeContract, bucket_idx: int) -> "BucketSpec":
        w = contract.bucket_widths[bucket_idx]
        return cls(
            width=w,
            height=contract.height,
            frames=contract.frames_for_bucket(w),
            label_len=contract.label_cap(w),
        )


def make_ladder(
    widths: Sequence[int],
    *,
    stride: int = 4,
    align: int = 128,
    max_waste: float = 0.10,
    max_width: int = 4096,
) -> Tuple[int, ...]:
    """Derive a bucket ladder from a corpus width histogram.

    Chooses ``align``-aligned rungs so that expected padding waste
    (sum of (bucket_w - w) / sum of bucket_w over the corpus) is below
    ``max_waste`` with as few rungs as possible (fewer rungs = fewer
    compiled graphs). Greedy merge from a fully aligned ladder.
    """
    if len(widths) == 0:
        raise ValueError("empty width histogram")
    lcm = align if align % stride == 0 else align * stride // math.gcd(align, stride)
    clamped = [min(int(w), max_width) for w in widths]
    # Start: one rung per occupied aligned slot.
    slots = sorted({ceil_div(w, lcm) * lcm for w in clamped})

    def waste(ladder: List[int]) -> float:
        tot_pad = tot = 0
        for w in clamped:
            bw = next(b for b in ladder if b >= w)
            tot_pad += bw - w
            tot += bw
        return tot_pad / max(tot, 1)

    ladder = list(slots)
    improved = True
    while improved and len(ladder) > 1:
        improved = False
        # Try removing the rung whose removal hurts least.
        best = None
        for i in range(len(ladder) - 1):  # last rung can't be removed
            trial = ladder[:i] + ladder[i + 1 :]
            w = waste(trial)
            if w <= max_waste and (best is None or w < best[1]):
                best = (i, w)
        if best is not None:
            ladder.pop(best[0])
            improved = True
    return tuple(ladder)
