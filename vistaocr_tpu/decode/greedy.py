"""Greedy CTC decoding — component C13 (SURVEY.md §2).

Best path: per-frame argmax, collapse repeats, drop blanks [H-behavior].
The argmax + repeat-collapse runs ON DEVICE (vectorized, fused by XLA);
only the final variable-length token extraction happens on host. The
device part emits, per frame, either a symbol id or 0, where 0 now means
"nothing new here" (blank OR repeat OR padding) — the host just filters
zeros, so the host loop is O(T) numpy with no python-per-frame logic.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..text import Alphabet


@jax.jit
def greedy_frames(log_probs: jax.Array, frame_mask: jax.Array) -> jax.Array:
    """[B, T, K] log-probs + [B, T] mask -> [B, T] int32 of 'new symbol or 0'.

    A frame contributes its argmax symbol iff it is valid, non-blank, and
    differs from the previous frame's argmax (CTC collapse rule).
    """
    best = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)  # [B, T]
    best = jnp.where(frame_mask, best, 0)
    prev = jnp.pad(best[:, :-1], ((0, 0), (1, 0)))  # best at t-1, 0 at t=0
    fresh = (best != 0) & (best != prev) & frame_mask
    return jnp.where(fresh, best, 0)


# Fixed-point scale for the packed best-path score column (nats * 1000:
# ~1e-3-nat precision on a sum, far below decode-relevant differences).
SCORE_SCALE = 1000.0


@jax.jit
def greedy_frames_packed(
    log_probs: jax.Array, frame_mask: jax.Array
) -> jax.Array:
    """``greedy_frames`` plus a per-line best-path score, packed as one
    extra int32 column: [B, T+1] where column T holds
    ``round(sum_t max_c log p_t(c) * SCORE_SCALE)`` over valid frames.
    One array instead of two because relay-attached TPUs pay a fixed
    ~75 ms round trip PER ARRAY fetched (docs/design.md); the caller
    splits the column off and normalizes by its known frame count
    (confidence = exp(score / frames), a per-frame geometric mean)."""
    frames = greedy_frames(log_probs, frame_mask)
    best = jnp.max(log_probs, axis=-1)  # [B, T]
    s = jnp.sum(jnp.where(frame_mask, best, 0.0), axis=-1)  # [B] <= 0
    packed = jnp.round(
        jnp.clip(s * SCORE_SCALE, -2.0e9, 0.0)
    ).astype(jnp.int32)
    return jnp.concatenate([frames, packed[:, None]], axis=1)


def collapse_frames(frames_row: np.ndarray, alphabet: Alphabet) -> str:
    """One sample's device output row -> uxxxx transcript string."""
    ids = frames_row[frames_row != 0]
    return alphabet.decode(ids.tolist())


def greedy_decode(
    log_probs: jax.Array,
    frame_mask: jax.Array,
    alphabet: Alphabet,
    valid: Optional[np.ndarray] = None,
) -> List[str]:
    """Batch greedy decode -> list of uxxxx transcripts (padding-duplicate
    samples, marked by ``valid=False``, come back as None-skipped entries —
    the caller indexes by ``valid``)."""
    frames = np.asarray(greedy_frames(log_probs, frame_mask))
    out = []
    for b in range(frames.shape[0]):
        if valid is not None and not valid[b]:
            continue
        out.append(collapse_frames(frames[b], alphabet))
    return out
