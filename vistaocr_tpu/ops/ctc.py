"""CTC loss, pure-jax reference implementation — component C12a.

The reference binds Baidu warp-ctc (C++/CUDA alpha-beta) [H]; the rebuild's
ground truth is this `lax.scan` log-space forward recursion, differentiated
by JAX autodiff. It is the correctness oracle for the Pallas kernel
(ops/ctc_pallas.py) and is itself validated against torch.nn.CTCLoss in
tests/test_ctc.py (independent oracle, SURVEY.md §4).

Algorithm (Graves 2006): extend the label sequence with blanks
(b, l1, b, l2, ..., b; length S = 2L+1); alpha[t, s] accumulates path
log-probability with transitions stay / advance-1 / skip-2 (skip allowed
only onto a non-blank that differs from the label two slots back).

Static shapes: labels are padded to a fixed L; frames to a fixed T.
Per-sample true lengths mask the recursion: when t >= input_length the
alpha row passes through unchanged, so the final row equals alpha at each
sample's true end — no dynamic shapes anywhere (XLA requirement).

NaN-safety: -1e30 stands in for -inf so autodiff never sees inf-inf.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


def _logsumexp3(a: jax.Array, b: jax.Array, c: jax.Array) -> jax.Array:
    # NaN-safe under autodiff: when every input is NEG_INF the untaken
    # branch must not compute log(0), so the sum is swapped for 1.0 before
    # the log (the "double where" pattern).
    m = jnp.maximum(jnp.maximum(a, b), c)
    valid = m > NEG_INF / 2
    m_safe = jnp.where(valid, m, 0.0)
    sum_exp = jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    out = m_safe + jnp.log(jnp.where(valid, sum_exp, 1.0))
    return jnp.where(valid, out, NEG_INF)


def _shift_right(x: jax.Array, k: int) -> jax.Array:
    """Shift along the last axis, filling with NEG_INF."""
    pad = jnp.full(x.shape[:-1] + (k,), NEG_INF, x.dtype)
    return jnp.concatenate([pad, x[..., :-k]], axis=-1)


def ctc_loss(
    log_probs: jax.Array,  # [B, T, K] log-softmax outputs (f32)
    input_lengths: jax.Array,  # [B] int32 valid frame counts
    labels: jax.Array,  # [B, L] int32, 0-padded, no blanks
    label_lengths: jax.Array,  # [B] int32
    blank: int = 0,
) -> jax.Array:
    """Per-sample CTC negative log-likelihood, shape [B] (f32).

    Samples whose labels cannot be emitted in the given frames
    (label_length > input_length) get NEG_INF paths -> large positive loss;
    the pipeline guarantees feasibility (BatchPipeline bucket assignment),
    so this only matters for hand-built batches.
    """
    B, T, K = log_probs.shape
    L = labels.shape[1]
    S = 2 * L + 1

    # Extended label row per sample: [B, S]
    ext = jnp.full((B, S), blank, dtype=labels.dtype)
    ext = ext.at[:, 1::2].set(labels)
    # skip-transition allowed onto s (odd) iff its label differs from the
    # label two slots back: positions 3,5,... <-> label pairs (k-1, k)
    skip = jnp.zeros((B, S), dtype=bool)
    if L > 1:
        skip = skip.at[:, 3::2].set(labels[:, 1:] != labels[:, :-1])

    # Pre-frame init: probability mass sits on a virtual start before s=0.
    alpha0 = jnp.full((B, S), NEG_INF, jnp.float32).at[:, 0].set(0.0)

    lp = jnp.swapaxes(log_probs.astype(jnp.float32), 0, 1)  # [T, B, K]
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    active = t_iota < input_lengths[None, :]  # [T, B]

    def step(alpha, inputs):
        lp_t, active_t = inputs  # [B, K], [B]
        lp_ext = jnp.take_along_axis(lp_t, ext, axis=1)  # [B, S]
        stay = alpha
        adv = _shift_right(alpha, 1)
        skp = jnp.where(skip, _shift_right(alpha, 2), NEG_INF)
        new = _logsumexp3(stay, adv, skp) + lp_ext
        new = jnp.maximum(new, NEG_INF)  # clamp accumulation
        new = jnp.where(active_t[:, None], new, alpha)
        return new, None

    alpha, _ = jax.lax.scan(step, alpha0, (lp, active))

    # Terminal states: s = 2*label_len (final blank) and 2*label_len - 1
    # (final symbol). For empty labels only the blank state exists.
    idx_last = (2 * label_lengths)[:, None]  # [B, 1]
    a_blank = jnp.take_along_axis(alpha, idx_last, axis=1)[:, 0]
    idx_sym = jnp.maximum(idx_last - 1, 0)
    a_sym = jnp.take_along_axis(alpha, idx_sym, axis=1)[:, 0]
    a_sym = jnp.where(label_lengths > 0, a_sym, NEG_INF)

    m = jnp.maximum(a_blank, a_sym)
    valid = m > NEG_INF / 2
    m_safe = jnp.where(valid, m, 0.0)
    sum_exp = jnp.exp(a_blank - m_safe) + jnp.exp(a_sym - m_safe)
    total = m_safe + jnp.log(jnp.where(valid, sum_exp, 1.0))
    total = jnp.where(valid, total, NEG_INF)
    return -total


def resolve_ctc_impl(impl: str = "auto") -> str:
    """auto | scan | pallas | pallas_interpret (interpret mode runs the
    Pallas kernels on CPU — used under virtual meshes in tests/dryruns)."""
    if impl != "auto":
        return impl
    return "pallas" if jax.default_backend() in ("tpu", "axon") else "scan"


def mean_ctc_loss(
    log_probs: jax.Array,
    input_lengths: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
    *,
    blank: int = 0,
    sample_weights: Optional[jax.Array] = None,
    label_average: bool = False,
    impl: str = "auto",  # auto | scan | pallas
) -> jax.Array:
    """Batch-reduced CTC loss for training.

    ``label_average=False`` averages per sample (warp-ctc's common usage in
    the reference era: batch-sum / batch-size [M]); True divides each
    sample's loss by its label length first (per-char loss, more stable
    across bucket widths). ``sample_weights`` masks padding duplicates.
    ``impl`` picks the scan oracle or the Pallas alpha-beta kernel
    (ops/ctc_pallas.py); auto = Pallas on TPU backends.
    """
    impl_r = resolve_ctc_impl(impl)
    if impl_r.startswith("pallas"):
        from .ctc_pallas import ctc_loss_pallas

        per = ctc_loss_pallas(
            log_probs, input_lengths, labels, label_lengths, blank,
            impl_r == "pallas_interpret",
        )
    else:
        per = ctc_loss(log_probs, input_lengths, labels, label_lengths, blank=blank)
    if label_average:
        per = per / jnp.maximum(label_lengths.astype(jnp.float32), 1.0)
    if sample_weights is None:
        return jnp.mean(per)
    w = sample_weights.astype(jnp.float32)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)
