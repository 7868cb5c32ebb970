"""Fused Pallas LSTM recurrence — the cuDNN-LSTM replacement (C10/C12
native-equivalent obligation, SURVEY.md §2 native table, §7 step 6).

Why a kernel: under ``lax.scan`` each timestep is a separate XLA loop
iteration — the (h, c) carry and the weight matrix round-trip through HBM
every step, and each step pays loop overhead. Here the ENTIRE recurrence
is one ``pallas_call`` with ``grid=(T,)``:

- TPU grid steps execute SEQUENTIALLY on a core, so VMEM scratch persists
  across them: (h, c) live in VMEM for the whole sequence;
- the hidden-hidden weight block is a grid-invariant input: Pallas keeps
  it resident in VMEM instead of re-fetching per step;
- per step the kernel does ONE MXU matmul [B,H]@[H,4H] plus fused VPU
  gate math — the same shape cuDNN's fused cell issues;
- the per-frame input projections xw (precomputed outside as one big
  [B*T, D]@[D,4H] MXU matmul — see models/blstm.py) stream in per grid
  step via BlockSpec index_map, double-buffered by the pipeline;
- the backward pass is a mirror kernel (reverse grid) that recomputes
  gate activations from the saved (ys, cs) instead of storing [T,B,4H]
  activations — 4x less HBM traffic at the cost of one extra matmul,
  exactly the remat tradeoff the TPU guide prescribes;
- variable widths use the same carry-freeze semantics as the reference
  path, so this kernel is a drop-in for lstm_layer (verified to 1e-5 in
  tests/test_lstm_pallas.py, plus gradient checks against jax autodiff
  of the scan oracle).

dtype policy: the HBM streams (xw in, ys/cs residuals out, dys/dxw in the
backward) ride in the COMPUTE dtype — bf16 in production, halving the
recurrence's HBM traffic, which is what bounds it (measured: fwd time at
B=512 matches the f32 stream bytes / 819 GB/s to within noise). The
(h, c) carry and the dwh accumulator stay f32 in VMEM scratch, and all
gate math is f32, so rounding only enters where a state crosses HBM.
With dtype=float32 the streams are f32 and the kernel is bit-comparable
to the scan oracle (the parity tests run there).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------
def _fwd_kernel(xw_ref, mask_ref, wh_ref, *out_and_scratch, dtype, unroll,
                save_cell, reverse=False):
    if save_cell:
        ys_ref, cs_ref, h_ref, c_ref = out_and_scratch
    else:
        ys_ref, h_ref, c_ref = out_and_scratch
        cs_ref = None
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    h = h_ref[:]
    c = c_ref[:]
    wh = wh_ref[:]
    H = h.shape[-1]
    # ``unroll`` timesteps per grid step: the recurrent matmul is small, so
    # per-step block swaps dominate at U=1.
    #
    # ``reverse``: the grid walks time blocks back-to-front (reversed
    # BlockSpec index maps) and this loop walks frames within the block
    # back-to-front — the kernel IS the time flip, so the caller never
    # materializes flipped copies of x/ys (each flip was a full HBM
    # read+write pass over the layer's largest tensors).
    for u in (reversed(range(unroll)) if reverse else range(unroll)):
        gates = xw_ref[u].astype(jnp.float32) + jnp.dot(
            h.astype(dtype), wh, preferred_element_type=jnp.float32
        )
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        m = mask_ref[u, 0].astype(jnp.float32)[:, None]
        h = m * h_new + (1.0 - m) * h
        c = m * c_new + (1.0 - m) * c
        ys_ref[u] = h.astype(ys_ref.dtype)
        if save_cell:
            cs_ref[u] = c.astype(cs_ref.dtype)
    h_ref[:] = h
    c_ref[:] = c


def _pick_unroll(T: int, step_bytes: int) -> int:
    """Timesteps per grid step, bounded by a VMEM budget: ``step_bytes`` is
    the total streamed bytes per timestep across ALL operands; blocks are
    double-buffered, so U * step_bytes * 2 plus weights/scratch must stay
    under the ~128MB physical VMEM. VISTAOCR_LSTM_UNROLL overrides the
    ladder's top rung (experiment knob; production default measured best
    at 4 — see docs/design.md ledger)."""
    import os

    budget = 32 * 1024 * 1024
    top = int(os.environ.get("VISTAOCR_LSTM_UNROLL", "4"))
    ladder = sorted({u for u in (top, 4, 2) if u > 1}, reverse=True)
    for u in ladder:
        if T % u == 0 and u * step_bytes <= budget:
            return u
    return 1


def _lstm_fwd_local(
    xw: jax.Array,  # [T, B, 4H] in stream dtype (input projections + bias)
    mask: jax.Array,  # [T, 1, B] float32 (1=valid)
    wh: jax.Array,  # [H, 4H] in compute dtype
    *,
    dtype,
    interpret: bool = False,
    save_cell: bool = True,
    reverse: bool = False,
) -> Tuple[jax.Array, "jax.Array | None"]:
    """``save_cell=False`` (inference path) skips writing the cell-state
    residual to HBM — it is only needed by the backward kernel. ys/cs come
    back in xw's dtype (the stream dtype). ``reverse`` runs the recurrence
    back-to-front over time IN the kernel (reversed index maps), with
    ys/cs written at their natural time positions."""
    T, B, H4 = xw.shape
    H = H4 // 4
    sdt = xw.dtype
    U = _pick_unroll(T, B * (H4 + 2 * H) * sdt.itemsize + 4 * B)
    nblk = T // U
    kernel = functools.partial(_fwd_kernel, dtype=dtype, unroll=U,
                               save_cell=save_cell, reverse=reverse)
    tmap = ((lambda t: (nblk - 1 - t, 0, 0)) if reverse
            else (lambda t: (t, 0, 0)))
    ts_spec = pl.BlockSpec((U, B, H), tmap, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((U, B, H4), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, 1, B), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[ts_spec, ts_spec] if save_cell else [ts_spec],
        out_shape=(
            [jax.ShapeDtypeStruct((T, B, H), sdt)] * (2 if save_cell else 1)
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(xw, mask, wh)
    if save_cell:
        return out[0], out[1]
    return out[0], None


@functools.lru_cache(maxsize=None)
def _fwd_op(dtype, interpret: bool, save_cell: bool, reverse: bool):
    """SPMD-partitionable forward recurrence: per-sample kernel, so each
    device runs its local batch shard (see parallel/partition.py) instead
    of GSPMD replicating the opaque pallas call after an all-gather."""
    from ..parallel.partition import batch_partitioned

    if save_cell:
        def impl(xw, mask, wh):
            return _lstm_fwd_local(
                xw, mask, wh, dtype=dtype, interpret=interpret,
                save_cell=True, reverse=reverse,
            )

        return batch_partitioned(impl, "t b g, t u b, h g -> t b h, t b h")

    def impl(xw, mask, wh):
        ys, _ = _lstm_fwd_local(
            xw, mask, wh, dtype=dtype, interpret=interpret, save_cell=False,
            reverse=reverse,
        )
        return ys

    return batch_partitioned(impl, "t b g, t u b, h g -> t b h")


def _lstm_fwd_pallas(xw, mask, wh, *, dtype, interpret=False, save_cell=True,
                     reverse=False):
    out = _fwd_op(jnp.dtype(dtype), bool(interpret), bool(save_cell),
                  bool(reverse))(xw, mask, wh)
    if save_cell:
        return out[0], out[1]
    return out, None


@functools.lru_cache(maxsize=None)
def _bwd_op(dtype, interpret: bool, reverse: bool):
    """Partitioned backward: dxw is per-sample; dwh is a SUM over the batch
    — psum'd across the batch mesh axes by the partition wrapper."""
    from ..parallel.partition import batch_partitioned

    def impl(xw, mask, wh, ys, cs, dys):
        return _lstm_bwd_local(
            xw, mask, wh, ys, cs, dys, dtype=dtype, interpret=interpret,
            reverse=reverse,
        )

    return batch_partitioned(
        impl,
        "t b g, t u b, h g, t b h, t b h, t b h -> t b g, h g",
        reduced_outputs=(1,),
    )


def _lstm_bwd_pallas(xw, mask, wh, ys, cs, dys, *, dtype, interpret=False,
                     reverse=False):
    return _bwd_op(jnp.dtype(dtype), bool(interpret), bool(reverse))(
        xw, mask, wh, ys, cs, dys
    )


# ---------------------------------------------------------------------------
# Backward kernel (reverse-time BPTT with gate recomputation)
# ---------------------------------------------------------------------------
def _bptt_frame(xw_ref, mask_ref, dys_ref, dxw_ref, wh, u,
                h_prev, c_prev, c_t, dh_carry, dc_carry, *, dtype):
    """One frame of BPTT: recompute gates from (xw, h_prev), write this
    frame's dxw gate slices in place, and return the updated
    (dh_carry, dc_carry, dwh contribution). Shared by both direction
    kernels — only the frame/block iteration order and the state-row
    alignment differ between them."""
    H = c_t.shape[-1]
    gates = xw_ref[u].astype(jnp.float32) + jnp.dot(
        h_prev.astype(dtype), wh, preferred_element_type=jnp.float32
    )
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    tanh_c = jnp.tanh(c_t)

    m = mask_ref[u, 0].astype(jnp.float32)[:, None]
    dh = dh_carry + dys_ref[u].astype(jnp.float32)
    dc = dc_carry

    # Write each gate slice straight into dxw_ref (no concat temp).
    sdt = dxw_ref.dtype
    do = dh * tanh_c
    dc_t = dc + dh * o * (1.0 - tanh_c * tanh_c)
    dxw_ref[u, :, :H] = ((dc_t * g) * i * (1.0 - i) * m).astype(sdt)
    dxw_ref[u, :, H : 2 * H] = (
        (dc_t * c_prev) * f * (1.0 - f) * m).astype(sdt)
    dxw_ref[u, :, 2 * H : 3 * H] = (
        (dc_t * i) * (1.0 - g * g) * m).astype(sdt)
    dxw_ref[u, :, 3 * H :] = (do * o * (1.0 - o) * m).astype(sdt)
    dgates = dxw_ref[u]

    # dwh += h_prev^T @ dgates (batch axis contracted, no transpose).
    dwh_c = jax.lax.dot_general(
        h_prev.astype(dtype), dgates.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # d h_prev = dgates @ wh^T (4H axes contracted). Invalid steps pass
    # dh/dc straight through.
    dh_rec = jax.lax.dot_general(
        dgates.astype(dtype), wh,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh_carry = dh_rec + (1.0 - m) * dh
    dc_carry = m * (dc_t * f) + (1.0 - m) * dc
    return dh_carry, dc_carry, dwh_c


def _bwd_kernel(
    xw_ref, mask_ref, wh_ref, ys_a_ref, ys_e_ref, cs_a_ref, cs_e_ref,
    dys_ref,
    dxw_ref, dwh_ref,
    dh_ref, dc_ref,
    *, dtype, unroll, nblk,
):
    """Grid runs blocks of ``unroll`` frames in reverse time order,
    recomputing gate activations from xw and the saved states, then
    backpropagating.

    State plumbing under unrolling: ys/cs are read UNPADDED (row r holds
    the state after frame r). Within block b0 = nblk-1-k, frame u's
    previous state is row b0*U+u-1 — covered by the aligned block for
    u > 0 and by a one-row "edge" block at row b0*U-1 for u = 0 (block
    index maps can't express overlapping windows, but a second input
    with a 1-row block can). At b0 == 0 the edge row would be row -1,
    the zero initial state: the map clamps to row 0 and the kernel
    selects zeros instead. This replaces the old concat-padded copies of
    ys/cs — two full HBM read+write passes over the layer's residuals.
    """
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)

    wh = wh_ref[:]
    dh_carry = dh_ref[:]
    dc_carry = dc_ref[:]
    dwh_acc = jnp.zeros(dwh_ref.shape, dwh_ref.dtype)
    edge = k == nblk - 1  # b0 == 0: previous state is the zero init
    for u in reversed(range(unroll)):
        if u > 0:
            h_prev = ys_a_ref[u - 1]
            c_prev = cs_a_ref[u - 1].astype(jnp.float32)
        else:
            h_prev = jnp.where(edge, jnp.zeros_like(ys_e_ref[0]),
                               ys_e_ref[0])
            c_prev = jnp.where(edge, 0.0, cs_e_ref[0].astype(jnp.float32))
        c_t = cs_a_ref[u].astype(jnp.float32)
        dh_carry, dc_carry, dwh_c = _bptt_frame(
            xw_ref, mask_ref, dys_ref, dxw_ref, wh, u,
            h_prev, c_prev, c_t, dh_carry, dc_carry, dtype=dtype,
        )
        dwh_acc += dwh_c
    dh_ref[:] = dh_carry
    dc_ref[:] = dc_carry
    dwh_ref[:] += dwh_acc


def _bwd_kernel_rev(
    xw_ref, mask_ref, wh_ref, ys_a_ref, ys_e_ref, cs_a_ref, cs_e_ref,
    dys_ref,
    dxw_ref, dwh_ref,
    dh_ref, dc_ref,
    *, dtype, unroll, nblk,
):
    """BPTT for the REVERSE-direction recurrence. The forward scan walks
    t = T-1 .. 0, so its BPTT walks t ascending: grid blocks front-to-back,
    frames within a block front-to-back, dh/dc carried from frame t to its
    scan-predecessor t+1.

    State plumbing mirrors _bwd_kernel, unpadded: the scan-predecessor
    state of frame t is row t+1 — the aligned block covers it for
    u < U-1, a one-row edge block at row (k+1)*U covers u = U-1. At
    k == nblk-1 that row would be row T, the zero initial state of the
    reverse scan: the map clamps and the kernel selects zeros."""
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)

    wh = wh_ref[:]
    dh_carry = dh_ref[:]
    dc_carry = dc_ref[:]
    dwh_acc = jnp.zeros(dwh_ref.shape, dwh_ref.dtype)
    edge = k == nblk - 1  # predecessor is the reverse scan's zero init
    for u in range(unroll):
        if u + 1 < unroll:
            h_prev = ys_a_ref[u + 1]
            c_prev = cs_a_ref[u + 1].astype(jnp.float32)
        else:
            h_prev = jnp.where(edge, jnp.zeros_like(ys_e_ref[0]),
                               ys_e_ref[0])
            c_prev = jnp.where(edge, 0.0, cs_e_ref[0].astype(jnp.float32))
        c_t = cs_a_ref[u].astype(jnp.float32)
        dh_carry, dc_carry, dwh_c = _bptt_frame(
            xw_ref, mask_ref, dys_ref, dxw_ref, wh, u,
            h_prev, c_prev, c_t, dh_carry, dc_carry, dtype=dtype,
        )
        dwh_acc += dwh_c
    dh_ref[:] = dh_carry
    dc_ref[:] = dc_carry
    dwh_ref[:] += dwh_acc


def _lstm_bwd_local(
    xw, mask, wh, ys, cs, dys, *, dtype, interpret: bool = False,
    reverse: bool = False,
):
    T, B, H4 = xw.shape
    H = H4 // 4
    sdt = xw.dtype
    U = _pick_unroll(T, B * (2 * H4 + 4 * H) * sdt.itemsize + 4 * B)
    nblk = T // U

    # Both directions read ys/cs UNPADDED: an aligned (U,B,H) block plus a
    # one-row "edge" block for the state row that falls outside it (see
    # the kernel docstrings). The old formulation concatenated zero rows
    # around ys/cs — two full HBM read+write passes over the layer's
    # largest residuals per backward.
    if reverse:
        kernel = functools.partial(_bwd_kernel_rev, dtype=dtype, unroll=U,
                                   nblk=nblk)
        blkm = lambda k: (k, 0, 0)  # noqa: E731 (block units)
        # Edge row (k+1)*U in ROW units (block shape (1,B,H)); clamped at
        # the last grid step, where the kernel selects zeros instead.
        edgem = lambda k: (jnp.minimum((k + 1) * U, T - 1), 0, 0)  # noqa: E731
    else:
        kernel = functools.partial(_bwd_kernel, dtype=dtype, unroll=U,
                                   nblk=nblk)
        blkm = lambda k: (nblk - 1 - k, 0, 0)  # noqa: E731 (block units)
        # Edge row b0*U - 1 in ROW units; clamped at b0 == 0 (zero init).
        edgem = lambda k: (  # noqa: E731
            jnp.maximum((nblk - 1 - k) * U - 1, 0), 0, 0)

    estate = pl.BlockSpec((1, B, H), edgem, memory_space=pltpu.VMEM)
    astate = pl.BlockSpec((U, B, H), blkm, memory_space=pltpu.VMEM)
    dxw, dwh = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((U, B, H4), blkm, memory_space=pltpu.VMEM),  # xw
            pl.BlockSpec((U, 1, B), blkm, memory_space=pltpu.VMEM),  # mask
            pl.BlockSpec((H, H4), lambda k: (0, 0), memory_space=pltpu.VMEM),  # wh
            astate,  # ys aligned
            estate,  # ys edge row
            astate,  # cs aligned
            estate,  # cs edge row
            pl.BlockSpec((U, B, H), blkm, memory_space=pltpu.VMEM),  # dys
        ],
        out_specs=[
            pl.BlockSpec((U, B, H4), blkm, memory_space=pltpu.VMEM),  # dxw
            pl.BlockSpec((H, H4), lambda k: (0, 0), memory_space=pltpu.VMEM),  # dwh
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H4), sdt),  # dxw (stream dtype)
            jax.ShapeDtypeStruct((H, H4), jnp.float32),  # dwh (f32 accum)
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),  # dh carry
            pltpu.VMEM((B, H), jnp.float32),  # dc carry
        ],
        compiler_params=pltpu.CompilerParams(
            # dwh accumulator (4MB f32) + resident wh + streamed blocks
            # exceed the default 16MB scoped budget at big buckets; v5e has
            # far more physical VMEM.
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xw, mask, wh, ys, ys, cs, cs, dys)
    return dxw, dwh


# ---------------------------------------------------------------------------
# custom_vjp wrapper — drop-in for the scan recurrence
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def lstm_recurrence_pallas(xw, mask, wh, dtype=jnp.float32, interpret=False,
                           reverse=False):
    """Masked LSTM recurrence over precomputed gate inputs.

    xw: [T, B, 4H] in the stream dtype (f32 or bf16); mask: [T, 1, B] f32;
    wh: [H, 4H] (any float dtype). Returns ys: [T, B, H] hidden states in
    xw's dtype; gradients dxw come back in the same dtype.

    ``reverse`` runs the recurrence back-to-front over time INSIDE the
    kernels (reversed BlockSpec index maps) — inputs and outputs stay in
    natural time order, so callers never pay flip passes over xw/ys or
    their cotangents.
    """
    ys, _ = _lstm_fwd_pallas(
        xw, mask, wh.astype(dtype), dtype=dtype, interpret=interpret,
        save_cell=False,  # primal = inference path; bwd uses _fwd_rule
        reverse=reverse,
    )
    return ys


def _fwd_rule(xw, mask, wh, dtype, interpret, reverse):
    ys, cs = _lstm_fwd_pallas(
        xw, mask, wh.astype(dtype), dtype=dtype, interpret=interpret,
        reverse=reverse,
    )
    return ys, (xw, mask, wh, ys, cs)


def _bwd_rule(dtype, interpret, reverse, residuals, dys):
    xw, mask, wh, ys, cs = residuals
    dxw, dwh = _lstm_bwd_pallas(
        xw, mask, wh.astype(dtype), ys, cs, dys.astype(ys.dtype),
        dtype=dtype, interpret=interpret, reverse=reverse,
    )
    return dxw, None, dwh.astype(wh.dtype)


lstm_recurrence_pallas.defvjp(_fwd_rule, _bwd_rule)


def lstm_layer_pallas(
    x: jax.Array,  # [B, T, D] (or [T, B, D] when time_major=True)
    mask: jax.Array,  # [B, T] bool (or [T, B] when time_major=True)
    wx: jax.Array,  # [D, 4H]
    wh: jax.Array,  # [H, 4H]
    b: jax.Array,  # [4H]
    *,
    reverse: bool = False,
    dtype=jnp.float32,
    interpret: bool = False,
    time_major: bool = False,
) -> jax.Array:
    """Drop-in replacement for models.blstm.lstm_layer backed by the fused
    kernel. Same contract: states in ``dtype``, carry frozen at padding.

    ``time_major=True`` takes and returns [T, B, *] tensors, letting a
    stacked caller (models/blstm.BLSTMStack) keep the whole stack
    time-major and pay the [B,T]<->[T,B] transposes once per STACK
    instead of twice per layer-direction.
    """
    # Hoisted input projection (one big MXU matmul), as in the scan path;
    # accumulate f32, then stream to the kernel in the compute dtype. On
    # TPU the time-major output layout is requested IN the einsum so XLA
    # emits it from the matmul epilogue instead of a separate transpose
    # pass over the largest tensor in the layer. (The CPU backend's dot
    # thunk rejects bf16xbf16->f32 with a transposed output, so the
    # interpret-mode path keeps plain dot + swapaxes.)
    #
    # Reverse direction runs INSIDE the kernels (reversed BlockSpec index
    # maps) — no jnp.flip of x/xw/mask/ys, so the layer never pays the
    # full-tensor HBM flip passes (nor their cotangent flips in the
    # backward) the flip-based formulation cost.
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not time_major:
        x = jnp.swapaxes(x, 0, 1) if not on_tpu else x
    m = (mask if time_major else jnp.swapaxes(mask, 0, 1)).astype(
        jnp.float32)[:, None, :]  # [T, 1, B]
    if on_tpu and not time_major:
        xw = jnp.einsum(
            "btd,dg->tbg", x.astype(dtype), wx.astype(dtype),
            preferred_element_type=jnp.float32,
        )
    else:
        # here x is [T, B, D]
        if on_tpu:
            xw = jnp.einsum(
                "tbd,dg->tbg", x.astype(dtype), wx.astype(dtype),
                preferred_element_type=jnp.float32,
            )
        else:
            xw = jnp.dot(
                x.astype(dtype), wx.astype(dtype),
                preferred_element_type=jnp.float32,
            )
    xw = (xw + b.astype(jnp.float32)).astype(dtype)  # [T, B, 4H]
    ys = lstm_recurrence_pallas(xw, m, wh, dtype, interpret, reverse)
    return ys if time_major else jnp.swapaxes(ys, 0, 1)

