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

dtype policy: xw/ys are f32 in HBM; the h@wh matmul runs with inputs cast
to ``dtype`` (bf16 in production) and f32 accumulation; (h, c) scratch
stays f32.
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
def _fwd_kernel(xw_ref, mask_ref, wh_ref, ys_ref, cs_ref, h_ref, c_ref, *, dtype):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    h = h_ref[:]
    c = c_ref[:]
    gates = xw_ref[0] + jnp.dot(
        h.astype(dtype), wh_ref[:], preferred_element_type=jnp.float32
    )
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    m = mask_ref[0, 0].astype(jnp.float32)[:, None]
    h_new = m * h_new + (1.0 - m) * h
    c_new = m * c_new + (1.0 - m) * c
    h_ref[:] = h_new
    c_ref[:] = c_new
    ys_ref[0] = h_new
    cs_ref[0] = c_new


def _lstm_fwd_pallas(
    xw: jax.Array,  # [T, B, 4H] f32 (input projections + bias)
    mask: jax.Array,  # [T, 1, B] float32 (1=valid)
    wh: jax.Array,  # [H, 4H] in compute dtype
    *,
    dtype,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    T, B, H4 = xw.shape
    H = H4 // 4
    kernel = functools.partial(_fwd_kernel, dtype=dtype)
    ys, cs = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H4), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(xw, mask, wh)
    return ys, cs


# ---------------------------------------------------------------------------
# Backward kernel (reverse-time BPTT with gate recomputation)
# ---------------------------------------------------------------------------
def _bwd_kernel(
    xw_ref, mask_ref, wh_ref, ys_prev_ref, cs_prev_ref, cs_cur_ref, dys_ref,
    dxw_ref, dwh_ref,
    dh_ref, dc_ref,
    *, dtype,
):
    """Grid runs t = T-1 .. 0 (via index_map reversal). Recomputes the gate
    activations for step t from xw_t and h_{t-1}, then backprops.

    The previous/current state rows come from the zero-padded (ys, cs)
    arrays passed twice with index maps shifted by one row (BlockSpec
    indices are in block units, so overlapping windows can't be one spec).
    """
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)

    h_prev = ys_prev_ref[0]
    c_prev = cs_prev_ref[0]
    c_t = cs_cur_ref[0]

    gates = xw_ref[0] + jnp.dot(
        h_prev.astype(dtype), wh_ref[:], preferred_element_type=jnp.float32
    )
    H = h_prev.shape[-1]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    tanh_c = jnp.tanh(c_t)

    m = mask_ref[0, 0].astype(jnp.float32)[:, None]
    dh = dh_ref[:] + dys_ref[0]  # incoming: recurrent grad + output grad
    dc = dc_ref[:]

    # Valid-step grads. Write each gate slice straight into dxw_ref to keep
    # the VMEM stack small (no [B,4H] concat temporary).
    do = dh * tanh_c
    dc_t = dc + dh * o * (1.0 - tanh_c * tanh_c)
    dxw_ref[0, :, :H] = (dc_t * g) * i * (1.0 - i) * m
    dxw_ref[0, :, H : 2 * H] = (dc_t * c_prev) * f * (1.0 - f) * m
    dxw_ref[0, :, 2 * H : 3 * H] = (dc_t * i) * (1.0 - g * g) * m
    dxw_ref[0, :, 3 * H :] = do * o * (1.0 - o) * m
    dgates = dxw_ref[0]

    # dwh += h_prev^T @ dgates, contracting the batch axis directly (no
    # materialized transpose).
    dwh_ref[:] += jax.lax.dot_general(
        h_prev.astype(dtype), dgates.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dh_{t-1} = dgates @ wh^T, contracting the 4H axis of both (no
    # materialized transpose). Through the mask: invalid steps pass dh/dc.
    dh_rec = jax.lax.dot_general(
        dgates.astype(dtype), wh_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh_ref[:] = dh_rec + (1.0 - m) * dh
    dc_ref[:] = m * (dc_t * f) + (1.0 - m) * dc


def _lstm_bwd_pallas(
    xw, mask, wh, ys, cs, dys, *, dtype, interpret: bool = False
):
    T, B, H4 = xw.shape
    H = H4 // 4
    # Prepend a zero row so block [t-1, t] exists at t=0.
    zrow = jnp.zeros((1, B, H), jnp.float32)
    ys_pad = jnp.concatenate([zrow, ys], axis=0)  # [T+1, B, H]
    cs_pad = jnp.concatenate([zrow, cs], axis=0)

    kernel = functools.partial(_bwd_kernel, dtype=dtype)
    rev = lambda k: (T - 1 - k, 0, 0)  # noqa: E731

    dxw, dwh = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H4), rev, memory_space=pltpu.VMEM),  # xw
            pl.BlockSpec((1, 1, B), rev, memory_space=pltpu.VMEM),  # mask
            pl.BlockSpec((H, H4), lambda k: (0, 0), memory_space=pltpu.VMEM),  # wh
            # padded row for real time t is t+1; prev state (t-1) sits at
            # padded row t = T-1-k, current state (t) at padded row T-k
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),  # ys_prev
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),  # cs_prev
            pl.BlockSpec((1, B, H), lambda k: (T - k, 0, 0),
                         memory_space=pltpu.VMEM),  # cs_cur
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),  # dys
        ],
        out_specs=[
            pl.BlockSpec((1, B, H4), rev, memory_space=pltpu.VMEM),  # dxw
            pl.BlockSpec((H, H4), lambda k: (0, 0), memory_space=pltpu.VMEM),  # dwh
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H4), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),  # dh carry
            pltpu.VMEM((B, H), jnp.float32),  # dc carry
        ],
        compiler_params=pltpu.CompilerParams(
            # dwh accumulator (4MB f32) + resident wh + streamed blocks
            # exceed the default 16MB scoped budget at big buckets; v5e has
            # far more physical VMEM.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xw, mask, wh, ys_pad, cs_pad, cs_pad, dys)
    return dxw, dwh


# ---------------------------------------------------------------------------
# custom_vjp wrapper — drop-in for the scan recurrence
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def lstm_recurrence_pallas(xw, mask, wh, dtype=jnp.float32, interpret=False):
    """Masked LSTM recurrence over precomputed gate inputs.

    xw: [T, B, 4H] f32; mask: [T, B] f32; wh: [H, 4H] (any float dtype).
    Returns ys: [T, B, H] f32 hidden states.
    """
    ys, _ = _lstm_fwd_pallas(
        xw, mask, wh.astype(dtype), dtype=dtype, interpret=interpret
    )
    return ys


def _fwd_rule(xw, mask, wh, dtype, interpret):
    ys, cs = _lstm_fwd_pallas(
        xw, mask, wh.astype(dtype), dtype=dtype, interpret=interpret
    )
    return ys, (xw, mask, wh, ys, cs)


def _bwd_rule(dtype, interpret, residuals, dys):
    xw, mask, wh, ys, cs = residuals
    dxw, dwh = _lstm_bwd_pallas(
        xw, mask, wh.astype(dtype), ys, cs, dys,
        dtype=dtype, interpret=interpret,
    )
    return dxw, None, dwh.astype(wh.dtype)


lstm_recurrence_pallas.defvjp(_fwd_rule, _bwd_rule)


def lstm_layer_pallas(
    x: jax.Array,  # [B, T, D]
    mask: jax.Array,  # [B, T] bool
    wx: jax.Array,  # [D, 4H]
    wh: jax.Array,  # [H, 4H]
    b: jax.Array,  # [4H]
    *,
    reverse: bool = False,
    dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for models.blstm.lstm_layer backed by the fused
    kernel. Same contract: [B, T, H] f32 states, carry frozen at padding."""
    # Hoisted input projection (one big MXU matmul), as in the scan path.
    xw = (
        jnp.dot(x.astype(dtype), wx.astype(dtype), preferred_element_type=jnp.float32)
        + b.astype(jnp.float32)
    )
    xw = jnp.swapaxes(xw, 0, 1)  # [T, B, 4H]
    m = jnp.swapaxes(mask, 0, 1).astype(jnp.float32)[:, None, :]  # [T, 1, B]
    if reverse:
        xw = jnp.flip(xw, axis=0)
        m = jnp.flip(m, axis=0)
    ys = lstm_recurrence_pallas(xw, m, wh, dtype, interpret)
    if reverse:
        ys = jnp.flip(ys, axis=0)
    return jnp.swapaxes(ys, 0, 1)
