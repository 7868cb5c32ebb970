"""MEASURED-AND-REJECTED experiment: direction-stacked BLSTM grid.

Both directions of one bidirectional layer run in a SINGLE Pallas grid
(batched [2, B, *] operands), halving scan launches and letting the two
per-step matmuls pipeline inside one kernel body. On real v5e hardware it
LOSES to two single-direction kernels: 3427 vs 4172 train lines/s/chip —
Mosaic lowers the dir-batched dot_general with costly relayouts (perf
ledger, docs/design.md). Kept out of the product package so the product
path carries only product code; run its parity tests directly:

    python -m pytest experiments/test_lstm_bi_stacked.py -q
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vistaocr_tpu.ops.lstm_pallas import _pick_unroll

: both directions of one layer
# run in a SINGLE grid (batched [2, B, *] operands), halving scan launches
# and letting the two per-step matmuls pipeline inside one kernel body.
# The backward direction rides as the second batch plane with time-flipped
# inputs, so the math per plane is identical to the single-direction path.
# ---------------------------------------------------------------------------
def _bi_fwd_kernel(xw_ref, mask_ref, wh_ref, ys_ref, cs_ref, h_ref, c_ref,
                   *, dtype, unroll):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    h = h_ref[:]  # [2, B, H]
    c = c_ref[:]
    wh = wh_ref[:]  # [2, H, 4H]
    H = h.shape[-1]
    dn = (((2,), (1,)), ((0,), (0,)))  # batched: contract H, batch dir axis
    for u in range(unroll):
        gates = xw_ref[u] + jax.lax.dot_general(
            h.astype(dtype), wh, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )  # [2, B, 4H]
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H : 2 * H])
        g = jnp.tanh(gates[..., 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H :])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        m = mask_ref[u].astype(jnp.float32)[:, :, None]  # [2, B, 1]
        h = m * h_new + (1.0 - m) * h
        c = m * c_new + (1.0 - m) * c
        ys_ref[u] = h
        cs_ref[u] = c
    h_ref[:] = h
    c_ref[:] = c


def _bi_lstm_fwd(xw, mask, wh, *, dtype, interpret=False):
    """xw [T,2,B,4H] f32; mask [T,2,B] f32; wh [2,H,4H] -> (ys, cs) [T,2,B,H]."""
    T, _, B, H4 = xw.shape
    H = H4 // 4
    U = _pick_unroll(T, 4 * 2 * B * (H4 + 2 * H))
    kernel = functools.partial(_bi_fwd_kernel, dtype=dtype, unroll=U)
    ys, cs = pl.pallas_call(
        kernel,
        grid=(T // U,),
        in_specs=[
            pl.BlockSpec((U, 2, B, H4), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, 2, B), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, H4), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((U, 2, B, H), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, 2, B, H), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 2, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, 2, B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),
            pltpu.VMEM((2, B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(xw, mask, wh)
    return ys, cs


def _bi_bwd_kernel(
    xw_ref, mask_ref, wh_ref, ys_prev_ref, cs_prev_ref, cs_next_ref, dys_ref,
    dxw_ref, dwh_ref,
    dh_ref, dc_ref,
    *, dtype, unroll,
):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)

    wh = wh_ref[:]  # [2, H, 4H]
    H = dh_ref.shape[-1]
    dh_carry = dh_ref[:]  # [2, B, H]
    dc_carry = dc_ref[:]
    dwh_acc = jnp.zeros(dwh_ref.shape, dwh_ref.dtype)
    dn_fwd = (((2,), (1,)), ((0,), (0,)))
    for u in reversed(range(unroll)):
        h_prev = ys_prev_ref[u]  # [2, B, H]
        c_prev = cs_prev_ref[u]
        c_t = cs_prev_ref[u + 1] if u + 1 < unroll else cs_next_ref[0]

        gates = xw_ref[u] + jax.lax.dot_general(
            h_prev.astype(dtype), wh, dimension_numbers=dn_fwd,
            preferred_element_type=jnp.float32,
        )
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H : 2 * H])
        g = jnp.tanh(gates[..., 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H :])
        tanh_c = jnp.tanh(c_t)

        m = mask_ref[u].astype(jnp.float32)[:, :, None]
        dh = dh_carry + dys_ref[u]
        dc = dc_carry

        do = dh * tanh_c
        dc_t = dc + dh * o * (1.0 - tanh_c * tanh_c)
        dxw_ref[u, :, :, :H] = (dc_t * g) * i * (1.0 - i) * m
        dxw_ref[u, :, :, H : 2 * H] = (dc_t * c_prev) * f * (1.0 - f) * m
        dxw_ref[u, :, :, 2 * H : 3 * H] = (dc_t * i) * (1.0 - g * g) * m
        dxw_ref[u, :, :, 3 * H :] = do * o * (1.0 - o) * m
        dgates = dxw_ref[u]  # [2, B, 4H]

        # dwh[d] += h_prev[d]^T @ dgates[d]: batch the direction axis,
        # contract B.
        dwh_acc += jax.lax.dot_general(
            h_prev.astype(dtype), dgates.astype(dtype),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # dh_{t-1}[d] = dgates[d] @ wh[d]^T: contract 4H.
        dh_rec = jax.lax.dot_general(
            dgates.astype(dtype), wh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dh_carry = dh_rec + (1.0 - m) * dh
        dc_carry = m * (dc_t * f) + (1.0 - m) * dc
    dh_ref[:] = dh_carry
    dc_ref[:] = dc_carry
    dwh_ref[:] += dwh_acc


def _bi_lstm_bwd(xw, mask, wh, ys, cs, dys, *, dtype, interpret=False):
    T, _, B, H4 = xw.shape
    H = H4 // 4
    U = _pick_unroll(T, 4 * 2 * B * (2 * H4 + 4 * H))
    nblk = T // U
    zrow = jnp.zeros((1, 2, B, H), jnp.float32)
    slack = jnp.zeros((U - 1, 2, B, H), jnp.float32) if U > 1 else None
    parts = [zrow, ys] + ([slack] if slack is not None else [])
    ys_pad = jnp.concatenate(parts, axis=0)
    parts = [zrow, cs] + ([slack] if slack is not None else [])
    cs_pad = jnp.concatenate(parts, axis=0)

    kernel = functools.partial(_bi_bwd_kernel, dtype=dtype, unroll=U)
    rev = lambda k: (nblk - 1 - k, 0, 0, 0)  # noqa: E731
    rev3 = lambda k: (nblk - 1 - k, 0, 0)  # noqa: E731

    dxw, dwh = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((U, 2, B, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, 2, B), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, H4), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, 2, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, 2, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, 2, B, H), lambda k: (nblk - k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, 2, B, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((U, 2, B, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, H4), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 2, B, H4), jnp.float32),
            jax.ShapeDtypeStruct((2, H, H4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),
            pltpu.VMEM((2, B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(xw, mask, wh, ys_pad, cs_pad, cs_pad, dys)
    return dxw, dwh


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bi_recurrence_pallas(xw, mask, wh, dtype=jnp.float32, interpret=False):
    """Direction-stacked recurrence: xw [T,2,B,4H], mask [T,2,B],
    wh [2,H,4H] -> ys [T,2,B,H]. Plane 0 is forward, plane 1 holds the
    time-flipped backward stream (caller flips in/out)."""
    ys, _ = _bi_lstm_fwd(xw, mask, wh.astype(dtype), dtype=dtype,
                         interpret=interpret)
    return ys


def _bi_fwd_rule(xw, mask, wh, dtype, interpret):
    ys, cs = _bi_lstm_fwd(xw, mask, wh.astype(dtype), dtype=dtype,
                          interpret=interpret)
    return ys, (xw, mask, wh, ys, cs)


def _bi_bwd_rule(dtype, interpret, residuals, dys):
    xw, mask, wh, ys, cs = residuals
    dxw, dwh = _bi_lstm_bwd(xw, mask, wh.astype(dtype), ys, cs, dys,
                            dtype=dtype, interpret=interpret)
    return dxw, None, dwh.astype(wh.dtype)


bi_recurrence_pallas.defvjp(_bi_fwd_rule, _bi_bwd_rule)


def bilstm_layer_pallas(
    x: jax.Array,  # [B, T, D]
    mask: jax.Array,  # [B, T] bool
    wx_f, wh_f, b_f, wx_b, wh_b, b_b,
    *,
    dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """One bidirectional layer -> [B, T, 2H] (fwd ++ bwd states). Both
    input projections fuse into a single [B*T, D] @ [D, 8H] MXU matmul;
    both recurrences run in one grid."""
    B, T, D = x.shape
    H = wh_f.shape[0]
    wx_both = jnp.concatenate([wx_f, wx_b], axis=1)  # [D, 8H]
    b_both = jnp.concatenate([b_f, b_b], axis=0)  # [8H]
    xw = (
        jnp.dot(x.astype(dtype), wx_both.astype(dtype),
                preferred_element_type=jnp.float32)
        + b_both.astype(jnp.float32)
    )  # [B, T, 8H]
    xw = jnp.swapaxes(xw, 0, 1)  # [T, B, 8H]
    xw_f = xw[..., : 4 * H]
    xw_b = jnp.flip(xw[..., 4 * H :], axis=0)
    xw2 = jnp.stack([xw_f, xw_b], axis=1)  # [T, 2, B, 4H]
    m = jnp.swapaxes(mask, 0, 1).astype(jnp.float32)  # [T, B]
    m2 = jnp.stack([m, jnp.flip(m, axis=0)], axis=1)  # [T, 2, B]
    wh2 = jnp.stack([wh_f, wh_b], axis=0)  # [2, H, 4H]
    ys = bi_recurrence_pallas(xw2, m2, wh2, dtype, interpret)  # [T,2,B,H]
    ys_f = jnp.swapaxes(ys[:, 0], 0, 1)  # [B, T, H]
    ys_b = jnp.swapaxes(jnp.flip(ys[:, 1], axis=0), 0, 1)
    return jnp.concatenate([ys_f, ys_b], axis=-1)
