"""Width-major bidirectional LSTM — component C10 (SURVEY.md §2).

The reference rides cuDNN's fused LSTM; the TPU rebuild gets its speed a
different way (SURVEY.md §7 hard-part #3):

- the input projection for ALL timesteps is hoisted out of the recurrence
  into ONE large matmul ``[B*T, D] @ [D, 4H]`` that the MXU tiles at full
  utilization — only the hidden-hidden matmul ``[B, H] @ [H, 4H]`` stays
  inside the ``lax.scan``;
- the 4 gates are fused into a single weight matrix (one MXU issue per
  step instead of four);
- variable widths are handled by CARRY FREEZING: when a timestep is
  padding for a sample, its (h, c) pass through unchanged. For the
  backward direction the sequence is flipped, so padding is at the front
  and the zero initial carry rides through it until real pixels begin —
  this yields exactly the same states as packed sequences in torch
  (verified against torch.nn.LSTM in tests/test_model.py);
- matmuls run in the compute dtype (bf16 on TPU) with f32 accumulation;
  the (h, c) carry stays f32 for recurrence stability.

Gate layout follows the torch convention (i, f, g, o) so weights are
directly comparable with the torch.nn.LSTM oracle. Forget-gate bias is
initialized to +1.

A fused Pallas step kernel (ops/lstm_pallas.py) can replace
``_recurrence`` without touching this API.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _lstm_step(wh, dtype, carry, inp):
    h, c = carry  # [B, H] f32
    xw_t, m_t = inp  # [B, 4H] f32, [B] bool
    gates = xw_t + jnp.dot(
        h.astype(dtype), wh, preferred_element_type=jnp.float32
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    m = m_t[:, None]
    h_new = jnp.where(m, h_new, h)
    c_new = jnp.where(m, c_new, c)
    return (h_new, c_new), h_new


def lstm_layer(
    x: jax.Array,  # [B, T, D]
    mask: jax.Array,  # [B, T] bool
    wx: jax.Array,  # [D, 4H]
    wh: jax.Array,  # [H, 4H]
    b: jax.Array,  # [4H]
    *,
    reverse: bool = False,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """One directional masked LSTM pass. Returns [B, T, H] f32 states
    (states at padded positions repeat the last valid state; downstream
    consumers mask by ``mask``)."""
    B, T, _ = x.shape
    H = wh.shape[0]
    # Hoisted input projection: one MXU-sized matmul for the whole sequence.
    xw = (
        jnp.dot(x.astype(dtype), wx.astype(dtype), preferred_element_type=jnp.float32)
        + b.astype(jnp.float32)
    )
    xw = jnp.swapaxes(xw, 0, 1)  # [T, B, 4H] time-major for scan
    m = jnp.swapaxes(mask, 0, 1)  # [T, B]
    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)
    step = partial(_lstm_step, wh.astype(dtype), dtype)
    _, ys = jax.lax.scan(step, (h0, c0), (xw, m), reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)  # [B, T, H]


def _resolve_impl(impl: str) -> str:
    """auto | scan | pallas | pallas_interpret (the latter runs the fused
    kernels in Pallas interpret mode — CPU-runnable, used to exercise the
    fast path under virtual multi-device meshes in tests/dryruns)."""
    if impl != "auto":
        return impl
    # The fused Pallas recurrence targets TPU (the axon platform is a
    # tunneled TPU); everything else uses the scan path.
    return "pallas" if jax.default_backend() in ("tpu", "axon") else "scan"


class BLSTMStack(nn.Module):
    """Stacked bidirectional LSTM over the width axis.

    Output is [B, T, 2H] f32 (forward ++ backward states). Dropout is
    applied between layers (not after the last), as in the reference [M].

    ``impl``: "scan" (lax.scan oracle path), "pallas" (fused kernel,
    ops/lstm_pallas.py), or "auto" (pallas on TPU).
    """

    hidden: int = 512
    layers: int = 2
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    impl: str = "auto"

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: jax.Array, *, train: bool
    ) -> jax.Array:
        H = self.hidden
        impl = _resolve_impl(self.impl)
        use_pallas = impl.startswith("pallas")
        interpret = impl == "pallas_interpret"
        if use_pallas:
            # The fused-kernel stack runs TIME-MAJOR end to end: one
            # [B,T]<->[T,B] transpose pair per stack (here and at return)
            # instead of one per layer-direction — the per-layer xw/ys
            # transposes were measurable HBM passes at production shapes.
            x = jnp.swapaxes(x, 0, 1)  # [T, B, D]
            tmask = jnp.swapaxes(mask, 0, 1)  # [T, B]

        def bias_init(key, shape, dtype):
            # forget-gate slice gets +1
            bias = jnp.zeros(shape, dtype)
            return bias.at[H : 2 * H].set(1.0)

        for layer in range(self.layers):
            d_in = x.shape[-1]
            params = {}
            for direction in ("fwd", "bwd"):
                prefix = f"l{layer}_{direction}"
                params[direction] = (
                    self.param(
                        f"{prefix}_wx",
                        nn.initializers.xavier_uniform(),
                        (d_in, 4 * H),
                        self.param_dtype,
                    ),
                    self.param(
                        f"{prefix}_wh",
                        nn.initializers.orthogonal(),
                        (H, 4 * H),
                        self.param_dtype,
                    ),
                    self.param(f"{prefix}_b", bias_init, (4 * H,),
                               self.param_dtype),
                )
            if use_pallas:
                # Two single-direction fused kernels. (A direction-stacked
                # variant — one grid for both directions — measured SLOWER
                # on chip: 3427 vs 4172 train lines/s/chip; Mosaic lowers
                # the dir-batched dot_general with costly relayouts. It is
                # quarantined in experiments/lstm_bi_stacked.py.)
                from ..ops.lstm_pallas import lstm_layer_pallas

                x = jnp.concatenate(
                    [
                        lstm_layer_pallas(x, tmask, *params["fwd"],
                                          reverse=False, dtype=self.dtype,
                                          interpret=interpret,
                                          time_major=True),
                        lstm_layer_pallas(x, tmask, *params["bwd"],
                                          reverse=True, dtype=self.dtype,
                                          interpret=interpret,
                                          time_major=True),
                    ],
                    axis=-1,
                )
            else:
                x = jnp.concatenate(
                    [
                        lstm_layer(x, mask, *params["fwd"], reverse=False,
                                   dtype=self.dtype),
                        lstm_layer(x, mask, *params["bwd"], reverse=True,
                                   dtype=self.dtype),
                    ],
                    axis=-1,
                )  # [B, T, 2H]
            if self.dropout > 0 and layer < self.layers - 1:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if use_pallas:
            x = jnp.swapaxes(x, 0, 1)  # back to [B, T, 2H]
        return x
