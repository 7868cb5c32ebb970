"""Pallas fused LSTM vs the lax.scan oracle (SURVEY.md §4: Pallas kernels
tested interpret-mode against their oracle — the TPU analog of a
sanitizer). Values AND gradients, forward and reverse directions,
variable-width masks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vistaocr_tpu.models.blstm import lstm_layer
from vistaocr_tpu.ops.lstm_pallas import lstm_layer_pallas


def _case(seed, B=8, T=12, D=16, H=16):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (B, T, D)).astype(np.float32)
    wx = rng.normal(0, 0.3, (D, 4 * H)).astype(np.float32)
    wh = rng.normal(0, 0.3, (H, 4 * H)).astype(np.float32)
    b = rng.normal(0, 0.1, (4 * H,)).astype(np.float32)
    lengths = rng.integers(1, T + 1, B)
    lengths[0] = T  # at least one full-length sample
    mask = np.arange(T)[None, :] < lengths[:, None]
    return (jnp.asarray(x), jnp.asarray(mask), jnp.asarray(wx),
            jnp.asarray(wh), jnp.asarray(b))


class TestForward:
    @pytest.mark.parametrize("seed", [0, 1])
    @pytest.mark.parametrize("reverse", [False, True])
    def test_matches_scan_oracle(self, seed, reverse):
        x, mask, wx, wh, b = _case(seed)
        ours = lstm_layer_pallas(x, mask, wx, wh, b, reverse=reverse,
                                 interpret=True)
        ref = lstm_layer(x, mask, wx, wh, b, reverse=reverse)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_full_mask(self):
        x, _, wx, wh, b = _case(3)
        mask = jnp.ones(x.shape[:2], bool)
        ours = lstm_layer_pallas(x, mask, wx, wh, b, interpret=True)
        ref = lstm_layer(x, mask, wx, wh, b)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


class TestGradients:
    @pytest.mark.parametrize("seed", [0, 1])
    @pytest.mark.parametrize("reverse", [False, True])
    def test_grads_match_scan_autodiff(self, seed, reverse):
        x, mask, wx, wh, b = _case(seed)
        # random cotangent projection -> scalar loss; grads wrt x, wx, wh, b
        rng = np.random.default_rng(100 + seed)
        proj = jnp.asarray(
            rng.normal(0, 1, x.shape[:2] + (wh.shape[0],)).astype(np.float32)
        )
        # only valid positions contribute (padded outputs differ by design
        # between implementations in their frozen-state tails? no — both
        # freeze; still mask to mirror real usage)
        m = mask.astype(jnp.float32)[..., None]

        def loss_pallas(x_, wx_, wh_, b_):
            ys = lstm_layer_pallas(x_, mask, wx_, wh_, b_, reverse=reverse,
                                   interpret=True)
            return jnp.sum(ys * proj * m)

        def loss_scan(x_, wx_, wh_, b_):
            ys = lstm_layer(x_, mask, wx_, wh_, b_, reverse=reverse)
            return jnp.sum(ys * proj * m)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, wx, wh, b)
        gs = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(x, wx, wh, b)
        for a, r, name in zip(gp, gs, ["x", "wx", "wh", "b"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), atol=2e-4, rtol=1e-3,
                err_msg=f"grad mismatch for {name}",
            )

    def test_grads_flow_through_unmasked_tail_outputs(self):
        """Even the frozen tail states carry gradient back (they equal the
        last valid state); check no NaN and consistency with oracle."""
        x, _, wx, wh, b = _case(7)
        B, T, _ = x.shape
        mask = jnp.asarray(np.arange(T)[None, :] < 5).repeat(B, axis=0)

        def f(impl):
            def loss(x_):
                ys = impl(x_, mask, wx, wh, b)
                return jnp.sum(ys)  # includes tail positions
            return jax.grad(loss)(x)

        gp = f(lambda *a: lstm_layer_pallas(*a, interpret=True))
        gs = f(lstm_layer)
        assert np.isfinite(np.asarray(gp)).all()
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gs),
                                   atol=2e-4, rtol=1e-3)


class TestBf16Streams:
    """With dtype=bfloat16 the kernel streams xw/ys/cs/dxw through HBM in
    bf16 (carries stay f32 in VMEM). Values/grads track the f32 scan
    oracle to bf16 rounding, not 1e-5 — this pins the tolerance."""

    def test_forward_close_to_oracle(self):
        x, mask, wx, wh, b = _case(0)
        ours = lstm_layer_pallas(x, mask, wx, wh, b, dtype=jnp.bfloat16,
                                 interpret=True)
        assert ours.dtype == jnp.bfloat16
        ref = lstm_layer(x, mask, wx, wh, b)
        np.testing.assert_allclose(
            np.asarray(ours, np.float32), np.asarray(ref),
            atol=3e-2, rtol=3e-2,
        )

    def test_grads_close_to_oracle(self):
        x, mask, wx, wh, b = _case(1)
        rng = np.random.default_rng(11)
        proj = jnp.asarray(
            rng.normal(0, 1, x.shape[:2] + (wh.shape[0],)).astype(np.float32))
        m = mask.astype(jnp.float32)[..., None]

        def loss(impl_kwargs):
            def f(x_, wx_, wh_, b_):
                ys = lstm_layer_pallas(x_, mask, wx_, wh_, b_, interpret=True,
                                       **impl_kwargs)
                return jnp.sum(ys.astype(jnp.float32) * proj * m)
            return jax.grad(f, argnums=(0, 1, 2, 3))(x, wx, wh, b)

        gb = loss({"dtype": jnp.bfloat16})
        gs = loss({"dtype": jnp.float32})
        for a, r, name in zip(gb, gs, ["x", "wx", "wh", "b"]):
            a = np.asarray(a, np.float32)
            r = np.asarray(r, np.float32)
            denom = max(np.abs(r).max(), 1e-3)
            assert np.abs(a - r).max() / denom < 0.08, (
                f"bf16-stream grad for {name} drifted: "
                f"{np.abs(a - r).max() / denom:.3f} rel"
            )

