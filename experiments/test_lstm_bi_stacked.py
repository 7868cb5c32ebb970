"""Parity tests for the quarantined direction-stacked BLSTM experiment
(experiments/lstm_bi_stacked.py) vs two single-direction scan passes.

Run directly: python -m pytest experiments/test_lstm_bi_stacked.py -q
(Not collected by the product suite; the kernel is measured-and-rejected.)
"""

import pathlib
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).parent))

from vistaocr_tpu.models.blstm import lstm_layer


def _case(seed, B=8, T=12, D=16, H=16):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (B, T, D)).astype(np.float32)
    wx = rng.normal(0, 0.3, (D, 4 * H)).astype(np.float32)
    wh = rng.normal(0, 0.3, (H, 4 * H)).astype(np.float32)
    b = rng.normal(0, 0.1, (4 * H,)).astype(np.float32)
    lengths = rng.integers(1, T + 1, B)
    lengths[0] = T
    mask = np.arange(T)[None, :] < lengths[:, None]
    return (jnp.asarray(x), jnp.asarray(mask), jnp.asarray(wx),
            jnp.asarray(wh), jnp.asarray(b))

class TestBidirStacked:
    """Direction-stacked kernel vs two single-direction passes."""

    @pytest.mark.parametrize("seed", [0, 1])
    def test_forward_matches(self, seed):
        x, mask, wx_f, wh_f, b_f = _case(seed)
        _, _, wx_b, wh_b, b_b = _case(seed + 100)
        from lstm_bi_stacked import bilstm_layer_pallas

        ours = bilstm_layer_pallas(x, mask, wx_f, wh_f, b_f, wx_b, wh_b, b_b,
                                   interpret=True)
        ref_f = lstm_layer(x, mask, wx_f, wh_f, b_f)
        ref_b = lstm_layer(x, mask, wx_b, wh_b, b_b, reverse=True)
        ref = jnp.concatenate([ref_f, ref_b], axis=-1)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_grads_match(self):
        x, mask, wx_f, wh_f, b_f = _case(3)
        _, _, wx_b, wh_b, b_b = _case(103)
        from lstm_bi_stacked import bilstm_layer_pallas

        rng = np.random.default_rng(7)
        H = wh_f.shape[0]
        proj = jnp.asarray(rng.normal(0, 1, x.shape[:2] + (2 * H,)).astype(np.float32))
        m = mask.astype(jnp.float32)[..., None]

        def loss_bi(x_, wx_f_, wh_f_, b_f_, wx_b_, wh_b_, b_b_):
            ys = bilstm_layer_pallas(x_, mask, wx_f_, wh_f_, b_f_,
                                     wx_b_, wh_b_, b_b_, interpret=True)
            return jnp.sum(ys * proj * m)

        def loss_ref(x_, wx_f_, wh_f_, b_f_, wx_b_, wh_b_, b_b_):
            ys = jnp.concatenate([
                lstm_layer(x_, mask, wx_f_, wh_f_, b_f_),
                lstm_layer(x_, mask, wx_b_, wh_b_, b_b_, reverse=True),
            ], axis=-1)
            return jnp.sum(ys * proj * m)

        args = (x, wx_f, wh_f, b_f, wx_b, wh_b, b_b)
        gb = jax.grad(loss_bi, argnums=tuple(range(7)))(*args)
        gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
        names = ["x", "wx_f", "wh_f", "b_f", "wx_b", "wh_b", "b_b"]
        for a, r, n in zip(gb, gr, names):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=3e-4, rtol=1e-3,
                                       err_msg=f"grad mismatch: {n}")
