"""Pallas CTC vs the pure-jax scan oracle (values + gradients), interpret
mode (SURVEY.md §4). The oracle itself is pinned to torch.nn.CTCLoss in
tests/test_ctc.py, so agreement here chains to an independent reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vistaocr_tpu.ops.ctc import ctc_loss
from vistaocr_tpu.ops.ctc_pallas import ctc_loss_pallas


def _case(rng, B, T, K, L, min_T=None):
    logits = rng.normal(0, 2.0, (B, T, K)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    il = rng.integers(min_T or max(1, T // 2), T + 1, B).astype(np.int32)
    ll = np.zeros(B, np.int32)
    labels = np.zeros((B, L), np.int32)
    for b in range(B):
        ll[b] = rng.integers(0, min(L, il[b]) + 1)
        labels[b, : ll[b]] = rng.integers(1, K, ll[b])
    return lp, il, labels, ll


def _pallas(lp, il, labels, ll):
    return ctc_loss_pallas(
        jnp.asarray(lp), jnp.asarray(il), jnp.asarray(labels), jnp.asarray(ll),
        0, True,  # blank, interpret
    )


def _oracle(lp, il, labels, ll):
    return ctc_loss(jnp.asarray(lp), jnp.asarray(il), jnp.asarray(labels),
                    jnp.asarray(ll))


class TestValues:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_oracle(self, seed):
        rng = np.random.default_rng(seed)
        lp, il, labels, ll = _case(rng, B=8, T=20, K=7, L=9)
        np.testing.assert_allclose(
            np.asarray(_pallas(lp, il, labels, ll)),
            np.asarray(_oracle(lp, il, labels, ll)),
            atol=2e-5, rtol=2e-5,
        )

    def test_repeats_and_empty(self):
        lp = np.log(np.full((2, 8, 3), 1 / 3, np.float32))
        labels = np.array([[1, 1, 2, 2], [0, 0, 0, 0]], np.int32)
        il = np.array([8, 8], np.int32)
        ll = np.array([4, 0], np.int32)
        np.testing.assert_allclose(
            np.asarray(_pallas(lp, il, labels, ll)),
            np.asarray(_oracle(lp, il, labels, ll)),
            atol=2e-5,
        )

    def test_large_alphabet_padding(self):
        """K and S both cross lane boundaries."""
        rng = np.random.default_rng(5)
        lp, il, labels, ll = _case(rng, B=4, T=12, K=200, L=70)
        np.testing.assert_allclose(
            np.asarray(_pallas(lp, il, labels, ll)),
            np.asarray(_oracle(lp, il, labels, ll)),
            atol=5e-5, rtol=5e-5,
        )


class TestGradients:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_grads_match_oracle_autodiff(self, seed):
        rng = np.random.default_rng(seed)
        lp, il, labels, ll = _case(rng, B=5, T=15, K=6, L=6)
        w = rng.normal(0, 1, (5,)).astype(np.float32)  # random cotangents

        def f_pallas(lp_):
            return jnp.sum(ctc_loss_pallas(
                lp_, jnp.asarray(il), jnp.asarray(labels), jnp.asarray(ll),
                0, True) * jnp.asarray(w))

        def f_oracle(lp_):
            return jnp.sum(_oracle_j(lp_) * jnp.asarray(w))

        def _oracle_j(lp_):
            return ctc_loss(lp_, jnp.asarray(il), jnp.asarray(labels),
                            jnp.asarray(ll))

        gp = np.asarray(jax.grad(f_pallas)(jnp.asarray(lp)))
        go = np.asarray(jax.grad(f_oracle)(jnp.asarray(lp)))
        np.testing.assert_allclose(gp, go, atol=2e-5, rtol=1e-4)

    def test_grads_through_log_softmax(self):
        """The composition used in training."""
        rng = np.random.default_rng(3)
        B, T, K, L = 3, 10, 5, 4
        logits = rng.normal(0, 1.5, (B, T, K)).astype(np.float32)
        il = np.array([10, 8, 5], np.int32)
        labels = np.zeros((B, L), np.int32)
        ll = np.array([3, 2, 1], np.int32)
        for b in range(B):
            labels[b, : ll[b]] = rng.integers(1, K, ll[b])

        def f(impl):
            def loss(lg):
                lp = jax.nn.log_softmax(lg, axis=-1)
                if impl == "pallas":
                    per = ctc_loss_pallas(lp, jnp.asarray(il),
                                          jnp.asarray(labels), jnp.asarray(ll),
                                          0, True)
                else:
                    per = ctc_loss(lp, jnp.asarray(il), jnp.asarray(labels),
                                   jnp.asarray(ll))
                return jnp.mean(per)
            return np.asarray(jax.grad(loss)(jnp.asarray(logits)))

        np.testing.assert_allclose(f("pallas"), f("oracle"), atol=2e-5, rtol=1e-4)

    def test_grad_finite_on_infeasible(self):
        lp = jnp.asarray(np.log(np.full((1, 2, 3), 1 / 3, np.float32)))

        def f(lp_):
            return jnp.sum(ctc_loss_pallas(
                lp_, jnp.array([2]), jnp.asarray(np.array([[1, 2, 1]], np.int32)),
                jnp.array([3]), 0, True))

        g = np.asarray(jax.grad(f)(lp))
        assert np.isfinite(g).all()
