"""CTC oracle tests: pure-jax ctc_loss vs torch.nn.CTCLoss (values AND
gradients), per SURVEY.md §4 "numerical oracles"."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vistaocr_tpu.ops.ctc import ctc_loss, mean_ctc_loss


def _random_case(rng, B, T, K, L, min_T=None, min_L=0):
    """Random log-probs + labels with variable lengths."""
    logits = rng.normal(0, 2.0, (B, T, K)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    input_lengths = rng.integers(min_T or max(1, T // 2), T + 1, B).astype(np.int32)
    label_lengths = np.zeros(B, np.int32)
    labels = np.zeros((B, L), np.int32)
    for b in range(B):
        max_l = min(L, input_lengths[b])  # feasible
        lo = min(min_L, max_l)
        label_lengths[b] = rng.integers(lo, max_l + 1)
        labels[b, : label_lengths[b]] = rng.integers(1, K, label_lengths[b])
    return np.asarray(log_probs), input_lengths, labels, label_lengths


def _torch_ctc(log_probs, input_lengths, labels, label_lengths):
    import torch

    lp = torch.from_numpy(np.asarray(log_probs)).permute(1, 0, 2)  # [T, B, K]
    lp.requires_grad_(True)
    loss = torch.nn.CTCLoss(blank=0, reduction="none", zero_infinity=False)(
        lp,
        torch.from_numpy(labels),
        torch.from_numpy(input_lengths),
        torch.from_numpy(label_lengths),
    )
    loss.sum().backward()
    return loss.detach().numpy(), lp.grad.permute(1, 0, 2).numpy()


class TestCtcVsTorch:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_values_match(self, seed):
        rng = np.random.default_rng(seed)
        lp, il, lab, ll = _random_case(rng, B=5, T=20, K=7, L=9)
        ours = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(il),
                                   jnp.asarray(lab), jnp.asarray(ll)))
        ref, _ = _torch_ctc(lp, il, lab, ll)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)

    def test_gradients_match_wrt_logits(self):
        """Grad parity must be checked in LOGIT space: torch.nn.CTCLoss's
        backward assumes its input came from log_softmax and returns the
        logit-space gradient (folded Jacobian), so raw log-prob grads are
        not comparable. Training differentiates through log_softmax anyway,
        which is exactly this composition."""
        import torch

        rng = np.random.default_rng(3)
        B, T, K, L = 4, 15, 6, 6
        logits = rng.normal(0, 2.0, (B, T, K)).astype(np.float32)
        il = np.array([11, 11, 8, 14], np.int32)
        ll = np.array([1, 4, 1, 5], np.int32)
        lab = np.zeros((B, L), np.int32)
        for b in range(B):
            lab[b, : ll[b]] = rng.integers(1, K, ll[b])

        def total(logits_):
            lp = jax.nn.log_softmax(logits_, axis=-1)
            return jnp.sum(ctc_loss(lp, jnp.asarray(il), jnp.asarray(lab),
                                    jnp.asarray(ll)))

        ours_grad = np.asarray(jax.grad(total)(jnp.asarray(logits)))

        tl = torch.from_numpy(logits.copy()).requires_grad_(True)
        lp = torch.nn.functional.log_softmax(tl, dim=-1).permute(1, 0, 2)
        loss = torch.nn.CTCLoss(blank=0, reduction="sum")(
            lp, torch.from_numpy(lab), torch.from_numpy(il), torch.from_numpy(ll))
        loss.backward()
        np.testing.assert_allclose(ours_grad, tl.grad.numpy(), atol=1e-4, rtol=1e-3)

    def test_repeated_labels(self):
        """Repeats exercise the skip-transition ban (l[k] == l[k-2])."""
        lp = np.log(np.full((1, 8, 3), 1 / 3, np.float32))
        labels = np.array([[1, 1, 2, 2]], np.int32)
        ours = np.asarray(ctc_loss(jnp.asarray(lp), jnp.array([8]),
                                   jnp.asarray(labels), jnp.array([4])))
        ref, _ = _torch_ctc(lp, np.array([8], np.int32), labels,
                            np.array([4], np.int32))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_empty_label(self):
        rng = np.random.default_rng(4)
        lp = np.asarray(jax.nn.log_softmax(
            jnp.asarray(rng.normal(0, 1, (2, 6, 4)).astype(np.float32)), -1))
        labels = np.zeros((2, 3), np.int32)
        labels[1, :2] = [1, 2]
        il = np.array([6, 6], np.int32)
        ll = np.array([0, 2], np.int32)
        ours = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(il),
                                   jnp.asarray(lab := labels), jnp.asarray(ll)))
        ref, _ = _torch_ctc(lp, il, labels, ll)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_length_masking_equals_truncation(self):
        """Loss with input_length=t over padded T must equal the loss over
        the physically truncated array (static-shape masking parity)."""
        rng = np.random.default_rng(5)
        lp, _, lab, ll = _random_case(rng, B=3, T=20, K=5, L=5)
        il = np.array([12, 17, 20], np.int32)
        padded = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(il),
                                     jnp.asarray(lab), jnp.asarray(ll)))
        for b in range(3):
            alone = np.asarray(ctc_loss(
                jnp.asarray(lp[b : b + 1, : il[b]]), jnp.asarray(il[b : b + 1]),
                jnp.asarray(lab[b : b + 1]), jnp.asarray(ll[b : b + 1])))
            np.testing.assert_allclose(padded[b], alone[0], atol=1e-4)

    def test_infeasible_is_huge(self):
        lp = np.log(np.full((1, 2, 3), 1 / 3, np.float32))
        loss = np.asarray(ctc_loss(jnp.asarray(lp), jnp.array([2]),
                                   jnp.asarray(np.array([[1, 2, 1]], np.int32)),
                                   jnp.array([3])))
        assert loss[0] > 1e20  # no valid alignment

    def test_grad_no_nans_on_infeasible(self):
        lp = jnp.asarray(np.log(np.full((1, 2, 3), 1 / 3, np.float32)))

        def f(lp_):
            return jnp.sum(ctc_loss(lp_, jnp.array([2]),
                                    jnp.asarray(np.array([[1, 2, 1]], np.int32)),
                                    jnp.array([3])))

        g = np.asarray(jax.grad(f)(lp))
        assert np.isfinite(g).all()

    def test_mean_loss_weights(self):
        rng = np.random.default_rng(6)
        lp, il, lab, ll = _random_case(rng, B=4, T=10, K=5, L=4, min_L=1)
        w = jnp.array([1.0, 1.0, 0.0, 0.0])
        m = mean_ctc_loss(jnp.asarray(lp), jnp.asarray(il), jnp.asarray(lab),
                          jnp.asarray(ll), sample_weights=w)
        per = ctc_loss(jnp.asarray(lp), jnp.asarray(il), jnp.asarray(lab),
                       jnp.asarray(ll))
        np.testing.assert_allclose(float(m), float((per[0] + per[1]) / 2), rtol=1e-6)

    def test_jit_and_vmap_compatible(self):
        rng = np.random.default_rng(7)
        lp, il, lab, ll = _random_case(rng, B=3, T=12, K=5, L=4)
        jitted = jax.jit(ctc_loss)
        np.testing.assert_allclose(
            np.asarray(jitted(jnp.asarray(lp), jnp.asarray(il),
                              jnp.asarray(lab), jnp.asarray(ll))),
            np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(il),
                                jnp.asarray(lab), jnp.asarray(ll))),
            atol=1e-6,
        )
