"""Prefix beam search + n-gram LM tests (C14).

The hard oracle: brute-force enumeration of ALL alignment paths on tiny
problems gives the exact posterior over label sequences; a wide beam must
find its argmax (SURVEY.md §7 hard-part #4 mitigation: standard algorithm
gated on exact small-case behavior)."""

import itertools
import math

import numpy as np
import pytest

import jax.numpy as jnp

from vistaocr_tpu.decode.beam import BeamConfig, beam_decode, prefix_beam_search
from vistaocr_tpu.decode.lm import ArpaLM, train_char_lm, BOS, EOS
from vistaocr_tpu.text import Alphabet, utf8_to_uxxxx


def brute_force_posterior(log_probs):
    """Exact P(label_seq) by summing all paths. log_probs: [T, K]."""
    T, K = log_probs.shape
    post = {}
    for path in itertools.product(range(K), repeat=T):
        lp = sum(log_probs[t, c] for t, c in enumerate(path))
        # collapse
        seq = []
        prev = -1
        for c in path:
            if c != 0 and c != prev:
                seq.append(c)
            prev = c
        key = tuple(seq)
        post[key] = np.logaddexp(post.get(key, -np.inf), lp)
    return post


class TestBeamVsBruteForce:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_finds_map_sequence(self, seed):
        rng = np.random.default_rng(seed)
        T, K = 5, 4
        logits = rng.normal(0, 1.5, (T, K)).astype(np.float64)
        lp = logits - np.log(np.exp(logits).sum(1, keepdims=True))
        post = brute_force_posterior(lp)
        best_seq = max(post, key=post.get)

        alpha = Alphabet.from_charset("abc")
        hyps = prefix_beam_search(
            lp.astype(np.float32), alpha,
            BeamConfig(beam_width=40, topk=3, prune_logp=-100.0),
        )
        assert hyps[0][0] == alpha.decode(best_seq)
        # score of best hypothesis ~ its exact posterior
        assert hyps[0][1] == pytest.approx(post[best_seq], abs=1e-3)

    def test_sums_repeat_paths(self):
        """'a' emitted by aa, a-, -a, a paths must be summed (prefix beams,
        not path beams)."""
        alpha = Alphabet.from_charset("ab")
        # frame probs deliberately make best PATH (blank,blank) lose to
        # the SUM of a-paths
        lp = np.log(np.array([
            [0.4, 0.35, 0.25],
            [0.4, 0.35, 0.25],
        ], np.float32))
        post = brute_force_posterior(lp.astype(np.float64))
        best_seq = max(post, key=post.get)
        hyps = prefix_beam_search(lp, alpha, BeamConfig(beam_width=20, topk=2,
                                                        prune_logp=-100.0))
        assert hyps[0][0] == alpha.decode(best_seq)


class TestBatchBeam:
    def test_matches_single_and_respects_mask(self):
        rng = np.random.default_rng(5)
        alpha = Alphabet.from_charset("abc")
        B, T, K = 2, 6, 4
        logits = rng.normal(0, 2, (B, T, K)).astype(np.float32)
        lp = np.asarray(jnp.log(jnp.exp(jnp.asarray(logits)) /
                                jnp.exp(jnp.asarray(logits)).sum(-1, keepdims=True)))
        mask = np.zeros((B, T), bool)
        mask[0, :6] = True
        mask[1, :3] = True
        hyps = beam_decode(jnp.asarray(lp), jnp.asarray(mask), alpha,
                           BeamConfig(beam_width=8, topk=3))
        solo0 = prefix_beam_search(lp[0, :6], alpha, BeamConfig(beam_width=8, topk=3))
        solo1 = prefix_beam_search(lp[1, :3], alpha, BeamConfig(beam_width=8, topk=3))
        assert hyps == [solo0[0][0], solo1[0][0]]


class TestArpaLM:
    def test_train_and_score(self):
        corpus = [utf8_to_uxxxx(s) for s in ["abab", "abab", "abba", "aab"]]
        lm = train_char_lm(corpus, order=2)
        # P(b | a) should far exceed P(a | a)
        pa = lm.logp(("u0061",), "u0062")
        pb = lm.logp(("u0061",), "u0061")
        assert pa > pb

    def test_sentence_logp_finite(self):
        lm = train_char_lm([utf8_to_uxxxx("hello world")], order=3)
        assert np.isfinite(lm.sentence_logp(utf8_to_uxxxx("hello").split()))

    def test_unseen_token_backs_off(self):
        lm = train_char_lm([utf8_to_uxxxx("aaa")], order=2)
        lp = lm.logp(("u0061",), "u007a")  # 'z' unseen
        assert np.isfinite(lp) and lp < lm.logp(("u0061",), "u0061")

    def test_arpa_roundtrip(self, tmp_path):
        lm = train_char_lm(
            [utf8_to_uxxxx(s) for s in ["abc abc", "cab", "bca bca"]], order=3
        )
        path = str(tmp_path / "test.arpa")
        lm.write_arpa(path)
        lm2 = ArpaLM.read_arpa(path)
        assert lm2.order == lm.order
        for hist in [(), ("u0061",), ("u0061", "u0062")]:
            for tok in ["u0061", "u0062", "u0063", "u0020", EOS]:
                assert lm2.logp(hist, tok) == pytest.approx(
                    lm.logp(hist, tok), abs=1e-4
                )


class TestLMFusion:
    def test_lm_steers_ambiguous_decode(self):
        """CTC slightly prefers 'ac'; a strong bigram LM trained on 'ab'
        flips the decision when alpha is large."""
        alpha = Alphabet.from_charset("abc")  # a=1, b=2, c=3
        # frames: strong 'a', then near-tie between b and c with c slightly ahead
        lp = np.log(np.array([
            [0.01, 0.97, 0.01, 0.01],
            [0.02, 0.02, 0.47, 0.49],
        ], np.float32))
        lm = train_char_lm([utf8_to_uxxxx("ab")] * 50, order=2, add_k=0.01)

        no_lm = prefix_beam_search(lp, alpha, BeamConfig(beam_width=8, topk=3))
        assert no_lm[0][0] == utf8_to_uxxxx("ac")

        fused = prefix_beam_search(
            lp, alpha, BeamConfig(beam_width=8, topk=3, lm_alpha=0.8),
            lm=lm,
        )
        assert fused[0][0] == utf8_to_uxxxx("ab")

    def test_insertion_bonus_lengthens(self):
        """With a punitive LM, beta compensates: higher beta should never
        yield a shorter hypothesis."""
        alpha = Alphabet.from_charset("ab")
        rng = np.random.default_rng(0)
        logits = rng.normal(0, 1, (6, 3)).astype(np.float32)
        lp = logits - np.log(np.exp(logits).sum(1, keepdims=True))
        lm = train_char_lm([utf8_to_uxxxx("a")], order=2)
        lens = []
        for beta in (0.0, 5.0):
            h = prefix_beam_search(
                lp, alpha,
                BeamConfig(beam_width=8, topk=2, lm_alpha=0.5, lm_beta=beta),
                lm=lm,
            )
            lens.append(len(h[0][0].split()))
        assert lens[1] >= lens[0]
