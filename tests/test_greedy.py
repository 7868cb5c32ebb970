"""Greedy CTC decode tests (C13)."""

import numpy as np

import jax.numpy as jnp

from vistaocr_tpu.decode import greedy_decode, greedy_frames
from vistaocr_tpu.text import Alphabet, utf8_to_uxxxx


def _lp_from_ids(ids, K):
    """Build log-probs whose argmax sequence is `ids`."""
    T = len(ids)
    lp = np.full((1, T, K), -10.0, np.float32)
    for t, k in enumerate(ids):
        lp[0, t, k] = -0.01
    return jnp.asarray(lp)


class TestGreedy:
    def setup_method(self):
        self.alpha = Alphabet.from_charset("abc")
        # indices: blank=0, a=1, b=2, c=3

    def test_collapse_repeats_and_blanks(self):
        # frames: a a 0 a b b 0 -> "a a b" collapsed -> aab
        lp = _lp_from_ids([1, 1, 0, 1, 2, 2, 0], 4)
        mask = jnp.ones((1, 7), bool)
        hyp = greedy_decode(lp, mask, self.alpha)
        assert hyp == [utf8_to_uxxxx("aab")]

    def test_mask_cuts_tail(self):
        lp = _lp_from_ids([1, 0, 2, 3, 3], 4)
        mask = jnp.asarray(np.array([[1, 1, 1, 0, 0]], bool))
        hyp = greedy_decode(lp, mask, self.alpha)
        assert hyp == [utf8_to_uxxxx("ab")]

    def test_all_blank_is_empty(self):
        lp = _lp_from_ids([0, 0, 0], 4)
        mask = jnp.ones((1, 3), bool)
        assert greedy_decode(lp, mask, self.alpha) == [""]

    def test_repeat_across_blank_kept(self):
        # a 0 a -> "aa" (blank separates repeats)
        lp = _lp_from_ids([1, 0, 1], 4)
        mask = jnp.ones((1, 3), bool)
        assert greedy_decode(lp, mask, self.alpha) == [utf8_to_uxxxx("aa")]

    def test_valid_filter(self):
        lp = jnp.concatenate([_lp_from_ids([1], 4), _lp_from_ids([2], 4)], axis=0)
        mask = jnp.ones((2, 1), bool)
        hyps = greedy_decode(lp, mask, self.alpha, valid=np.array([True, False]))
        assert hyps == [utf8_to_uxxxx("a")]

    def test_frames_shape_and_dtype(self):
        lp = _lp_from_ids([1, 2, 0], 4)
        out = greedy_frames(lp, jnp.ones((1, 3), bool))
        assert out.shape == (1, 3) and out.dtype == jnp.int32


class TestGreedyPacked:
    def test_packed_matches_frames_plus_score(self):
        import jax.numpy as jnp

        from vistaocr_tpu.decode.greedy import (
            SCORE_SCALE,
            greedy_frames,
            greedy_frames_packed,
        )

        rng = np.random.default_rng(5)
        lp = np.log(rng.dirichlet(np.ones(7), size=(4, 11))).astype(np.float32)
        mask = np.arange(11)[None, :] < np.array([11, 8, 3, 0])[:, None]
        packed = np.asarray(greedy_frames_packed(jnp.asarray(lp),
                                                 jnp.asarray(mask)))
        frames = np.asarray(greedy_frames(jnp.asarray(lp), jnp.asarray(mask)))
        assert packed.shape == (4, 12)
        np.testing.assert_array_equal(packed[:, :-1], frames)
        want = (lp.max(axis=2) * mask).sum(axis=1)
        np.testing.assert_allclose(
            packed[:, -1] / SCORE_SCALE, want, atol=2.0 / SCORE_SCALE
        )
        assert packed[3, -1] == 0  # zero valid frames -> zero score
