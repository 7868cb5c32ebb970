"""Word-level n-gram LM fusion in the host prefix beam (the Kaldi-era
G.fst equivalent): completed words score as single LM tokens."""

import numpy as np
import pytest

from vistaocr_tpu.decode.beam import BeamConfig, prefix_beam_search
from vistaocr_tpu.decode.lexicon import Lexicon
from vistaocr_tpu.decode.lm import ArpaLM, train_char_lm
from vistaocr_tpu.text import Alphabet, utf8_to_uxxxx


@pytest.fixture()
def alphabet():
    return Alphabet.build([utf8_to_uxxxx("abct ")])


def _word_lm(sentences, order=2):
    """ArpaLM whose tokens are utf8 WORDS (space-joined sentences)."""
    return train_char_lm(
        [s for s in sentences], order=order
    )


def _peaked(alphabet, text, hot=-0.5, cold=-2.5):
    ids = alphabet.encode(utf8_to_uxxxx(text))
    path = []
    for c in ids:
        path += [c, 0]
    lp = np.full((len(path), alphabet.num_classes), cold, np.float32)
    lp[np.arange(len(path)), path] = hot
    return lp - np.log(np.exp(lp).sum(-1, keepdims=True))


class TestWordLM:
    def test_word_lm_steers_word_choice(self, alphabet):
        """CTC slightly prefers 'cab cab'; a word bigram trained on
        'cat cat' flips both words."""
        lp = _peaked(alphabet, "cab cab")
        # make 't' nearly as likely as 'b' wherever b is hot
        b = alphabet.index_of(utf8_to_uxxxx("b"))
        t = alphabet.index_of(utf8_to_uxxxx("t"))
        hot_b = lp[:, b] > -1.0
        lp[hot_b, t] = lp[hot_b, b] - 0.1
        wlm = _word_lm(["cat cat"] * 50 + ["cab cab"])
        cfg_free = BeamConfig(beam_width=8, topk=4)
        free = prefix_beam_search(lp, alphabet, cfg_free)[0][0]
        assert free == utf8_to_uxxxx("cab cab")
        cfg = BeamConfig(beam_width=8, topk=4, word_lm_alpha=1.5)
        fused = prefix_beam_search(lp, alphabet, cfg, word_lm=wlm)[0][0]
        assert fused == utf8_to_uxxxx("cat cat")

    def test_trailing_word_scored_at_final(self, alphabet):
        """No trailing space: the last word must still feel the word LM."""
        lp = _peaked(alphabet, "cab")
        b = alphabet.index_of(utf8_to_uxxxx("b"))
        t = alphabet.index_of(utf8_to_uxxxx("t"))
        hot_b = lp[:, b] > -1.0
        lp[hot_b, t] = lp[hot_b, b] - 0.1
        wlm = _word_lm(["cat"] * 50 + ["cab"])
        cfg = BeamConfig(beam_width=8, topk=4, word_lm_alpha=1.5)
        fused = prefix_beam_search(lp, alphabet, cfg, word_lm=wlm)[0][0]
        assert fused == utf8_to_uxxxx("cat")

    def test_composes_with_lexicon(self, alphabet):
        lp = _peaked(alphabet, "cab")
        b = alphabet.index_of(utf8_to_uxxxx("b"))
        t = alphabet.index_of(utf8_to_uxxxx("t"))
        hot_b = lp[:, b] > -1.0
        lp[hot_b, t] = lp[hot_b, b] - 0.1
        lex = Lexicon.from_words(alphabet, ["cat", "cab", "at"])
        wlm = _word_lm(["cat at"] * 30 + ["cab"])
        cfg = BeamConfig(beam_width=8, topk=4, word_lm_alpha=1.5)
        out = prefix_beam_search(lp, alphabet, cfg, lexicon=lex,
                                 word_lm=wlm)[0][0]
        assert out == utf8_to_uxxxx("cat")

    def test_word_beta_counts_completed_words(self, alphabet):
        """word_lm_beta > 0 favors segmentations with more words when
        CTC mass is close: ' ' vs no-space between two chars."""
        a = alphabet.index_of(utf8_to_uxxxx("a"))
        sp = alphabet.index_of(utf8_to_uxxxx(" "))
        T = 5
        lp = np.full((1 * T, alphabet.num_classes), -3.0, np.float32)[None][0]
        lp = np.full((T, alphabet.num_classes), -3.0, np.float32)
        lp[0, a] = -0.2
        lp[1, 0] = -0.2
        lp[2, sp] = -0.8
        lp[2, 0] = -0.85  # blank nearly ties the space
        lp[3, 0] = -0.2
        lp[4, a] = -0.2
        lp -= np.log(np.exp(lp).sum(-1, keepdims=True))
        wlm = _word_lm(["a a", "a"])
        base = BeamConfig(beam_width=8, topk=4, word_lm_alpha=0.1,
                          word_lm_beta=0.0)
        boosted = BeamConfig(beam_width=8, topk=4, word_lm_alpha=0.1,
                             word_lm_beta=3.0)
        h0 = prefix_beam_search(lp, alphabet, base, word_lm=wlm)[0][0]
        h1 = prefix_beam_search(lp, alphabet, boosted, word_lm=wlm)[0][0]
        assert h1 == utf8_to_uxxxx("a a")
        assert h0 in (utf8_to_uxxxx("aa"), utf8_to_uxxxx("a a"))

    def test_requires_space_token(self):
        al = Alphabet.build([utf8_to_uxxxx("abc")])  # no space
        wlm = _word_lm(["abc"])
        lp = np.zeros((3, al.num_classes), np.float32)
        with pytest.raises(ValueError, match="u0020"):
            prefix_beam_search(
                lp, al, BeamConfig(word_lm_alpha=1.0), word_lm=wlm)


class TestBeamDecodeDispatch:
    def test_word_lm_without_lexicon_not_dropped_by_native(self, alphabet):
        """beam_decode(word_lm=..., lexicon=None) must apply the word LM
        even when the C++ engine is built: the native path has no
        open-vocabulary word-LM ABI (its dense word table is keyed by
        lexicon word ids), so this combination must route to the Python
        expansion instead of silently decoding unfused (ADVICE r3 high)."""
        import jax.numpy as jnp

        from vistaocr_tpu.decode.beam import beam_decode

        lp = _peaked(alphabet, "cab cab")
        b = alphabet.index_of(utf8_to_uxxxx("b"))
        t = alphabet.index_of(utf8_to_uxxxx("t"))
        hot_b = lp[:, b] > -1.0
        lp[hot_b, t] = lp[hot_b, b] - 0.1
        wlm = _word_lm(["cat cat"] * 50 + ["cab cab"])
        cfg = BeamConfig(beam_width=8, topk=4, word_lm_alpha=1.5)
        batch = jnp.asarray(lp)[None]
        mask = jnp.ones((1, lp.shape[0]), bool)
        # oracle: the single-line Python expansion with the word LM fused
        want = prefix_beam_search(lp, alphabet, cfg, word_lm=wlm)[0][0]
        assert want == utf8_to_uxxxx("cat cat")
        got = beam_decode(batch, mask, alphabet, cfg, word_lm=wlm)
        assert got == [want]
