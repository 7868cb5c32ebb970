"""Lexicon-constrained beam decoding (decode/lexicon.py + the host
prefix beam) — the Kaldi-era lexicon-FST workflow's in-process twin."""

import numpy as np
import pytest

from vistaocr_tpu.decode.beam import BeamConfig, beam_decode, prefix_beam_search
from vistaocr_tpu.decode.lexicon import Lexicon
from vistaocr_tpu.text import Alphabet, utf8_to_uxxxx


@pytest.fixture()
def alphabet():
    return Alphabet.build([utf8_to_uxxxx("abct ")])


def _peaked(alphabet, path, hot=-0.05, cold=-9.0):
    lp = np.full((len(path), alphabet.num_classes), cold, np.float32)
    lp[np.arange(len(path)), path] = hot
    return lp - np.log(np.exp(lp).sum(-1, keepdims=True))


class TestLexicon:
    def test_trie_membership(self, alphabet):
        lex = Lexicon.from_words(alphabet, ["cat", "cab", "at"])
        c = alphabet.index_of(utf8_to_uxxxx("c"))
        a = alphabet.index_of(utf8_to_uxxxx("a"))
        t = alphabet.index_of(utf8_to_uxxxx("t"))
        b = alphabet.index_of(utf8_to_uxxxx("b"))
        n = lex.start()
        assert lex.allows(n, c) and lex.allows(n, a)
        assert not lex.allows(n, b)  # no word starts with b
        n = lex.next_node(n, c)
        n = lex.next_node(n, a)
        assert lex.allows(n, t) and lex.allows(n, b)
        n = lex.next_node(n, t)
        assert lex.is_word(n) and lex.at_boundary(n)
        # space allowed only at word boundaries
        assert lex.allows(n, lex.space_id)
        mid = lex.next_node(lex.start(), c)
        assert not lex.at_boundary(mid)
        assert not lex.allows(mid, lex.space_id)

    def test_oov_words_filtered_empty_raises(self, alphabet):
        lex = Lexicon.from_words(alphabet, ["cat", "dog"])  # dog has OOV 'd'...
        assert lex.num_words == 1  # ...and is silently dropped
        with pytest.raises(ValueError):
            Lexicon.from_words(alphabet, ["dog"])
        with pytest.raises(ValueError):
            Lexicon.from_words(alphabet, ["a b"])  # embedded space

    def test_constraint_steers_to_lexicon_word(self, alphabet):
        """Posteriors peaked on 'cbt' (not a word): unconstrained decode
        reads cbt, constrained snaps to a lexicon word."""
        ids = [alphabet.index_of(utf8_to_uxxxx(ch)) for ch in "cbt"]
        # weak peak so lexicon-allowed alternatives survive top-k
        path = []
        for i in ids:
            path += [i, 0]
        lp = _peaked(alphabet, path, hot=-0.7, cold=-2.2)
        cfg = BeamConfig(beam_width=8, topk=4)
        free = prefix_beam_search(lp, alphabet, cfg)
        assert free[0][0] == utf8_to_uxxxx("cbt")
        lex = Lexicon.from_words(alphabet, ["cat", "cab", "ct"])
        hyps = prefix_beam_search(lp, alphabet, cfg, lexicon=lex)
        texts = [h for h, _ in hyps]
        assert utf8_to_uxxxx("cbt") not in texts
        assert all(
            t in {utf8_to_uxxxx(w) for w in
                  ("cat", "cab", "ct", "cat cat")} or t == ""
            or all(seg in ("cat", "cab", "ct")
                   for seg in "".join(
                       chr(int(x[1:], 16)) for x in t.split()).split())
            for t in texts
        )
        assert texts[0] in {utf8_to_uxxxx("cat"), utf8_to_uxxxx("cab"),
                            utf8_to_uxxxx("ct")}

    def test_mid_word_finals_dropped(self, alphabet):
        """Posteriors ending mid-word: complete-word hypotheses win the
        final ranking even at lower CTC score."""
        c = alphabet.index_of(utf8_to_uxxxx("c"))
        a = alphabet.index_of(utf8_to_uxxxx("a"))
        lp = _peaked(alphabet, [c, a], hot=-0.5, cold=-2.5)
        lex = Lexicon.from_words(alphabet, ["ca", "cat", "c"])
        hyps = prefix_beam_search(
            lp, alphabet, BeamConfig(beam_width=8, topk=4), lexicon=lex)
        # 'ca' (complete) must rank; a bare mid-word prefix may not
        assert hyps[0][0] in (utf8_to_uxxxx("ca"), utf8_to_uxxxx("c"))

    def test_batch_beam_decode_with_lexicon(self, alphabet):
        ids = [alphabet.index_of(utf8_to_uxxxx(ch)) for ch in "cat"]
        path = []
        for i in ids:
            path += [i, 0]
        lp = _peaked(alphabet, path)[None]
        mask = np.ones((1, lp.shape[1]), bool)
        lex = Lexicon.from_words(alphabet, ["cat", "cab"])
        import jax.numpy as jnp

        out = beam_decode(jnp.asarray(lp), jnp.asarray(mask), alphabet,
                          BeamConfig(beam_width=4, topk=3), lexicon=lex)
        assert out == [utf8_to_uxxxx("cat")]

    def test_native_char_lm_composes_with_lexicon(self, alphabet, tmp_path):
        """Round-3 late: the C++ engine handles lexicon + NativeLM char
        fusion directly (it used to require the Python expansion)."""
        from vistaocr_tpu.decode import native_binding as nb
        from vistaocr_tpu.decode.lm import train_char_lm

        if not nb.available():
            pytest.skip("native engine not built")
        lex = Lexicon.from_words(alphabet, ["cat", "cab"])
        arpa = str(tmp_path / "c.arpa")
        train_char_lm(
            [utf8_to_uxxxx(t) for t in ["cat", "cab", "cat"]], order=2
        ).write_arpa(arpa)
        lm = nb.NativeLM(arpa, alphabet.tokens)
        ids = [alphabet.index_of(utf8_to_uxxxx(ch)) for ch in "cat"]
        path = []
        for i in ids:
            path += [i, 0]
        lp = _peaked(alphabet, path)[None]
        mask = np.ones((1, lp.shape[1]), bool)
        import jax.numpy as jnp

        out = beam_decode(jnp.asarray(lp), jnp.asarray(mask), alphabet,
                          BeamConfig(beam_width=4, topk=3, lm_alpha=0.4),
                          lm=lm, lexicon=lex)
        assert out == [utf8_to_uxxxx("cat")]
