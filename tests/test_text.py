"""Unit tests for the text core (C1/C2): uxxxx codec, alphabet, CER/WER."""

import pytest

from vistaocr_tpu.text import (
    Alphabet,
    cer,
    cer_wer,
    levenshtein,
    utf8_to_uxxxx,
    uxxxx_to_utf8,
    wer,
)
from vistaocr_tpu.text.uxxxx import SPACE_TOKEN, char_to_uxxxx


class TestUxxxx:
    def test_basic_roundtrip(self):
        s = "Hello, World! 123"
        assert uxxxx_to_utf8(utf8_to_uxxxx(s)) == s

    def test_known_encoding(self):
        assert utf8_to_uxxxx("Ab c") == "u0041 u0062 u0020 u0063"
        assert char_to_uxxxx(" ") == SPACE_TOKEN

    def test_arabic_rtl_roundtrip(self):
        s = "السلام عليكم"
        enc = utf8_to_uxxxx(s)
        assert all(t.startswith("u06") or t == SPACE_TOKEN for t in enc.split())
        assert uxxxx_to_utf8(enc) == s

    def test_farsi_roundtrip(self):
        s = "سلام دنیا"
        assert uxxxx_to_utf8(utf8_to_uxxxx(s)) == s

    def test_astral_plane(self):
        s = "a\U0001F600b"  # emoji: 5-hex-digit codepoint
        enc = utf8_to_uxxxx(s)
        assert "u1f600" in enc
        assert uxxxx_to_utf8(enc) == s

    def test_combining_marks_preserved(self):
        s = "é"  # e + combining acute: must stay two tokens
        enc = utf8_to_uxxxx(s)
        assert len(enc.split()) == 2
        assert uxxxx_to_utf8(enc) == s

    def test_empty(self):
        assert utf8_to_uxxxx("") == ""
        assert uxxxx_to_utf8("") == ""

    def test_malformed_token_raises(self):
        with pytest.raises(ValueError):
            uxxxx_to_utf8("u00")
        with pytest.raises(ValueError):
            uxxxx_to_utf8("x0041")


class TestAlphabet:
    def test_blank_is_zero(self):
        a = Alphabet.from_charset("abc")
        assert a.BLANK == 0
        assert a.num_classes == 4

    def test_deterministic_ordering(self):
        a1 = Alphabet.build(["cab", "bca"], from_text=True)
        a2 = Alphabet.build(["abc", "cba"], from_text=True)
        assert a1 == a2
        # Sorted by codepoint: a < b < c
        assert a1.tokens == ["u0061", "u0062", "u0063"]

    def test_encode_decode_roundtrip(self):
        a = Alphabet.from_charset("abc ")
        ids = a.encode_text("a bc")
        assert 0 not in ids
        assert uxxxx_to_utf8(a.decode(ids)) == "a bc"

    def test_decode_skips_blank(self):
        a = Alphabet.from_charset("ab")
        ids = a.encode_text("ab")
        assert a.decode([0] + ids + [0]) == a.decode(ids)

    def test_json_roundtrip(self):
        a = Alphabet.from_charset("abcال")
        b = Alphabet.from_json(a.to_json())
        assert a == b

    def test_unknown_token_raises(self):
        a = Alphabet.from_charset("ab")
        with pytest.raises(KeyError):
            a.encode_text("abz")

    def test_duplicate_rejected(self):
        with pytest.raises(ValueError):
            Alphabet(["u0061", "u0061"])


class TestErrorRates:
    def test_levenshtein_hand_computed(self):
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("", "abc") == 3
        assert levenshtein("abc", "abc") == 0
        assert levenshtein(["u0061", "u0062"], ["u0061"]) == 1

    def test_cer_identity(self):
        r = utf8_to_uxxxx("hello world")
        assert cer(r, r) == 0.0
        assert wer(r, r) == 0.0

    def test_cer_hand_computed(self):
        # ref "abc" vs hyp "axc": one substitution over 3 chars
        ref = utf8_to_uxxxx("abc")
        hyp = utf8_to_uxxxx("axc")
        assert cer(hyp, ref) == pytest.approx(1 / 3)

    def test_wer_hand_computed(self):
        ref = utf8_to_uxxxx("the cat sat")
        hyp = utf8_to_uxxxx("the bat sat")
        assert wer(hyp, ref) == pytest.approx(1 / 3)
        assert cer(hyp, ref) == pytest.approx(1 / 11)

    def test_wer_multiple_spaces(self):
        # Double space must not create an empty word.
        ref = utf8_to_uxxxx("a  b")
        hyp = utf8_to_uxxxx("a b")
        assert wer(hyp, ref) == 0.0

    def test_corpus_aggregation(self):
        refs = [utf8_to_uxxxx("abcd"), utf8_to_uxxxx("xy")]
        hyps = [utf8_to_uxxxx("abcd"), utf8_to_uxxxx("xz")]
        c, w = cer_wer(hyps, refs)
        # 1 edit over 6 ref chars (corpus-level), not mean(0, 0.5)
        assert c == pytest.approx(1 / 6)
        assert w == pytest.approx(1 / 2)

    def test_empty_ref(self):
        assert cer("", "") == 0.0
        assert cer(utf8_to_uxxxx("a"), "") == 1.0

    def test_mismatched_counts_raise(self):
        with pytest.raises(ValueError):
            cer_wer(["u0061"], [])
