"""Display-order conversion for RTL transcripts (text/bidi.py) — the
round-5 fix for CTC's scan-order label requirement (SURVEY C4 hard-part
#5: RTL transcript ordering)."""

from vistaocr_tpu.text import utf8_to_uxxxx
from vistaocr_tpu.text.bidi import (
    display_order,
    display_order_uxxxx,
    is_rtl_line,
)

AR = "مدرسة كتاب"  # two RTL words
FA = "سلام دنیا"


class TestDisplayOrder:
    def test_pure_rtl_is_reversal(self):
        assert display_order(AR) == AR[::-1]
        assert display_order(FA) == FA[::-1]

    def test_involution(self):
        for s in (AR, FA, "كتاب 123 مدرسة", "سال 12.5 درصد",
                  "م 1,000 ك", "ساعت 10:30 بود"):
            assert display_order(display_order(s)) == s, s

    def test_ltr_passthrough(self):
        for s in ("hello world", "abc 123", "", "12.5"):
            assert display_order(s) == s

    def test_embedded_digit_run_keeps_internal_order(self):
        # logical: RTL-word SPACE digits SPACE RTL-word
        s = "كتاب 123 مدرسة"
        d = display_order(s)
        # the digit run appears left of center, internally L->R
        assert "123" in d and d != s
        assert d == "ةسردم 123 باتك"

    def test_numeric_separators_stay_inside_run(self):
        d = display_order("سال 12.5 درصد")
        assert "12.5" in d
        d = display_order("م 1,000 ك")
        assert "1,000" in d

    def test_first_strong_rule(self):
        assert is_rtl_line("كتاب abc")
        assert not is_rtl_line("abc كتاب")
        assert not is_rtl_line("123 ...")  # digits are strong LTR

    def test_uxxxx_roundtrip(self):
        u = utf8_to_uxxxx(AR)
        d = display_order_uxxxx(u)
        assert d == utf8_to_uxxxx(AR[::-1])
        assert display_order_uxxxx(d) == u


class TestPrepIntegration:
    def test_synthetic_rtl_corpus_stores_display_order(self, tmp_path):
        from vistaocr_tpu.data import build_synthetic_dataset
        from vistaocr_tpu.data.shards import ShardedLineDataset
        from vistaocr_tpu.data.synth import SynthConfig
        import json
        import os

        kw = dict(num_train=6, num_val=0, height=32, max_width=512,
                  seed=9)
        d_disp = build_synthetic_dataset(
            str(tmp_path / "disp"),
            config=SynthConfig(language="ar", min_words=2, max_words=3),
            **kw)
        d_log = build_synthetic_dataset(
            str(tmp_path / "log"),
            config=SynthConfig(language="ar", min_words=2, max_words=3,
                               display_order=False),
            **kw)
        disp = ShardedLineDataset(d_disp, "train")
        logi = ShardedLineDataset(d_log, "train")
        saw_diff = False
        for i in range(len(disp)):
            td, tl = disp.transcript(i), logi.transcript(i)
            assert td == display_order_uxxxx(tl)
            saw_diff |= td != tl
            # same seed -> identical pixels either way
            assert (disp[i].image == logi[i].image).all()
        assert saw_diff  # the policy actually reordered something
        man = json.load(open(os.path.join(d_disp, "manifest.json")))
        assert man["transcript_order"] == "display"

    def test_madcat_policy_display_order(self):
        from vistaocr_tpu.data.madcat import ArabicPolicy

        logical = "كتاب مدرسة"
        assert ArabicPolicy().apply(logical) == display_order(logical)
        assert ArabicPolicy(display_order=False).apply(logical) == logical

    def test_line_result_logical_text(self):
        from vistaocr_tpu.serve.service import LineResult

        disp = display_order("كتاب مدرسة")
        r = LineResult(text=disp, uxxxx="", latency_ms=1.0,
                       bucket_width=128)
        assert r.logical_text == "كتاب مدرسة"
        r_en = LineResult(text="hello", uxxxx="", latency_ms=1.0,
                          bucket_width=128)
        assert r_en.logical_text == "hello"
