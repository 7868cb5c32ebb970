"""Open-vocabulary pieces (VERDICT r3 task 1): the vocabulary
generator, the text-shaping knobs (Zipf/digits/punct/OOV mixing), and a
CPU-scale end-to-end proof that the lexicon <unk> bypass recovers what
the hard constraint destroys on OOV-heavy text. The corpus-scale
version of the same experiment is scripts/oov_quality.py (on-chip)."""

import numpy as np
import pytest

from vistaocr_tpu.data import build_synthetic_dataset
from vistaocr_tpu.data.synth import (
    OPEN_VOCAB_HARD,
    SynthConfig,
    SyntheticLineGenerator,
    make_vocabulary,
)


class TestVocabulary:
    def test_deterministic_and_unique(self):
        v1 = make_vocabulary(1500, seed=3)
        v2 = make_vocabulary(1500, seed=3)
        assert v1 == v2
        assert len(set(v1)) == 1500
        assert all(w.isalpha() and w.islower() for w in v1)
        # a different seed diverges (past the fixed function-word head)
        v3 = make_vocabulary(1500, seed=4)
        assert v1 != v3

    def test_function_words_lead(self):
        v = make_vocabulary(500, seed=0)
        assert v[0] == "the"  # Zipf head = high-frequency real words

    def test_rtl_vocabularies(self):
        # round 5: ar/fa hard-regime corpora (VERDICT r4 missing #2).
        # Deterministic, unique, Arabic-script, function words lead.
        for lang, head, marker in (("ar", "السلام", "ک"),
                                   ("fa", "سلام", "ك")):
            v1 = make_vocabulary(1200, seed=5, language=lang)
            v2 = make_vocabulary(1200, seed=5, language=lang)
            assert v1 == v2
            assert len(set(v1)) == 1200
            assert v1[0] == head
            # every char in the Arabic block (incl. presentation of
            # ZWNJ-free skeletons) — no Latin leakage
            assert all(all("؀" <= c <= "ۿ" for c in w)
                       for w in v1), lang
            # the OTHER language's distinctive kaf never appears
            # (ar uses ك U+0643, fa uses ک U+06A9)
            assert not any(marker in w for w in v1), lang


class TestTextShaping:
    def _texts(self, cfg, n=400, seed=9):
        gen = SyntheticLineGenerator(cfg, seed=seed)
        return [gen.sample_text() for _ in range(n)]

    def test_oov_mixing_rate(self):
        words = make_vocabulary(50, seed=1)
        cfg = SynthConfig(words=words[:40], oov_words=words[40:],
                          oov_rate=0.3, min_words=4, max_words=8)
        toks = [t for line in self._texts(cfg) for t in line.split()]
        oov = sum(1 for t in toks if t in words[40:])
        rate = oov / len(toks)
        assert 0.2 < rate < 0.4, rate

    def test_digits_and_punct(self):
        cfg = SynthConfig(words=make_vocabulary(100, seed=2),
                          digit_prob=0.2, punct_prob=0.3,
                          min_words=4, max_words=8)
        toks = [t for line in self._texts(cfg) for t in line.split()]
        digits = sum(1 for t in toks if t.isdigit())
        punct = sum(1 for t in toks if any(
            ch in ",.;:!?'\"()" for ch in t))
        assert digits / len(toks) > 0.1
        assert punct / len(toks) > 0.15

    def test_zipf_skews_frequencies(self):
        words = make_vocabulary(300, seed=5)
        cfg = SynthConfig(words=words, zipf=True, min_words=6,
                          max_words=10)
        toks = [t for line in self._texts(cfg) for t in line.split()]
        head = sum(1 for t in toks if t in set(words[:30]))
        # uniform sampling would put ~10% in the head; Zipf puts far more
        assert head / len(toks) > 0.35

    def test_open_vocab_hard_renders(self):
        cfg = SynthConfig(words=make_vocabulary(200, seed=6),
                          **OPEN_VOCAB_HARD)
        gen = SyntheticLineGenerator(cfg, seed=11)
        img, text = gen.sample(height=32, max_width=1024)
        assert img.ndim == 2 and img.shape[0] == 32
        assert len(text.split()) >= 3


@pytest.fixture(scope="module")
def oov_run(tmp_path_factory):
    """Tiny train corpus over 40 known words; an OOV-heavy test split
    mixing in 20 held-out words the model never saw in training and the
    lexicon does not contain."""
    from vistaocr_tpu.train import PRESETS, TrainConfig, fit

    vocab = make_vocabulary(200, seed=21)
    known = vocab[:40]
    # OOV words must stay within the model's trained CHARSET — an
    # alphabet miss is a different failure mode than a lexicon miss
    charset = set("".join(known))
    heldout = [w for w in vocab[40:] if set(w) <= charset][:20]
    assert len(heldout) >= 10
    base_cfg = dict(min_words=1, max_words=3)
    data = build_synthetic_dataset(
        str(tmp_path_factory.mktemp("ov_data")),
        num_train=200, num_val=24, num_test=0, height=32, max_width=384,
        config=SynthConfig(words=known, **base_cfg), seed=33,
    )
    oov_data = build_synthetic_dataset(
        str(tmp_path_factory.mktemp("ov_oov")),
        num_train=0, num_val=0, num_test=32, height=32, max_width=384,
        config=SynthConfig(words=known, oov_words=heldout, oov_rate=0.5,
                           **base_cfg),
        seed=34,
    )
    run = str(tmp_path_factory.mktemp("ov_run"))
    base = dict(PRESETS["synth-tiny"])
    base.update(
        data_dir=data, snapshot_dir=run, epochs=10**6, max_steps=450,
        val_interval_steps=150, log_interval=200, batch_pixels=2**17,
        bucket_widths=(128, 256, 384), seed=6,
    )
    summary = fit(TrainConfig(**base), log=lambda *a: None)
    return known, heldout, data, oov_data, run, summary


class TestOovEndToEnd:
    def test_hard_lexicon_collapses_and_bypass_recovers(self, oov_run,
                                                        tmp_path):
        """On a 50%-OOV test split: the HARD lexicon must do clearly
        worse than unconstrained greedy (it forces wrong in-vocab
        words), and the <unk> bypass must recover most of that loss —
        the measured justification for the mitigation."""
        from vistaocr_tpu.infer import run_inference

        known, heldout, data, oov_data, run, summary = oov_run
        assert summary["best_cer"] < 0.10, summary  # model itself learned
        lex = str(tmp_path / "lex.txt")
        with open(lex, "w") as f:
            f.write("\n".join(known))
        quiet = dict(log=lambda *a: None)
        snap = run + "/best"
        greedy = run_inference(snap, oov_data, "test", decoder="greedy",
                               batch_pixels=2**17, **quiet)["cer"]
        hard = run_inference(snap, oov_data, "test", decoder="beam",
                             lexicon_path=lex, batch_pixels=2**17,
                             **quiet)["cer"]
        unk = run_inference(snap, oov_data, "test", decoder="beam",
                            lexicon_path=lex, lex_unk_logp=-2.0,
                            batch_pixels=2**17, **quiet)["cer"]
        # the hard constraint mangles OOV words
        assert hard > greedy + 0.05, (hard, greedy)
        # the bypass recovers most of the damage (λ measured on this
        # fixture: -2 ≈ greedy, -3 ≈ 2x greedy, -4 ≈ 4x greedy — per-char
        # penalties bias against correct OOV spellings as |λ| grows)
        assert unk < hard - 0.05, (unk, hard)
        assert unk < greedy + 0.05, (unk, greedy)

    def test_bypass_host_engines_agree_at_corpus_level(self, oov_run,
                                                       tmp_path):
        """Same OOV split decoded through the device engine and the
        host expansion: identical CER (string-exact engines)."""
        from vistaocr_tpu.infer import run_inference

        known, heldout, data, oov_data, run, _ = oov_run
        lex = str(tmp_path / "lex.txt")
        with open(lex, "w") as f:
            f.write("\n".join(known))
        quiet = dict(log=lambda *a: None)
        reps = {
            impl: run_inference(
                run + "/best", oov_data, "test", decoder="beam",
                beam_impl=impl, lexicon_path=lex, lex_unk_logp=-4.0,
                batch_pixels=2**17, **quiet)
            for impl in ("device", "host")
        }
        assert reps["device"]["cer"] == pytest.approx(
            reps["host"]["cer"], abs=1e-9)
