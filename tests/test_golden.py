"""Frozen parity bundle (SURVEY.md §4): greedy decode, beam decode, and
CER/WER over fixed posteriors must reproduce recorded outputs exactly.
Regenerate deliberately with tests/golden/make_bundle.py when decode
semantics change ON PURPOSE."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from vistaocr_tpu.decode import BeamConfig, beam_decode, greedy_decode
from vistaocr_tpu.text import Alphabet, cer_wer

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def bundle():
    data = np.load(os.path.join(GOLDEN, "decode_bundle.npz"))
    with open(os.path.join(GOLDEN, "decode_bundle.json")) as f:
        meta = json.load(f)
    return data, meta


class TestGoldenParity:
    def test_greedy_frozen(self, bundle):
        data, meta = bundle
        alphabet = Alphabet.from_json(json.dumps(meta["alphabet"]))
        lp = data["log_probs"]
        frames = data["frames"]
        mask = np.arange(lp.shape[1])[None, :] < frames[:, None]
        hyps = greedy_decode(jnp.asarray(lp), jnp.asarray(mask), alphabet)
        assert hyps == meta["greedy"]
        c, w = cer_wer(hyps, meta["refs"])
        assert c == pytest.approx(meta["greedy_cer"], abs=1e-9)
        assert w == pytest.approx(meta["greedy_wer"], abs=1e-9)

    def test_beam_frozen(self, bundle):
        data, meta = bundle
        alphabet = Alphabet.from_json(json.dumps(meta["alphabet"]))
        lp = data["log_probs"]
        frames = data["frames"]
        mask = np.arange(lp.shape[1])[None, :] < frames[:, None]
        hyps = beam_decode(jnp.asarray(lp), jnp.asarray(mask), alphabet,
                           BeamConfig(beam_width=8, topk=6))
        assert hyps == meta["beam"]
        c, w = cer_wer(hyps, meta["refs"])
        assert c == pytest.approx(meta["beam_cer"], abs=1e-9)

    def test_device_beam_matches_frozen_bundle(self, bundle):
        """The vectorized on-device beam engine (decode/device_beam.py)
        must reproduce the SAME frozen outputs as the host oracle — the
        'golden-bundle beam outputs unchanged' gate for the device
        engine."""
        from vistaocr_tpu.decode import device_beam_decode

        data, meta = bundle
        alphabet = Alphabet.from_json(json.dumps(meta["alphabet"]))
        lp = data["log_probs"]
        frames = data["frames"]
        mask = np.arange(lp.shape[1])[None, :] < frames[:, None]
        hyps = device_beam_decode(
            jnp.asarray(lp), jnp.asarray(mask), alphabet,
            BeamConfig(beam_width=8, topk=6),
        )
        assert hyps == meta["beam"]


class TestGoldenLG:
    """Frozen fused L∘G device decode (char 3-gram + lexicon + word
    bigram inside one scan) — pins the end-to-end fused stack, not only
    engine-vs-engine parity. Regenerate deliberately with
    tests/golden/make_lg_bundle.py when fusion semantics change ON
    PURPOSE."""

    def test_device_lg_frozen(self):
        from vistaocr_tpu.decode.device_beam import beam_scan_collapsed
        from vistaocr_tpu.decode.lexicon import Lexicon
        from vistaocr_tpu.decode.lm import (
            ArpaLM,
            dense_logp_table,
            dense_word_logp_table,
        )

        data = np.load(os.path.join(GOLDEN, "lg_bundle.npz"))
        with open(os.path.join(GOLDEN, "lg_bundle.json")) as f:
            meta = json.load(f)
        alphabet = Alphabet.from_json(json.dumps(meta["alphabet"]))
        lex = Lexicon.from_words(alphabet, meta["words"])
        char_lm = ArpaLM.read_arpa(os.path.join(GOLDEN, "lg_char_lm.arpa"))
        word_lm = ArpaLM.read_arpa(os.path.join(GOLDEN, "lg_word_lm.arpa"))
        cfg = meta["config"]

        lp = data["log_probs"]
        frames = data["frames"]
        mask = np.arange(lp.shape[1])[None, :] < frames[:, None]
        next_tbl, boundary = lex.dense_tables()
        _, packed = beam_scan_collapsed(
            jnp.asarray(lp), jnp.asarray(mask),
            beam_width=cfg["beam_width"], topk=cfg["topk"],
            prune_logp=cfg["prune_logp"],
            lm_table=jnp.asarray(
                dense_logp_table(char_lm, alphabet, order=3)),
            lm_alpha=cfg["lm_alpha"], lm_beta=cfg["lm_beta"],
            lex_next=jnp.asarray(next_tbl),
            lex_boundary=jnp.asarray(boundary),
            word_table=jnp.asarray(
                dense_word_logp_table(word_lm, lex.words)),
            word_ids=jnp.asarray(lex.word_id_table()),
            space_id=lex.space_id,
            word_alpha=cfg["word_alpha"], word_beta=cfg["word_beta"],
        )
        packed = np.asarray(packed)
        hyps = []
        for b in range(lp.shape[0]):
            row = packed[b, :-1]
            hyps.append(alphabet.decode(row[row != 0].tolist()))
        assert hyps == meta["device_lg"]
