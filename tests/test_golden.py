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
