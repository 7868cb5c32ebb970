"""Offline posterior-dump decoding (decode/offline.py) — the consumer
half of the external-decode surface (SURVEY.md §3.3). Dumps here are
written directly in the documented npz format, so these tests also pin
that format against drift."""

import json
import os

import numpy as np
import pytest

from vistaocr_tpu.decode.offline import (
    decode_posteriors,
    greedy_decode_np,
    main as offline_main,
)
from vistaocr_tpu.text import Alphabet, utf8_to_uxxxx


@pytest.fixture()
def alphabet():
    return Alphabet.build(["abc"], from_text=True)


def _peaked(alphabet, text, frames_per_char=3):
    """[T, V] log-probs sharply peaked on text's chars, blank-separated
    so greedy and beam agree trivially."""
    ids = alphabet.encode(utf8_to_uxxxx(text))
    path = []
    for c in ids:
        path += [c] * frames_per_char + [0]
    lp = np.full((len(path), alphabet.num_classes), -12.0, np.float32)
    lp[np.arange(len(path)), path] = -0.01
    return lp


def _write_dump(dump_dir, alphabet, lines, split="test", per_file=2):
    os.makedirs(dump_dir, exist_ok=True)
    with open(os.path.join(dump_dir, "meta.json"), "w") as f:
        json.dump({
            "format": "vistaocr_tpu.posteriors.v1",
            "alphabet": json.loads(alphabet.to_json()),
            "snapshot": "none",
            "split": split,
        }, f)
    items = sorted(lines.items())
    for n, i in enumerate(range(0, len(items), per_file)):
        grp = items[i : i + per_file]
        fmax = max(lp.shape[0] for _, lp in grp)
        arr = np.zeros((len(grp), fmax, alphabet.num_classes), np.float16)
        frames = np.zeros(len(grp), np.int32)
        for b, (_, lp) in enumerate(grp):
            arr[b, : lp.shape[0]] = lp
            frames[b] = lp.shape[0]
        np.savez_compressed(
            os.path.join(dump_dir, f"posteriors_{n:05d}.npz"),
            ids=np.array([lid for lid, _ in grp]),
            frames=frames,
            log_probs=arr,
        )


class TestGreedyNp:
    def test_collapse_and_blank(self, alphabet):
        # path a a blank a b b -> "a a b" collapsed to aab
        V = alphabet.num_classes
        a, b = alphabet.encode(utf8_to_uxxxx("ab"))
        path = [a, a, 0, a, b, b]
        lp = np.full((len(path), V), -9.0, np.float32)
        lp[np.arange(len(path)), path] = -0.1
        assert greedy_decode_np(lp, alphabet) == utf8_to_uxxxx("aab")

    def test_matches_device_greedy(self, alphabet):
        import jax.numpy as jnp

        from vistaocr_tpu.decode import greedy_decode

        rng = np.random.default_rng(7)
        lp = np.log(
            rng.dirichlet(np.ones(alphabet.num_classes), size=23)
        ).astype(np.float32)
        mask = np.ones((1, 23), bool)
        dev = greedy_decode(jnp.asarray(lp[None]), jnp.asarray(mask), alphabet)[0]
        assert greedy_decode_np(lp, alphabet) == dev


class TestOfflineDecode:
    def test_greedy_over_dump(self, alphabet, tmp_path):
        texts = {"l0": "abc", "l1": "cab", "l2": "bb", "l3": "a"}
        _write_dump(
            str(tmp_path), alphabet,
            {k: _peaked(alphabet, v) for k, v in texts.items()},
        )
        refs = {k: utf8_to_uxxxx(v) for k, v in texts.items()}
        out = str(tmp_path / "hyps.jsonl")
        rep = decode_posteriors(
            str(tmp_path), refs=refs, out_path=out, log=lambda *a: None
        )
        assert rep["lines"] == 4 and rep["cer"] == 0.0 and rep["wer"] == 0.0
        got = {}
        with open(out) as f:
            for line in f:
                r = json.loads(line)
                got[r["id"]] = r["hyp_text"]
        assert got == texts

    def test_beam_over_dump_matches_greedy_when_peaked(self, alphabet, tmp_path):
        texts = {"l0": "abc", "l1": "cab", "l2": "bb", "l3": "a", "l4": "cc"}
        _write_dump(
            str(tmp_path), alphabet,
            {k: _peaked(alphabet, v) for k, v in texts.items()},
        )
        refs = {k: utf8_to_uxxxx(v) for k, v in texts.items()}
        rep = decode_posteriors(
            str(tmp_path), decoder="beam", beam_width=4, topk=3,
            refs=refs, log=lambda *a: None,
        )
        assert rep["lines"] == 5 and rep["cer"] == 0.0

    def test_cli_beam_with_lm(self, alphabet, tmp_path):
        from vistaocr_tpu.decode.lm import train_char_lm

        texts = {"l0": "abc", "l1": "aab"}
        _write_dump(
            str(tmp_path / "post"), alphabet,
            {k: _peaked(alphabet, v) for k, v in texts.items()},
        )
        lm_path = str(tmp_path / "lm.arpa")
        train_char_lm(
            [utf8_to_uxxxx(t) for t in ["abc", "aab", "cab", "bca"] * 8],
            order=2,
        ).write_arpa(lm_path)
        out = str(tmp_path / "hyps.jsonl")
        offline_main([
            "--posteriors", str(tmp_path / "post"),
            "--decoder", "beam", "--lm", lm_path,
            "--lm-alpha", "0.3", "--lm-beta", "0.3",
            "--out", out,
        ])
        got = {}
        with open(out) as f:
            for line in f:
                r = json.loads(line)
                got[r["id"]] = r["hyp_text"]
        assert got == texts
