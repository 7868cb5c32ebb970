"""Vectorized on-device beam search (decode/device_beam.py) vs the
host prefix-beam oracle (decode/beam.py) — SURVEY.md §4 numerical-oracle
strategy applied to the batched-service decoder (C14).

The device search implements the SAME pruning rule and candidate set as
the oracle, so with no LM the decoded strings must match exactly (ties in
random float logits are measure-zero)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from vistaocr_tpu.decode.beam import BeamConfig, prefix_beam_search
from vistaocr_tpu.decode.device_beam import (
    beam_scan,
    backtrace,
    device_beam_decode,
    lm_prefix_logp,
)
from vistaocr_tpu.text import Alphabet, utf8_to_uxxxx


def _alphabet(n_symbols: int) -> Alphabet:
    # n_symbols distinct characters -> alphabet of n_symbols+1 classes
    chars = "abcdefghijklmnopqrstuvwxyz"[:n_symbols]
    return Alphabet.build([utf8_to_uxxxx(chars)])


def _random_case(seed, B=6, T=18, K=9, peaky=False):
    rng = np.random.default_rng(seed)
    logits = rng.normal(0, 3.0 if peaky else 1.0, (B, T, K)).astype(np.float32)
    if peaky:
        # bias toward blank + a couple of symbols, CTC-like
        logits[..., 0] += 2.0
        sym = rng.integers(1, K, (B,))
        for b in range(B):
            logits[b, :, sym[b]] += rng.normal(1.5, 1.0, (T,))
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    frames = rng.integers(3, T + 1, B).astype(np.int32)
    frames[0] = T
    mask = np.arange(T)[None, :] < frames[:, None]
    return lp.astype(np.float32), mask, frames


class TestOracleParity:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    @pytest.mark.parametrize("peaky", [False, True])
    def test_matches_host_beam_exactly(self, seed, peaky):
        lp, mask, frames = _random_case(seed, peaky=peaky)
        K = lp.shape[-1]
        al = _alphabet(K - 1)
        cfg = BeamConfig(beam_width=8, topk=4, prune_logp=-12.0)

        got = device_beam_decode(jnp.asarray(lp), jnp.asarray(mask), al, cfg)
        for b in range(lp.shape[0]):
            hyps = prefix_beam_search(lp[b, : frames[b]], al, cfg)
            assert got[b] == hyps[0][0], (
                f"sample {b}: device={got[b]!r} oracle={hyps[0][0]!r}"
            )

    def test_top_beam_score_matches_oracle(self):
        lp, mask, frames = _random_case(7)
        K = lp.shape[-1]
        al = _alphabet(K - 1)
        cfg = BeamConfig(beam_width=8, topk=4, prune_logp=-12.0)
        totals, parents, tokens = beam_scan(
            jnp.asarray(lp), jnp.asarray(mask),
            beam_width=cfg.beam_width, topk=cfg.topk,
            prune_logp=cfg.prune_logp,
        )
        totals = np.asarray(totals)
        for b in range(lp.shape[0]):
            hyps = prefix_beam_search(lp[b, : frames[b]], al, cfg)
            assert math.isclose(
                float(totals[b].max()), hyps[0][1], rel_tol=0, abs_tol=1e-4
            )

    def test_all_masked_decodes_empty(self):
        lp, _, _ = _random_case(11, B=2, T=6)
        mask = np.zeros(lp.shape[:2], bool)
        al = _alphabet(lp.shape[-1] - 1)
        got = device_beam_decode(jnp.asarray(lp), jnp.asarray(mask), al)
        assert got == ["", ""]

    def test_valid_filter(self):
        lp, mask, _ = _random_case(12, B=4)
        al = _alphabet(lp.shape[-1] - 1)
        valid = np.array([True, False, True, False])
        got = device_beam_decode(
            jnp.asarray(lp), jnp.asarray(mask), al, valid=valid
        )
        assert len(got) == 2


class TestMerging:
    def test_duplicate_prefixes_merge_mass(self):
        """A stay-candidate and an extend-candidate producing the same
        prefix must log-sum-exp, not compete: craft logits where 'a' then
        ('a' again, no blank) and ('a', blank, 'a') both live."""
        # K=3: blank, a, b. T=3.
        lp = np.log(np.array([
            [[0.1, 0.8, 0.1],
             [0.4, 0.5, 0.1],
             [0.1, 0.8, 0.1]],
        ], np.float32))
        mask = np.ones((1, 3), bool)
        al = _alphabet(2)
        cfg = BeamConfig(beam_width=8, topk=2, prune_logp=-30.0)
        got = device_beam_decode(jnp.asarray(lp), jnp.asarray(mask), al, cfg)
        hyps = prefix_beam_search(lp[0], al, cfg)
        assert got[0] == hyps[0][0]
        # and the scores agree for the best beam
        totals, _, _ = beam_scan(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=8, topk=2,
            prune_logp=-30.0)
        assert math.isclose(float(np.asarray(totals)[0].max()), hyps[0][1],
                            abs_tol=1e-5)


class TestBacktrace:
    def test_backtrace_shapes_and_determinism(self):
        lp, mask, _ = _random_case(5)
        totals, parents, tokens = beam_scan(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=8, topk=4,
            prune_logp=-12.0)
        em1 = backtrace(np.asarray(parents), np.asarray(tokens))
        em2 = backtrace(np.asarray(parents), np.asarray(tokens))
        assert em1.shape == (lp.shape[1], lp.shape[0], 8)
        np.testing.assert_array_equal(em1, em2)

    def test_device_backtrace_matches_numpy(self):
        from vistaocr_tpu.decode.device_beam import (
            beam_scan_collapsed,
            device_backtrace,
        )

        lp, mask, _ = _random_case(6)
        totals, parents, tokens = beam_scan(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=8, topk=4,
            prune_logp=-12.0)
        ref = backtrace(np.asarray(parents), np.asarray(tokens))
        dev = np.asarray(device_backtrace(parents, tokens))
        np.testing.assert_array_equal(dev, ref)

        # collapsed all-beams layout agrees too
        t2, em_all = beam_scan_collapsed(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=8, topk=4,
            prune_logp=-12.0, all_beams=True)
        np.testing.assert_array_equal(
            np.asarray(em_all), ref.transpose(1, 2, 0))
        # best-only layout = the argmax beam's row
        t3, em_best = beam_scan_collapsed(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=8, topk=4,
            prune_logp=-12.0, all_beams=False)
        best = np.asarray(t3).argmax(1)
        for b in range(lp.shape[0]):
            np.testing.assert_array_equal(
                np.asarray(em_best)[b], ref[:, b, best[b]])


class TestTwoPassLM:
    def test_rescoring_picks_lm_favored_final(self):
        """With a strong LM preferring 'ab' over 'aa', two-pass rescoring
        must flip the winner when CTC scores are close."""
        from vistaocr_tpu.decode.lm import train_char_lm

        al = _alphabet(2)  # a, b
        a, b = utf8_to_uxxxx("a"), utf8_to_uxxxx("b")
        corpus = [f"{a} {b}"] * 50  # LM strongly favors a->b
        lm = train_char_lm(corpus, order=2)

        # logits making both 'ab' and 'aa' (blank-separated) plausible,
        # with 'aa' slightly ahead on pure CTC
        lp = np.log(np.array([
            [[0.05, 0.9, 0.05],
             [0.55, 0.35, 0.10],
             [0.05, 0.65, 0.30]],
        ], np.float32))
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        mask = np.ones((1, 3), bool)

        cfg0 = BeamConfig(beam_width=8, topk=2, prune_logp=-30.0)
        pure = device_beam_decode(jnp.asarray(lp), jnp.asarray(mask), al, cfg0)
        cfg = BeamConfig(beam_width=8, topk=2, prune_logp=-30.0,
                         lm_alpha=2.0, lm_beta=0.0)
        fused = device_beam_decode(
            jnp.asarray(lp), jnp.asarray(mask), al, cfg, lm=lm
        )
        assert pure[0] == f"{a} {a}"
        assert fused[0] == f"{a} {b}"

    def test_lm_prefix_logp_matches_stateful_walk(self):
        from vistaocr_tpu.decode.lm import train_char_lm

        al = _alphabet(3)
        toks = [utf8_to_uxxxx(c) for c in "abc"]
        corpus = [" ".join(toks)] * 20
        lm = train_char_lm(corpus, order=3)
        ids = [al.index_of(t) for t in toks]
        got = lm_prefix_logp(lm, al, ids)
        state, ref = lm.start_state(), 0.0
        for t in toks:
            lp_, state = lm.score(state, t)
            ref += lp_
        assert math.isclose(got, ref, abs_tol=1e-9)


class TestFusedDeviceLM:
    """Interleaved ON-DEVICE LM fusion (dense table, order <= 3) vs the
    host oracle's interleaved fusion — same math, so decoded strings must
    match exactly (float ties are measure-zero in random cases)."""

    def _lm(self, al, order):
        from vistaocr_tpu.decode.lm import train_char_lm

        rng = np.random.default_rng(17)
        chars = [al.token_of(i) for i in range(1, al.num_classes)]
        corpus = [
            " ".join(rng.choice(chars, rng.integers(2, 9)))
            for _ in range(200)
        ]
        return train_char_lm(corpus, order=order)

    @pytest.mark.parametrize("order", [2, 3])
    def test_dense_table_matches_lm_logp(self, order):
        from vistaocr_tpu.decode.lm import BOS, dense_logp_table

        al = _alphabet(5)
        lm = self._lm(al, order)
        t = dense_logp_table(lm, al, order=order)
        K = al.num_classes
        BOS_ID = K
        tok = al.token_of
        if order == 2:
            assert t.shape == (K + 1, K)
            assert t[BOS_ID, 2] == pytest.approx(lm.logp((BOS,), tok(2)))
            assert t[3, 1] == pytest.approx(lm.logp((tok(3),), tok(1)))
            assert t[0, 4] == pytest.approx(lm.logp((), tok(4)))
        else:
            assert t.shape == (K + 1, K + 1, K)
            # start-of-line: history (<s>,)
            assert t[0, BOS_ID, 2] == pytest.approx(lm.logp((BOS,), tok(2)))
            # second char: history (<s>, t1)
            assert t[BOS_ID, 3, 1] == pytest.approx(
                lm.logp((BOS, tok(3)), tok(1)))
            # steady state
            assert t[2, 3, 4] == pytest.approx(
                lm.logp((tok(2), tok(3)), tok(4)))

    @pytest.mark.parametrize("order", [2, 3])
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_fused_matches_host_interleaved_oracle(self, order, seed):
        from vistaocr_tpu.decode.device_beam import beam_scan_collapsed
        from vistaocr_tpu.decode.lm import dense_logp_table

        lp, mask, frames = _random_case(seed, K=6, peaky=True)
        al = _alphabet(lp.shape[-1] - 1)
        lm = self._lm(al, order)
        cfg = BeamConfig(beam_width=8, topk=4, prune_logp=-12.0,
                         lm_alpha=0.7, lm_beta=0.3)
        table = jnp.asarray(dense_logp_table(lm, al, order=order))
        totals, packed = beam_scan_collapsed(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=cfg.beam_width,
            topk=cfg.topk, prune_logp=cfg.prune_logp, lm_table=table,
            lm_alpha=cfg.lm_alpha, lm_beta=cfg.lm_beta,
        )
        packed = np.asarray(packed)
        assert packed.shape == (lp.shape[0], lp.shape[1] + 1)
        for b in range(lp.shape[0]):
            hyps = prefix_beam_search(lp[b, : frames[b]], al, cfg, lm=lm)
            row = packed[b, :-1]
            got = al.decode(row[row != 0].tolist())
            assert got == hyps[0][0], (b, got, hyps[:3])
            # packed column = the winner's PURE-CTC total; the oracle's
            # fused score minus its LM/бonus parts is not directly
            # exposed, so check the ctc column is a plausible log-prob
            assert packed[b, -1] <= 0

    def test_fused_lm_steers_like_oracle(self):
        """A strong bigram LM that loves 'ab' must flip the device winner
        away from pure-CTC's choice, matching the oracle's flip."""
        from vistaocr_tpu.decode.beam import prefix_beam_search
        from vistaocr_tpu.decode.device_beam import beam_scan_collapsed
        from vistaocr_tpu.decode.lm import dense_logp_table, train_char_lm

        al = _alphabet(2)  # a, b
        lm = train_char_lm(
            [utf8_to_uxxxx("ab")] * 60 + [utf8_to_uxxxx("aa")], order=2)
        a, b = 1, 2
        T = 6
        lp = np.full((1, T, 3), -8.0, np.float32)
        # frames: a, blank, (a slightly > b), blank
        lp[0, 0, a] = -0.1
        lp[0, 1, 0] = -0.05
        lp[0, 2, a] = -0.55
        lp[0, 2, b] = -0.9
        lp[0, 3, 0] = -0.05
        lp[0, 4:, 0] = -0.02
        lp -= np.log(np.exp(lp).sum(-1, keepdims=True))
        mask = np.ones((1, T), bool)
        cfg = BeamConfig(beam_width=4, topk=2, prune_logp=-12.0,
                         lm_alpha=1.2, lm_beta=0.0)
        table = jnp.asarray(dense_logp_table(lm, al, order=2))
        _, packed = beam_scan_collapsed(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=4, topk=2,
            prune_logp=-12.0, lm_table=table, lm_alpha=1.2, lm_beta=0.0,
        )
        row = np.asarray(packed)[0, :-1]
        got = al.decode(row[row != 0].tolist())
        want = prefix_beam_search(lp[0], al, cfg, lm=lm)[0][0]
        assert got == want == utf8_to_uxxxx("ab")


class TestNBest:
    def test_nbest_matches_oracle_ranking(self):
        from vistaocr_tpu.decode.device_beam import (
            beam_scan_program,
            device_beam_nbest,
        )

        lp, mask, frames = _random_case(9, peaky=True)
        al = _alphabet(lp.shape[-1] - 1)
        cfg = BeamConfig(beam_width=8, topk=4, prune_logp=-12.0)
        prog = beam_scan_program(cfg, all_beams=True)
        pre = prog(jnp.asarray(lp), jnp.asarray(mask))
        lists = device_beam_nbest(al, cfg, pre, nbest=3)
        assert len(lists) == lp.shape[0]
        for b, ranked in enumerate(lists):
            hyps = prefix_beam_search(lp[b, : frames[b]], al, cfg)
            assert 1 <= len(ranked) <= 3
            # sorted descending, and matches the oracle's ranked list
            scores = [s for _, s in ranked]
            assert scores == sorted(scores, reverse=True)
            for (gh, gs), (oh, os_) in zip(ranked, hyps):
                assert gh == oh
                assert gs == pytest.approx(os_, abs=1e-4)

    def test_nbest_respects_valid_mask(self):
        from vistaocr_tpu.decode.device_beam import (
            beam_scan_program,
            device_beam_nbest,
        )

        lp, mask, _ = _random_case(11)
        al = _alphabet(lp.shape[-1] - 1)
        cfg = BeamConfig(beam_width=4, topk=3)
        prog = beam_scan_program(cfg, all_beams=True)
        pre = prog(jnp.asarray(lp), jnp.asarray(mask))
        valid = np.array([True, False] * (lp.shape[0] // 2))
        lists = device_beam_nbest(al, cfg, pre, valid=valid, nbest=2)
        assert len(lists) == valid.sum()


class TestDeviceLexicon:
    """On-device lexicon constraint (dense trie tables in the scan) vs
    the host oracle's trie gating — same rule, so decoded strings must
    match exactly."""

    def _lex(self, al, words):
        from vistaocr_tpu.decode.lexicon import Lexicon

        return Lexicon.from_words(al, words)

    def _alphabet_sp(self, n_symbols):
        chars = "abcdefghijklmnopqrstuvwxyz"[:n_symbols]
        return Alphabet.build([utf8_to_uxxxx(chars + " ")])

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    @pytest.mark.parametrize("with_lm", [False, True])
    def test_matches_host_lexicon_oracle(self, seed, with_lm):
        from vistaocr_tpu.decode.device_beam import beam_scan_collapsed
        from vistaocr_tpu.decode.lm import dense_logp_table, train_char_lm

        lp, mask, frames = _random_case(seed, K=7, peaky=True)
        al = self._alphabet_sp(5)
        assert al.num_classes == lp.shape[-1]
        rng = np.random.default_rng(seed + 100)
        chars = "abcde"
        words = sorted({
            "".join(rng.choice(list(chars), rng.integers(1, 4)))
            for _ in range(12)
        })
        lex = self._lex(al, words)
        next_tbl, boundary = lex.dense_tables()
        lm = None
        lm_kw = {}
        cfg = BeamConfig(beam_width=8, topk=4, prune_logp=-12.0)
        if with_lm:
            corpus = [" ".join(rng.choice(words, rng.integers(1, 4)))
                      for _ in range(100)]
            lm = train_char_lm(
                [utf8_to_uxxxx(t) for t in corpus], order=2)
            cfg = BeamConfig(beam_width=8, topk=4, prune_logp=-12.0,
                             lm_alpha=0.6, lm_beta=0.2)
            lm_kw = dict(
                lm_table=jnp.asarray(dense_logp_table(lm, al, order=2)),
                lm_alpha=0.6, lm_beta=0.2,
            )
        totals, packed = beam_scan_collapsed(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=8, topk=4,
            prune_logp=-12.0, lex_next=jnp.asarray(next_tbl),
            lex_boundary=jnp.asarray(boundary), **lm_kw,
        )
        packed = np.asarray(packed)
        for b in range(lp.shape[0]):
            hyps = prefix_beam_search(
                lp[b, : frames[b]], al, cfg, lm=lm, lexicon=lex)
            row = packed[b, :-1]
            got = al.decode(row[row != 0].tolist())
            assert got == hyps[0][0], (b, got, hyps[:3])

    def test_constraint_kills_nonwords(self):
        from vistaocr_tpu.decode.device_beam import beam_scan_collapsed

        al = self._alphabet_sp(3)  # a b c + space
        a = al.index_of(utf8_to_uxxxx("a"))
        b = al.index_of(utf8_to_uxxxx("b"))
        c = al.index_of(utf8_to_uxxxx("c"))
        lex = self._lex(al, ["cab", "ca"])
        next_tbl, boundary = lex.dense_tables()
        T = 7
        lp = np.full((1, T, al.num_classes), -7.0, np.float32)
        # peaked on "cbb" — not a lexicon word
        for t, sym in enumerate([c, 0, b, 0, b]):
            lp[0, t, sym] = -0.3
        lp -= np.log(np.exp(lp).sum(-1, keepdims=True))
        mask = np.ones((1, T), bool)
        _, packed = beam_scan_collapsed(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=8, topk=3,
            prune_logp=-12.0, lex_next=jnp.asarray(next_tbl),
            lex_boundary=jnp.asarray(boundary),
        )
        row = np.asarray(packed)[0, :-1]
        got = al.decode(row[row != 0].tolist())
        # must be a concatenation of lexicon words, never "cbb"
        text = "".join(chr(int(t[1:], 16)) for t in got.split())
        for w in text.split():
            assert w in ("cab", "ca"), (got, text)


class TestDeviceWordLM:
    """Full L∘G on device: lexicon trie + word-bigram fusion inside the
    scan vs the host oracle (lexicon + word_lm) — string-exact."""

    def _alphabet_sp(self, n_symbols):
        chars = "abcdefghijklmnopqrstuvwxyz"[:n_symbols]
        return Alphabet.build([utf8_to_uxxxx(chars + " ")])

    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    def test_matches_host_word_lm_oracle(self, seed):
        from vistaocr_tpu.decode.device_beam import beam_scan_collapsed
        from vistaocr_tpu.decode.lexicon import Lexicon
        from vistaocr_tpu.decode.lm import (
            dense_word_logp_table,
            train_char_lm,
        )

        lp, mask, frames = _random_case(seed, K=7, peaky=True)
        al = self._alphabet_sp(5)
        rng = np.random.default_rng(seed + 31)
        words = sorted({
            "".join(rng.choice(list("abcde"), rng.integers(1, 4)))
            for _ in range(10)
        })
        lex = Lexicon.from_words(al, words)
        # word bigram over utf8 word tokens
        wlm = train_char_lm(
            [" ".join(rng.choice(words, rng.integers(1, 4)))
             for _ in range(120)],
            order=2,
        )
        cfg = BeamConfig(beam_width=8, topk=4, prune_logp=-12.0,
                         word_lm_alpha=0.8, word_lm_beta=0.3)
        next_tbl, boundary = lex.dense_tables()
        wt = dense_word_logp_table(wlm, lex.words)
        _, packed = beam_scan_collapsed(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=8, topk=4,
            prune_logp=-12.0,
            lex_next=jnp.asarray(next_tbl),
            lex_boundary=jnp.asarray(boundary),
            word_table=jnp.asarray(wt),
            word_ids=jnp.asarray(lex.word_id_table()),
            space_id=lex.space_id, word_alpha=0.8, word_beta=0.3,
        )
        packed = np.asarray(packed)
        for b in range(lp.shape[0]):
            hyps = prefix_beam_search(
                lp[b, : frames[b]], al, cfg, lexicon=lex, word_lm=wlm)
            row = packed[b, :-1]
            got = al.decode(row[row != 0].tolist())
            assert got == hyps[0][0], (b, got, hyps[:3])

    def test_word_lm_requires_lexicon_tables(self):
        from vistaocr_tpu.decode.device_beam import beam_scan

        lp = jnp.zeros((1, 4, 4), jnp.float32)
        mask = jnp.ones((1, 4), bool)
        with pytest.raises(ValueError, match="lex_next"):
            beam_scan(lp, mask, beam_width=4, topk=2, prune_logp=-12.0,
                      word_table=jnp.zeros((3, 2)))


class TestNoBoundaryFallback:
    """Pin the DOCUMENTED device/host divergence in the lexicon
    no-boundary fallback (device_beam.beam_scan_collapsed docstring):
    when NO beam ends at a word boundary, the device selects among
    mid-word finals WITHOUT scoring the trailing partial word (word_ids
    is -1 mid-word), while the host oracle's final_score still queries
    the word LM for the partial. This test constructs that pathological
    case and asserts the chosen device behavior so it cannot drift
    silently; docs/decoding.md records the divergence."""

    def test_device_ranks_by_ctc_host_scores_trailing_partial(self):
        from vistaocr_tpu.decode.device_beam import beam_scan_collapsed
        from vistaocr_tpu.decode.lexicon import Lexicon
        from vistaocr_tpu.decode.lm import (
            dense_word_logp_table,
            train_char_lm,
        )

        al = Alphabet.build([utf8_to_uxxxx("abc ")])
        a = al.index_of(utf8_to_uxxxx("a"))
        c = al.index_of(utf8_to_uxxxx("c"))
        # Both lexicon words are 2 chars; a 1-frame line ends every beam
        # mid-word, so no boundary-ending beam exists.
        lex = Lexicon.from_words(al, ["ab", "cb"])
        # The word LM knows "a" as a frequent standalone WORD (it is not
        # a lexicon word, so the device's dense table cannot see it, but
        # the host oracle's trailing-partial query can).
        wlm = train_char_lm(["a"] * 60 + ["ab", "cb"], order=2)

        T = 1
        lp = np.full((1, T, al.num_classes), -7.0, np.float32)
        lp[0, 0, c] = -0.3  # CTC prefers "c"
        lp[0, 0, a] = -0.5
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        mask = np.ones((1, T), bool)

        cfg = BeamConfig(beam_width=2, topk=2, prune_logp=-12.0,
                         word_lm_alpha=3.0, word_lm_beta=0.0)
        nt, bd = lex.dense_tables()
        _, packed = beam_scan_collapsed(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=2, topk=2,
            prune_logp=-12.0,
            lex_next=jnp.asarray(nt), lex_boundary=jnp.asarray(bd),
            word_table=jnp.asarray(dense_word_logp_table(wlm, lex.words)),
            word_ids=jnp.asarray(lex.word_id_table()),
            space_id=lex.space_id, word_alpha=3.0, word_beta=0.0,
        )
        row = np.asarray(packed)[0, :-1]
        got = al.decode(row[row != 0].tolist())
        # Pinned device behavior: ungated fallback, trailing partial
        # UNSCORED -> pure CTC ranking picks "c".
        assert got == utf8_to_uxxxx("c")
        # The host oracle scores the trailing partial ("a" is a likely
        # word under the LM) and flips the winner — the divergence this
        # test documents. If this assertion ever fails the two engines
        # have converged and the docstrings should be updated.
        hyps = prefix_beam_search(lp[0], al, cfg, lexicon=lex, word_lm=wlm)
        assert hyps[0][0] == utf8_to_uxxxx("a")


class TestFullStackParity:
    """All three fusions at once — char trigram + lexicon trie + word
    bigram — device vs host oracle, string-exact (the triple combination
    the pairwise suites don't cover)."""

    @pytest.mark.parametrize("seed", [5, 17])
    def test_triple_fusion_matches_oracle(self, seed):
        from vistaocr_tpu.decode.device_beam import beam_scan_collapsed
        from vistaocr_tpu.decode.lexicon import Lexicon
        from vistaocr_tpu.decode.lm import (
            dense_logp_table,
            dense_word_logp_table,
            train_char_lm,
        )

        rng = np.random.default_rng(seed)
        chars = "abcdef"
        al = Alphabet.build([utf8_to_uxxxx(chars + " ")])
        K = al.num_classes
        B, T, W, k = 4, 60, 8, 4
        logits = rng.normal(0, 2.5, (B, T, K)).astype(np.float32)
        logits[..., 0] += 1.5
        lp = (logits - np.log(np.exp(logits).sum(-1, keepdims=True))
              ).astype(np.float32)
        frames = rng.integers(10, T + 1, B).astype(np.int32)
        mask = np.arange(T)[None, :] < frames[:, None]
        words = sorted({
            "".join(rng.choice(list(chars), rng.integers(1, 5)))
            for _ in range(15)
        })
        lex = Lexicon.from_words(al, words)
        corpus = [" ".join(rng.choice(words, 3)) for _ in range(100)]
        wlm = train_char_lm(corpus, order=2)
        clm = train_char_lm([utf8_to_uxxxx(s) for s in corpus], order=3)
        cfg = BeamConfig(beam_width=W, topk=k, prune_logp=-12.0,
                         lm_alpha=0.5, lm_beta=0.2,
                         word_lm_alpha=0.7, word_lm_beta=0.3)
        nt, bd = lex.dense_tables()
        _, packed = beam_scan_collapsed(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=W, topk=k,
            prune_logp=-12.0,
            lm_table=jnp.asarray(dense_logp_table(clm, al, order=3)),
            lm_alpha=0.5, lm_beta=0.2,
            lex_next=jnp.asarray(nt), lex_boundary=jnp.asarray(bd),
            word_table=jnp.asarray(dense_word_logp_table(wlm, lex.words)),
            word_ids=jnp.asarray(lex.word_id_table()),
            space_id=lex.space_id, word_alpha=0.7, word_beta=0.3,
        )
        packed = np.asarray(packed)
        for b in range(B):
            hyps = prefix_beam_search(
                lp[b, : frames[b]], al, cfg, lm=clm, lexicon=lex,
                word_lm=wlm)
            row = packed[b, :-1]
            assert al.decode(row[row != 0].tolist()) == hyps[0][0]


class TestUnkBypass:
    """The lexicon character-bypass escape (<unk> loop) — VERDICT r3
    task 1's mitigation: out-of-lexicon words decode with a per-char
    penalty instead of being forced onto a wrong in-vocab word. Device
    (dense tables + appended unk row) vs host oracle, string-exact."""

    def _alphabet_sp(self, chars="abcdef"):
        return Alphabet.build([utf8_to_uxxxx(chars + " ")])

    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("with_wlm", [False, True])
    def test_matches_host_oracle(self, seed, with_wlm):
        from vistaocr_tpu.decode.device_beam import beam_scan_collapsed
        from vistaocr_tpu.decode.lexicon import Lexicon
        from vistaocr_tpu.decode.lm import (
            dense_word_logp_table,
            train_char_lm,
            word_unk_logp,
        )

        rng = np.random.default_rng(seed + 400)
        al = self._alphabet_sp()
        K = al.num_classes
        B, T = 5, 30
        logits = rng.normal(0, 2.5, (B, T, K)).astype(np.float32)
        logits[..., 0] += 1.5
        lp = (logits - np.log(np.exp(logits).sum(-1, keepdims=True))
              ).astype(np.float32)
        frames = rng.integers(10, T + 1, B).astype(np.int32)
        mask = np.arange(T)[None, :] < frames[:, None]
        words = sorted({
            "".join(rng.choice(list("abcdef"), rng.integers(1, 4)))
            for _ in range(8)
        })
        lex = Lexicon.from_words(al, words)
        cfg = BeamConfig(beam_width=8, topk=4, prune_logp=-12.0,
                         lex_unk_logp=-2.5)
        kw = dict(space_id=lex.space_id)
        wlm = None
        if with_wlm:
            wlm = train_char_lm(
                [" ".join(rng.choice(words, 3)) for _ in range(60)],
                order=2)
            cfg.word_lm_alpha, cfg.word_lm_beta = 0.7, 0.3
            kw.update(
                word_table=jnp.asarray(
                    dense_word_logp_table(wlm, lex.words)),
                word_ids=jnp.asarray(lex.word_id_table(unk=True)),
                word_alpha=0.7, word_beta=0.3,
                word_unk_logp=word_unk_logp(wlm),
            )
        nt, bd = lex.dense_tables(unk=True)
        _, packed = beam_scan_collapsed(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=8, topk=4,
            prune_logp=-12.0, lex_next=jnp.asarray(nt),
            lex_boundary=jnp.asarray(bd), lex_unk_logp=-2.5, **kw,
        )
        packed = np.asarray(packed)
        for b in range(B):
            hyps = prefix_beam_search(
                lp[b, : frames[b]], al, cfg, lexicon=lex, word_lm=wlm)
            row = packed[b, :-1]
            got = al.decode(row[row != 0].tolist())
            assert got == hyps[0][0], (b, got, hyps[:3])

    def test_oov_word_recovered(self):
        """Posteriors that clearly spell an out-of-lexicon word: the
        HARD constraint must force a wrong in-vocab word; the bypass
        must recover the true spelling (the OOV failure mode the
        mitigation exists for)."""
        from vistaocr_tpu.decode.device_beam import beam_scan_collapsed
        from vistaocr_tpu.decode.lexicon import Lexicon

        al = self._alphabet_sp()
        lex = Lexicon.from_words(al, ["bad", "cafe", "fed"])
        # spell "dec" (not in the lexicon) very confidently
        ids = [al.index_of(utf8_to_uxxxx(ch)) for ch in "dec"]
        T, K = 7, al.num_classes
        lp = np.full((1, T, K), -12.0, np.float32)
        seq = [0, ids[0], 0, ids[1], 0, ids[2], 0]
        for t, c in enumerate(seq):
            lp[0, t, c] = -0.01
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        mask = np.ones((1, T), bool)

        for unk_pen, expect_oov in ((0.0, False), (-2.5, True)):
            nt, bd = lex.dense_tables(unk=unk_pen != 0.0)
            _, packed = beam_scan_collapsed(
                jnp.asarray(lp), jnp.asarray(mask), beam_width=8, topk=4,
                prune_logp=-20.0, lex_next=jnp.asarray(nt),
                lex_boundary=jnp.asarray(bd), lex_unk_logp=unk_pen,
                space_id=lex.space_id,
            )
            row = np.asarray(packed)[0, :-1]
            got = al.decode(row[row != 0].tolist())
            from vistaocr_tpu.text import uxxxx_to_utf8

            text = uxxxx_to_utf8(got)
            if expect_oov:
                assert text == "dec", text
            else:
                assert text != "dec", text  # constraint forces in-vocab
            # host oracle agrees in both modes
            cfg = BeamConfig(beam_width=8, topk=4, prune_logp=-20.0,
                             lex_unk_logp=unk_pen)
            hyps = prefix_beam_search(lp[0], al, cfg, lexicon=lex)
            assert got == hyps[0][0]


class TestConstrainedNBest:
    """--nbest composes with the fused LM/lexicon stack on device
    (VERDICT r3 task 8): the all-beams fused scan returns per-slot FUSED
    finals, and the host n-best expansion over them must reproduce the
    host oracle's ranked list (same beams, same scores, same order)."""

    @pytest.mark.parametrize("seed", [3, 11])
    def test_fused_nbest_matches_oracle_list(self, seed):
        from vistaocr_tpu.decode.device_beam import (
            beam_scan_collapsed,
            device_beam_nbest,
        )
        from vistaocr_tpu.decode.lexicon import Lexicon
        from vistaocr_tpu.decode.lm import (
            dense_logp_table,
            dense_word_logp_table,
            train_char_lm,
        )

        rng = np.random.default_rng(seed)
        chars = "abcdef"
        al = Alphabet.build([utf8_to_uxxxx(chars + " ")])
        K = al.num_classes
        B, T, W, k = 4, 40, 8, 4
        logits = rng.normal(0, 2.5, (B, T, K)).astype(np.float32)
        logits[..., 0] += 1.5
        lp = (logits - np.log(np.exp(logits).sum(-1, keepdims=True))
              ).astype(np.float32)
        frames = rng.integers(10, T + 1, B).astype(np.int32)
        mask = np.arange(T)[None, :] < frames[:, None]
        words = sorted({
            "".join(rng.choice(list(chars), rng.integers(1, 5)))
            for _ in range(15)
        })
        lex = Lexicon.from_words(al, words)
        corpus = [" ".join(rng.choice(words, 3)) for _ in range(100)]
        wlm = train_char_lm(corpus, order=2)
        clm = train_char_lm([utf8_to_uxxxx(s) for s in corpus], order=3)
        cfg = BeamConfig(beam_width=W, topk=k, prune_logp=-12.0,
                         lm_alpha=0.5, lm_beta=0.2,
                         word_lm_alpha=0.7, word_lm_beta=0.3)
        nt, bd = lex.dense_tables()
        pre = beam_scan_collapsed(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=W, topk=k,
            prune_logp=-12.0, all_beams=True,
            lm_table=jnp.asarray(dense_logp_table(clm, al, order=3)),
            lm_alpha=0.5, lm_beta=0.2,
            lex_next=jnp.asarray(nt), lex_boundary=jnp.asarray(bd),
            word_table=jnp.asarray(dense_word_logp_table(wlm, lex.words)),
            word_ids=jnp.asarray(lex.word_id_table()),
            space_id=lex.space_id, word_alpha=0.7, word_beta=0.3,
        )
        assert len(pre) == 3  # (totals, fused, emitted)
        lists = device_beam_nbest(al, cfg, pre, nbest=5)
        assert len(lists) == B
        for b in range(B):
            hyps = prefix_beam_search(
                lp[b, : frames[b]], al, cfg, lm=clm, lexicon=lex,
                word_lm=wlm)[:5]
            got = lists[b]
            assert [h for h, _ in got] == [h for h, _ in hyps], (
                b, got, hyps)
            for (_, sg), (_, sh) in zip(got, hyps):
                assert abs(sg - sh) < 1e-3, (b, got, hyps)
            # ranked descending
            scores = [s for _, s in got]
            assert scores == sorted(scores, reverse=True)

    def test_fused_nbest_top1_matches_packed_best(self):
        from vistaocr_tpu.decode.device_beam import (
            beam_scan_collapsed,
            device_beam_nbest,
        )
        from vistaocr_tpu.decode.lm import dense_logp_table, train_char_lm

        lp, mask, frames = _random_case(21, K=7, peaky=True)
        al = _alphabet(6)
        rng = np.random.default_rng(99)
        texts = ["".join(rng.choice(list("abcdef"), rng.integers(3, 10)))
                 for _ in range(50)]
        clm = train_char_lm([utf8_to_uxxxx(t) for t in texts], order=3)
        tbl = jnp.asarray(dense_logp_table(clm, al, order=3))
        cfg = BeamConfig(beam_width=8, topk=4, prune_logp=-12.0,
                         lm_alpha=0.6, lm_beta=0.2)
        pre = beam_scan_collapsed(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=8, topk=4,
            prune_logp=-12.0, all_beams=True, lm_table=tbl,
            lm_alpha=0.6, lm_beta=0.2,
        )
        lists = device_beam_nbest(al, cfg, pre, nbest=3)
        _, packed = beam_scan_collapsed(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=8, topk=4,
            prune_logp=-12.0, lm_table=tbl, lm_alpha=0.6, lm_beta=0.2,
        )
        packed = np.asarray(packed)
        for b in range(lp.shape[0]):
            row = packed[b, :-1]
            best = al.decode(row[row != 0].tolist())
            assert lists[b][0][0] == best


class TestHashedOrder4LM:
    """Order-4 char-LM fusion via the hashed context table
    (decode/lm.hashed_logp_table) — VERDICT r3 task 2 closes the 4-gram
    device-fusion cliff. Hits resolve through the open-addressed table,
    misses and short histories through the exact trigram fallback, so
    the device must stay string-exact vs the host oracle driving the
    same 4-gram ArpaLM."""

    def _lm_and_alphabet(self, seed, with_space=False):
        from vistaocr_tpu.decode.lm import train_char_lm

        chars = "abcdef"
        al = Alphabet.build(
            [utf8_to_uxxxx(chars + (" " if with_space else ""))])
        rng = np.random.default_rng(seed + 77)
        texts = [
            "".join(rng.choice(list(chars), rng.integers(3, 12)))
            for _ in range(60)
        ]
        lm = train_char_lm([utf8_to_uxxxx(t) for t in texts], order=4)
        return al, lm, rng

    def test_table_resolution_matches_lm_logp(self):
        """Host-side replay of the device lookup (hash probe else
        trigram fallback) against lm.logp for every reachable context
        shape: short, <s>-rooted, observed, unobserved."""
        from vistaocr_tpu.decode.lm import hashed_logp_table

        al, lm, rng = self._lm_and_alphabet(0)
        K = al.num_classes
        tabs = hashed_logp_table(lm, al)
        keys, vals, rows, t3 = (tabs["keys"], tabs["vals"], tabs["rows"],
                                tabs["t3"])
        S = keys.shape[0]
        shift = 32 - (S.bit_length() - 1)
        toks = [None] + al.tokens

        def lookup(h1, h2, h3, c):
            key = (h1 * (K + 1) + h2) * (K + 1) + h3
            idx = ((key * 2654435761) & 0xFFFFFFFF) >> shift
            for j in range(tabs["probes"]):
                s = (idx + j) & (S - 1)
                if keys[s] == key:
                    return float(rows[vals[s], c])
            return float(t3[h2, h3, c])

        cases = [(0, 0, K), (0, K, 1), (K, 1, 2)]
        for _ in range(40):
            cases.append(tuple(int(x) for x in rng.integers(1, K, 3)))
        for h1, h2, h3 in cases:
            hist = tuple(
                ("<s>" if i == K else toks[i]) for i in (h1, h2, h3)
                if i != 0
            )
            for c in range(1, K):
                want = lm.logp(hist, toks[c])
                got = lookup(h1, h2, h3, c)
                assert abs(got - want) < 1e-5, ((h1, h2, h3), c, got, want)

    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    def test_matches_host_4gram_oracle(self, seed):
        from vistaocr_tpu.decode.device_beam import beam_scan_collapsed
        from vistaocr_tpu.decode.lm import hashed_logp_table

        lp, mask, frames = _random_case(seed, K=7, peaky=True)
        al, lm, _ = self._lm_and_alphabet(seed)
        assert al.num_classes == lp.shape[-1]
        tabs = hashed_logp_table(lm, al)
        cfg = BeamConfig(beam_width=8, topk=4, prune_logp=-12.0,
                         lm_alpha=0.7, lm_beta=0.25)
        _, packed = beam_scan_collapsed(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=8, topk=4,
            prune_logp=-12.0,
            lm_table=jnp.asarray(tabs["t3"]), lm_alpha=0.7, lm_beta=0.25,
            lm_hash_keys=jnp.asarray(tabs["keys"]),
            lm_hash_vals=jnp.asarray(tabs["vals"]),
            lm_rows=jnp.asarray(tabs["rows"]), lm_probes=tabs["probes"],
        )
        packed = np.asarray(packed)
        for b in range(lp.shape[0]):
            hyps = prefix_beam_search(lp[b, : frames[b]], al, cfg, lm=lm)
            row = packed[b, :-1]
            got = al.decode(row[row != 0].tolist())
            assert got == hyps[0][0], (b, got, hyps[:3])

    @pytest.mark.parametrize("seed", [9, 23])
    def test_quadruple_fusion_matches_oracle(self, seed):
        """4-gram char LM + lexicon + word bigram, all inside one scan:
        the order-4 context carry must compose with the trie and word
        state exactly as the host oracle does."""
        from vistaocr_tpu.decode.device_beam import beam_scan_collapsed
        from vistaocr_tpu.decode.lexicon import Lexicon
        from vistaocr_tpu.decode.lm import (
            dense_word_logp_table,
            hashed_logp_table,
            train_char_lm,
        )

        rng = np.random.default_rng(seed)
        chars = "abcdef"
        al = Alphabet.build([utf8_to_uxxxx(chars + " ")])
        K = al.num_classes
        B, T, W, k = 4, 48, 8, 4
        logits = rng.normal(0, 2.5, (B, T, K)).astype(np.float32)
        logits[..., 0] += 1.5
        lp = (logits - np.log(np.exp(logits).sum(-1, keepdims=True))
              ).astype(np.float32)
        frames = rng.integers(10, T + 1, B).astype(np.int32)
        mask = np.arange(T)[None, :] < frames[:, None]
        words = sorted({
            "".join(rng.choice(list(chars), rng.integers(1, 5)))
            for _ in range(15)
        })
        lex = Lexicon.from_words(al, words)
        corpus = [" ".join(rng.choice(words, 3)) for _ in range(100)]
        wlm = train_char_lm(corpus, order=2)
        clm = train_char_lm([utf8_to_uxxxx(s) for s in corpus], order=4)
        tabs = hashed_logp_table(clm, al)
        cfg = BeamConfig(beam_width=W, topk=k, prune_logp=-12.0,
                         lm_alpha=0.5, lm_beta=0.2,
                         word_lm_alpha=0.7, word_lm_beta=0.3)
        nt, bd = lex.dense_tables()
        _, packed = beam_scan_collapsed(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=W, topk=k,
            prune_logp=-12.0,
            lm_table=jnp.asarray(tabs["t3"]), lm_alpha=0.5, lm_beta=0.2,
            lm_hash_keys=jnp.asarray(tabs["keys"]),
            lm_hash_vals=jnp.asarray(tabs["vals"]),
            lm_rows=jnp.asarray(tabs["rows"]), lm_probes=tabs["probes"],
            lex_next=jnp.asarray(nt), lex_boundary=jnp.asarray(bd),
            word_table=jnp.asarray(dense_word_logp_table(wlm, lex.words)),
            word_ids=jnp.asarray(lex.word_id_table()),
            space_id=lex.space_id, word_alpha=0.7, word_beta=0.3,
        )
        packed = np.asarray(packed)
        for b in range(B):
            hyps = prefix_beam_search(
                lp[b, : frames[b]], al, cfg, lm=clm, lexicon=lex,
                word_lm=wlm)
            row = packed[b, :-1]
            assert al.decode(row[row != 0].tolist()) == hyps[0][0]


class TestHashedWordLM:
    """The hashed word-bigram form (decode/lm.hashed_word_logp_table) —
    the vocabulary-scale path (round 5, VERDICT r4 missing #1). Exactness
    vs the dense table, string parity vs the host oracle, and the
    >8k-word selection that the dense cap forbids."""

    def _alphabet_sp(self, n_symbols):
        chars = "abcdefghijklmnopqrstuvwxyz"[:n_symbols]
        return Alphabet.build([utf8_to_uxxxx(chars + " ")])

    def _word_lm_case(self, seed, n_words=12):
        from vistaocr_tpu.decode.lexicon import Lexicon
        from vistaocr_tpu.decode.lm import train_char_lm

        al = self._alphabet_sp(5)
        rng = np.random.default_rng(seed + 77)
        words = sorted({
            "".join(rng.choice(list("abcde"), rng.integers(1, 4)))
            for _ in range(n_words)
        })
        lex = Lexicon.from_words(al, words)
        wlm = train_char_lm(
            [" ".join(rng.choice(words, rng.integers(1, 4)))
             for _ in range(120)],
            order=2,
        )
        return al, lex, wlm

    def test_hashed_matches_dense_for_every_pair(self):
        """Every (context, word) query must agree bit-for-bit with the
        dense table — including unobserved bigrams (Katz fallback) and
        out-of-LM words (unk floor)."""
        from vistaocr_tpu.decode.device_beam import _word_logp_gather
        from vistaocr_tpu.decode.lm import (
            dense_word_logp_table,
            hashed_word_logp_table,
        )

        _, lex, wlm = self._word_lm_case(3)
        words = lex.words + ["zzz", "qq"]  # out-of-LM lexicon words
        dense = dense_word_logp_table(wlm, words)
        t = hashed_word_logp_table(wlm, words)
        V = len(words)
        h = np.repeat(np.arange(V + 1, dtype=np.int32), V)
        w = np.tile(np.arange(V, dtype=np.int32), V + 1)
        got = np.asarray(_word_logp_gather(
            jnp.asarray(h), jnp.asarray(w),
            word_uni=jnp.asarray(t["uni"]), word_bo=jnp.asarray(t["bo"]),
            word_hash_keys=jnp.asarray(t["keys"]),
            word_hash_vals=jnp.asarray(t["vals"]),
            word_probes=int(t["probes"]),
        ))
        np.testing.assert_array_equal(got, dense[h, w])

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_hashed_matches_host_word_lm_oracle(self, seed):
        """Force the hashed path on a small vocab: string-exact parity
        with the host lexicon+word-LM oracle, same gate as the dense
        path's TestDeviceWordLM."""
        from vistaocr_tpu.decode.device_beam import beam_scan_collapsed
        from vistaocr_tpu.decode.lm import hashed_word_logp_table

        lp, mask, frames = _random_case(seed, K=7, peaky=True)
        al, lex, wlm = self._word_lm_case(seed)
        cfg = BeamConfig(beam_width=8, topk=4, prune_logp=-12.0,
                         word_lm_alpha=0.8, word_lm_beta=0.3)
        next_tbl, boundary = lex.dense_tables()
        t = hashed_word_logp_table(wlm, lex.words)
        _, packed = beam_scan_collapsed(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=8, topk=4,
            prune_logp=-12.0,
            lex_next=jnp.asarray(next_tbl),
            lex_boundary=jnp.asarray(boundary),
            word_uni=jnp.asarray(t["uni"]), word_bo=jnp.asarray(t["bo"]),
            word_hash_keys=jnp.asarray(t["keys"]),
            word_hash_vals=jnp.asarray(t["vals"]),
            word_probes=int(t["probes"]),
            word_ids=jnp.asarray(lex.word_id_table()),
            space_id=lex.space_id, word_alpha=0.8, word_beta=0.3,
        )
        packed = np.asarray(packed)
        for b in range(lp.shape[0]):
            hyps = prefix_beam_search(
                lp[b, : frames[b]], al, cfg, lexicon=lex, word_lm=wlm)
            row = packed[b, :-1]
            got = al.decode(row[row != 0].tolist())
            assert got == hyps[0][0], (b, got, hyps[:3])

    def test_device_word_tables_picks_hashed_beyond_dense_cap(self):
        from vistaocr_tpu.decode.lm import (
            DENSE_WORD_CAP,
            device_word_tables,
            train_char_lm,
        )

        rng = np.random.default_rng(9)
        words = sorted({
            "".join(rng.choice(list("abcdefghij"), 6))
            for _ in range(DENSE_WORD_CAP + 600)
        })[: DENSE_WORD_CAP + 300]
        wlm = train_char_lm(
            [" ".join(words[:50]) for _ in range(3)], order=2)
        kw = device_word_tables(wlm, words)
        assert "word_uni" in kw and kw["word_uni"].shape == (len(words),)
        assert "word_table" not in kw
        small = device_word_tables(wlm, words[:100])
        assert "word_table" in small and "word_uni" not in small

    def test_vocab_beyond_uint32_packing_rejected(self):
        from vistaocr_tpu.decode.lm import (
            HASHED_WORD_CAP,
            hashed_word_logp_table,
            train_char_lm,
        )

        wlm = train_char_lm(["ab ba"], order=2)
        with pytest.raises(ValueError, match="host expansion"):
            hashed_word_logp_table(
                wlm, [f"w{i}" for i in range(HASHED_WORD_CAP + 1)])


class TestDeviceWordTrigram:
    """Order-3 G on device (decode/lm.hashed_word_trigram_tables): the
    Kaldi-era G.fst was routinely a pruned word TRIGRAM; the device L∘G
    previously stopped at bigrams. Exactness of the two-level hashed
    lookup vs ArpaLM.logp over every context shape (NONE sentinel, <s>,
    injected Katz backoffs, unseen trigrams), string parity vs the host
    oracle — alone and composed with the <unk> bypass — and the
    representation-selection/cap rules."""

    def _alphabet_sp(self, n_symbols):
        chars = "abcdefghijklmnopqrstuvwxyz"[:n_symbols]
        return Alphabet.build([utf8_to_uxxxx(chars + " ")])

    def _trigram_case(self, seed, n_words=10, n_sents=150):
        from vistaocr_tpu.decode.lexicon import Lexicon
        from vistaocr_tpu.decode.lm import train_char_lm

        al = self._alphabet_sp(5)
        rng = np.random.default_rng(seed + 77)
        words = sorted({
            "".join(rng.choice(list("abcde"), rng.integers(1, 4)))
            for _ in range(n_words)
        })
        lex = Lexicon.from_words(al, words)
        wlm = train_char_lm(
            [" ".join(rng.choice(words, rng.integers(1, 5)))
             for _ in range(n_sents)],
            order=3,
        )
        # train_char_lm leaves every backoff weight at 0; inject nonzero
        # Katz weights on a third of the bigram contexts so the ctx_bo
        # path is exercised (host scoring shifts identically — parity
        # still gates).
        for i, (ng, (lp, _)) in enumerate(sorted(wlm.tables[1].items())):
            if i % 3 == 0:
                wlm.tables[1][ng] = (lp, -0.31 * (1 + i % 5))
        return al, lex, wlm

    def test_gather_matches_arpa_logp_every_context_shape(self):
        """Every (prev2, prev1, word) query — including prev2 = NONE
        (sentence start), prev2/prev1 = <s>, unseen trigrams (ctx_bo +
        bigram fallback) and unseen contexts (pure bigram) — must match
        ArpaLM.logp to f32."""
        from vistaocr_tpu.decode.device_beam import _word_logp_gather
        from vistaocr_tpu.decode.lm import BOS, device_word_tables

        _, lex, wlm = self._trigram_case(3)
        words = lex.words
        V = len(words)
        t = device_word_tables(wlm, words)
        assert "word_ctx_keys" in t and "word_tri_keys" in t
        kw = {k: (v if isinstance(v, int) else jnp.asarray(v))
              for k, v in t.items()}
        p2, p1, w = np.meshgrid(
            np.arange(V + 2), np.arange(V + 1), np.arange(V),
            indexing="ij")
        got = np.asarray(_word_logp_gather(
            jnp.asarray(p1.reshape(-1).astype(np.int32)),
            jnp.asarray(w.reshape(-1).astype(np.int32)),
            wprev2=jnp.asarray(p2.reshape(-1).astype(np.int32)),
            word_uni=kw["word_uni"], word_bo=kw["word_bo"],
            word_hash_keys=kw["word_hash_keys"],
            word_hash_vals=kw["word_hash_vals"],
            word_probes=t["word_probes"],
            word_ctx_keys=kw["word_ctx_keys"],
            word_ctx_ids=kw["word_ctx_ids"],
            word_ctx_bo=kw["word_ctx_bo"],
            word_ctx_probes=t["word_ctx_probes"],
            word_tri_keys=kw["word_tri_keys"],
            word_tri_vals=kw["word_tri_vals"],
            word_tri_probes=t["word_tri_probes"],
        )).reshape(V + 2, V + 1, V)

        def tok(i):
            return BOS if i == V else words[i]

        for a in range(V + 2):
            for b in range(V + 1):
                for c in range(V):
                    hist = ((tok(b),) if a == V + 1
                            else (tok(a), tok(b)))
                    want = np.float32(wlm.logp(hist, words[c]))
                    assert np.isclose(got[a, b, c], want,
                                      atol=2e-5, rtol=1e-5), \
                        (a, b, c, got[a, b, c], want)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_host_word_trigram_oracle(self, seed):
        from vistaocr_tpu.decode.device_beam import beam_scan_collapsed
        from vistaocr_tpu.decode.lm import device_word_tables

        lp, mask, frames = _random_case(seed, K=7, peaky=True)
        al, lex, wlm = self._trigram_case(seed)
        cfg = BeamConfig(beam_width=8, topk=4, prune_logp=-12.0,
                         word_lm_alpha=0.8, word_lm_beta=0.3)
        next_tbl, boundary = lex.dense_tables()
        t = device_word_tables(wlm, lex.words)
        kw = {k: (v if isinstance(v, int) else jnp.asarray(v))
              for k, v in t.items()}
        _, packed = beam_scan_collapsed(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=8, topk=4,
            prune_logp=-12.0,
            lex_next=jnp.asarray(next_tbl),
            lex_boundary=jnp.asarray(boundary),
            word_ids=jnp.asarray(lex.word_id_table()),
            space_id=lex.space_id, word_alpha=0.8, word_beta=0.3, **kw)
        packed = np.asarray(packed)
        for b in range(lp.shape[0]):
            hyps = prefix_beam_search(
                lp[b, : frames[b]], al, cfg, lexicon=lex, word_lm=wlm)
            row = packed[b, :-1]
            got = al.decode(row[row != 0].tolist())
            assert got == hyps[0][0], (b, got, hyps[:3])

    @pytest.mark.parametrize("seed", [0, 1])
    def test_trigram_with_unk_bypass_matches_host(self, seed):
        """The order-3 G composes with the open-vocabulary escape: unk
        completions stay transparent (context unmoved), real completions
        shift (prev2, prev1) — string-exact vs the host oracle."""
        from vistaocr_tpu.decode.device_beam import beam_scan_collapsed
        from vistaocr_tpu.decode.lm import (
            device_word_tables,
            word_unk_logp,
        )

        lp, mask, frames = _random_case(seed, K=7, peaky=True)
        al, lex, wlm = self._trigram_case(seed + 10, n_words=8)
        cfg = BeamConfig(beam_width=8, topk=4, prune_logp=-12.0,
                         word_lm_alpha=0.8, word_lm_beta=0.3,
                         lex_unk_logp=-1.5)
        next_tbl, boundary = lex.dense_tables(unk=True)
        t = device_word_tables(wlm, lex.words)
        kw = {k: (v if isinstance(v, int) else jnp.asarray(v))
              for k, v in t.items()}
        _, packed = beam_scan_collapsed(
            jnp.asarray(lp), jnp.asarray(mask), beam_width=8, topk=4,
            prune_logp=-12.0,
            lex_next=jnp.asarray(next_tbl),
            lex_boundary=jnp.asarray(boundary),
            lex_unk_logp=-1.5,
            word_unk_logp=float(word_unk_logp(wlm)),
            word_ids=jnp.asarray(lex.word_id_table(unk=True)),
            space_id=lex.space_id, word_alpha=0.8, word_beta=0.3, **kw)
        packed = np.asarray(packed)
        for b in range(lp.shape[0]):
            hyps = prefix_beam_search(
                lp[b, : frames[b]], al, cfg, lexicon=lex, word_lm=wlm)
            row = packed[b, :-1]
            got = al.decode(row[row != 0].tolist())
            assert got == hyps[0][0], (b, got, hyps[:3])

    def test_device_word_tables_selects_trigram_form(self):
        from vistaocr_tpu.decode.lm import (
            device_word_tables,
            train_char_lm,
        )

        _, lex, wlm = self._trigram_case(5)
        t = device_word_tables(wlm, lex.words)
        for key in ("word_uni", "word_bo", "word_hash_keys",
                    "word_ctx_keys", "word_ctx_ids", "word_ctx_bo",
                    "word_tri_keys", "word_tri_vals"):
            assert key in t, key
        assert "word_table" not in t
        # order 4 has no device representation: host expansion
        wlm4 = train_char_lm(["ab ba ab ba"], order=4)
        with pytest.raises(ValueError, match="host expansion"):
            device_word_tables(wlm4, lex.words)

    def test_trigram_vocab_cap_rejected(self):
        from vistaocr_tpu.decode.lm import (
            TRIGRAM_WORD_CAP,
            hashed_word_trigram_tables,
            train_char_lm,
        )

        wlm = train_char_lm(["ab ba ab"], order=3)
        with pytest.raises(ValueError, match="host expansion"):
            hashed_word_trigram_tables(
                wlm, [f"w{i}" for i in range(TRIGRAM_WORD_CAP + 1)])
