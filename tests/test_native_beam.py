"""Native (C++) beam search + ARPA scorer vs the Python oracle (C14).

Skipped when g++ is unavailable. Covers: LM scoring parity, batched beam
parity with/without LM fusion, and the native batch assembler."""

import numpy as np
import pytest

from vistaocr_tpu.decode import native_binding as nb
from vistaocr_tpu.decode.beam import BeamConfig, prefix_beam_search
from vistaocr_tpu.decode.lm import train_char_lm
from vistaocr_tpu.text import Alphabet, utf8_to_uxxxx

pytestmark = pytest.mark.skipif(
    not nb.available(), reason=f"native lib unavailable: {nb.build_error()}"
)


def _random_lp(rng, B, T, K):
    logits = rng.normal(0, 2.0, (B, T, K)).astype(np.float32)
    return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


def _topk(lp, k):
    ids = np.argsort(-lp[..., 1:], axis=-1)[..., :k] + 1
    vals = np.take_along_axis(lp, ids, axis=-1)
    return ids.astype(np.int32), vals.astype(np.float32)


class TestNativeLM:
    @pytest.fixture
    def lm_pair(self, tmp_path):
        corpus = [utf8_to_uxxxx(s) for s in
                  ["the cat sat", "the bat sat", "a cat ran", "the cat ran"]]
        py_lm = train_char_lm(corpus, order=3)
        path = str(tmp_path / "lm.arpa")
        py_lm.write_arpa(path)
        alpha = Alphabet.build(corpus)
        native = nb.NativeLM(path, alpha.tokens)
        return py_lm, native, alpha

    def test_logp_parity(self, lm_pair):
        py_lm, native, alpha = lm_pair
        rng = np.random.default_rng(0)
        toks = alpha.tokens
        for _ in range(200):
            n = int(rng.integers(0, 3))
            hist_toks = [toks[int(i)] for i in rng.integers(0, len(toks), n)]
            tok = toks[int(rng.integers(0, len(toks)))]
            py = py_lm.logp(tuple(hist_toks), tok)
            nat = native.logp([alpha.index_of(t) for t in hist_toks],
                              alpha.index_of(tok))
            assert py == pytest.approx(nat, abs=1e-4), (hist_toks, tok)

    def test_bos_history(self, lm_pair):
        py_lm, native, alpha = lm_pair
        tok = alpha.tokens[0]
        py = py_lm.logp(("<s>",), tok)
        # native: bos id is internal; NativeLM.logp with hist containing
        # the bos sentinel is exercised through beam parity; here check
        # empty-history backoff path agrees
        assert py_lm.logp((), tok) == pytest.approx(
            native.logp([], alpha.index_of(tok)), abs=1e-4
        )


class TestNativeBeamParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_no_lm_matches_python(self, seed):
        rng = np.random.default_rng(seed)
        alpha = Alphabet.from_charset("abcd")
        B, T, K = 3, 10, 5
        lp = _random_lp(rng, B, T, K)
        frames = np.array([10, 7, 4], np.int32)
        k = 4
        ids, vals = _topk(lp, k)
        cfg = BeamConfig(beam_width=12, topk=k, prune_logp=-30.0)

        native_ids, native_scores = nb.beam_decode_batch_native(
            lp, frames, ids, vals,
            beam_width=cfg.beam_width, prune_logp=cfg.prune_logp,
        )
        for b in range(B):
            py = prefix_beam_search(
                lp[b, : frames[b]], alpha, cfg,
                topk_vals=vals[b, : frames[b]], topk_ids=ids[b, : frames[b]],
            )
            assert alpha.decode(native_ids[b]) == py[0][0]
            assert native_scores[b] == pytest.approx(py[0][1], abs=1e-6)

    def test_lm_fusion_matches_python(self, tmp_path):
        rng = np.random.default_rng(7)
        corpus = [utf8_to_uxxxx("abab")] * 30 + [utf8_to_uxxxx("abba")] * 10
        py_lm = train_char_lm(corpus, order=2)
        path = str(tmp_path / "f.arpa")
        py_lm.write_arpa(path)
        alpha = Alphabet.build(corpus)
        K = alpha.num_classes
        B, T = 2, 8
        lp = _random_lp(rng, B, T, K)
        frames = np.array([8, 6], np.int32)
        k = K - 1
        ids, vals = _topk(lp, k)
        cfg = BeamConfig(beam_width=12, topk=k, prune_logp=-30.0,
                         lm_alpha=0.7, lm_beta=0.4)
        native = nb.NativeLM(path, alpha.tokens)
        native_ids, native_scores = nb.beam_decode_batch_native(
            lp, frames, ids, vals, lm=native,
            lm_alpha=cfg.lm_alpha, lm_beta=cfg.lm_beta,
            beam_width=cfg.beam_width, prune_logp=cfg.prune_logp,
        )
        for b in range(B):
            py = prefix_beam_search(
                lp[b, : frames[b]], alpha, cfg, lm=py_lm,
                topk_vals=vals[b, : frames[b]], topk_ids=ids[b, : frames[b]],
            )
            assert alpha.decode(native_ids[b]) == py[0][0]
            assert native_scores[b] == pytest.approx(py[0][1], abs=1e-4)


class TestNativeAssemble:
    def test_matches_python_copy(self):
        rng = np.random.default_rng(3)
        H, Wb, n = 16, 64, 5
        srcs = [
            np.ascontiguousarray(
                rng.integers(0, 256, (H, int(w)), dtype=np.uint8)
            )
            for w in rng.integers(8, Wb + 1, n)
        ]
        out_native = np.full((n, H, Wb), 255, np.uint8)
        nb.assemble_native(srcs, out_native)
        out_py = np.full((n, H, Wb), 255, np.uint8)
        for i, s in enumerate(srcs):
            out_py[i, :, : s.shape[1]] = s
        np.testing.assert_array_equal(out_native, out_py)

    def test_wider_than_bucket_clamped(self):
        H, Wb = 8, 16
        src = np.ascontiguousarray(
            np.arange(H * 32, dtype=np.uint8).reshape(H, 32)
        )
        out = np.zeros((1, H, Wb), np.uint8)
        nb.assemble_native([src], out)
        np.testing.assert_array_equal(out[0], src[:, :Wb])


class TestNativeConstrained:
    """C++ lexicon/word-LM via dense tables vs the Python oracle —
    string-exact parity (the same discipline as the unconstrained twin
    and the device engine)."""

    def _case(self, seed, K=7, B=5, T=16):
        import numpy as np

        rng = np.random.default_rng(seed)
        logits = rng.normal(0, 3.0, (B, T, K)).astype(np.float32)
        logits[..., 0] += 2.0
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        frames = rng.integers(4, T + 1, B).astype(np.int32)
        return lp.astype(np.float32), frames

    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("with_wlm", [False, True])
    def test_matches_python_oracle(self, seed, with_wlm):
        import numpy as np

        from vistaocr_tpu.decode import native_binding as nb
        from vistaocr_tpu.decode.beam import BeamConfig, prefix_beam_search
        from vistaocr_tpu.decode.lexicon import Lexicon
        from vistaocr_tpu.decode.lm import train_char_lm
        from vistaocr_tpu.text import Alphabet, utf8_to_uxxxx

        if not nb.available():
            pytest.skip(f"native lib unavailable: {nb.build_error()}")
        al = Alphabet.build([utf8_to_uxxxx("abcde ")])
        lp, frames = self._case(seed, K=al.num_classes)
        rng = np.random.default_rng(seed + 7)
        words = sorted({
            "".join(rng.choice(list("abcde"), rng.integers(1, 4)))
            for _ in range(10)
        })
        lex = Lexicon.from_words(al, words)
        word_lm = None
        cfg = BeamConfig(beam_width=8, topk=4, prune_logp=-12.0)
        if with_wlm:
            word_lm = train_char_lm(
                [" ".join(rng.choice(words, rng.integers(1, 4)))
                 for _ in range(80)], order=2)
            cfg = BeamConfig(beam_width=8, topk=4, prune_logp=-12.0,
                             word_lm_alpha=0.7, word_lm_beta=0.2)
        k = min(cfg.topk, al.num_classes - 1)
        ids = (np.argsort(-lp[:, :, 1:], axis=2)[:, :, :k] + 1).astype(
            np.int32)
        vals = np.take_along_axis(lp, ids, axis=2)
        all_ids, scores = nb.beam_decode_batch_native(
            lp, frames, ids, vals,
            beam_width=cfg.beam_width, prune_logp=cfg.prune_logp,
            max_out=lp.shape[1], lexicon=lex, word_lm=word_lm,
            word_lm_alpha=cfg.word_lm_alpha,
            word_lm_beta=cfg.word_lm_beta,
        )
        for b in range(lp.shape[0]):
            hyps = prefix_beam_search(
                lp[b, : frames[b]], al, cfg,
                topk_vals=vals[b, : frames[b]],
                topk_ids=ids[b, : frames[b]],
                lexicon=lex, word_lm=word_lm,
            )
            got = al.decode(all_ids[b])
            assert got == hyps[0][0], (b, got, hyps[:3])
            assert scores[b] == pytest.approx(hyps[0][1], abs=1e-6)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("with_wlm", [False, True])
    def test_unk_bypass_matches_python_oracle(self, seed, with_wlm):
        """Third engine of the <unk> character-bypass rule: the C++
        search with the unk-row dense tables must stay string- and
        score-exact vs the Python oracle."""
        import numpy as np

        from vistaocr_tpu.decode import native_binding as nb
        from vistaocr_tpu.decode.beam import BeamConfig, prefix_beam_search
        from vistaocr_tpu.decode.lexicon import Lexicon
        from vistaocr_tpu.decode.lm import train_char_lm
        from vistaocr_tpu.text import Alphabet, utf8_to_uxxxx

        if not nb.available():
            pytest.skip(f"native lib unavailable: {nb.build_error()}")
        al = Alphabet.build([utf8_to_uxxxx("abcde ")])
        lp, frames = self._case(seed + 50, K=al.num_classes, T=24)
        rng = np.random.default_rng(seed + 57)
        words = sorted({
            "".join(rng.choice(list("abcde"), rng.integers(1, 4)))
            for _ in range(8)
        })
        lex = Lexicon.from_words(al, words)
        word_lm = None
        cfg = BeamConfig(beam_width=8, topk=4, prune_logp=-12.0,
                         lex_unk_logp=-2.5)
        if with_wlm:
            word_lm = train_char_lm(
                [" ".join(rng.choice(words, rng.integers(1, 4)))
                 for _ in range(80)], order=2)
            cfg.word_lm_alpha, cfg.word_lm_beta = 0.7, 0.2
        k = min(cfg.topk, al.num_classes - 1)
        ids = (np.argsort(-lp[:, :, 1:], axis=2)[:, :, :k] + 1).astype(
            np.int32)
        vals = np.take_along_axis(lp, ids, axis=2)
        all_ids, scores = nb.beam_decode_batch_native(
            lp, frames, ids, vals,
            beam_width=cfg.beam_width, prune_logp=cfg.prune_logp,
            max_out=lp.shape[1], lexicon=lex, word_lm=word_lm,
            word_lm_alpha=cfg.word_lm_alpha,
            word_lm_beta=cfg.word_lm_beta,
            lex_unk_logp=cfg.lex_unk_logp,
        )
        for b in range(lp.shape[0]):
            hyps = prefix_beam_search(
                lp[b, : frames[b]], al, cfg,
                topk_vals=vals[b, : frames[b]],
                topk_ids=ids[b, : frames[b]],
                lexicon=lex, word_lm=word_lm,
            )
            got = al.decode(all_ids[b])
            assert got == hyps[0][0], (b, got, hyps[:3])
            assert scores[b] == pytest.approx(hyps[0][1], abs=1e-6)
