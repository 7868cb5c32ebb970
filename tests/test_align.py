"""Alignment + error-analysis (text/align.py): hand-computed alignments,
confusion tallies, and consistency with the corpus CER/WER aggregates."""

import numpy as np
import pytest

from vistaocr_tpu.text import utf8_to_uxxxx
from vistaocr_tpu.text.align import align, align_tokens, error_report
from vistaocr_tpu.text.error_rates import _char_tokens, levenshtein


def _u(s):
    return utf8_to_uxxxx(s)


class TestAlign:
    def test_equal(self):
        ops = align(_u("abc"), _u("abc"))
        assert [k for k, _, _ in ops] == ["ok", "ok", "ok"]

    def test_substitution(self):
        ops = align(_u("abc"), _u("axc"))
        assert [k for k, _, _ in ops] == ["ok", "sub", "ok"]
        _, h, r = ops[1]
        assert (h, r) == (_u("b"), _u("x"))

    def test_insertion(self):
        ops = align(_u("aabc"), _u("abc"))
        kinds = [k for k, _, _ in ops]
        assert kinds.count("ins") == 1 and kinds.count("ok") == 3

    def test_deletion(self):
        ops = align(_u("abc"), _u("abbc"))
        kinds = [k for k, _, _ in ops]
        assert kinds.count("del") == 1 and kinds.count("ok") == 3

    def test_edit_count_matches_levenshtein(self):
        rng = np.random.default_rng(3)
        for _ in range(50):
            a = "".join(rng.choice(list("abcd"), rng.integers(0, 9)))
            b = "".join(rng.choice(list("abcd"), rng.integers(0, 9)))
            ops = align(_u(a), _u(b))
            edits = sum(k != "ok" for k, _, _ in ops)
            assert edits == levenshtein(_char_tokens(_u(a)), _char_tokens(_u(b)))
            # alignment reconstructs both sequences
            assert [h for _, h, _ in ops if h is not None] == _char_tokens(_u(a))
            assert [r for _, _, r in ops if r is not None] == _char_tokens(_u(b))

    def test_empty_sides(self):
        assert [k for k, _, _ in align(_u("ab"), "")] == ["ins", "ins"]
        assert [k for k, _, _ in align("", _u("ab"))] == ["del", "del"]
        assert align("", "") == []

    def test_rtl_tokens(self):
        # Arabic: alignment operates on uxxxx tokens in logical order
        ops = align(_u("سلام"), _u("سلم"))
        assert sum(k != "ok" for k, _, _ in ops) == 1


class TestErrorReport:
    def test_confusions_and_worst_lines(self):
        refs = [_u("abc"), _u("abd"), _u("xyz")]
        hyps = [_u("abc"), _u("abz"), _u("xy")]
        rep = error_report(hyps, refs, ids=["a", "b", "c"], top=5)
        assert rep["lines"] == 3 and rep["lines_with_errors"] == 2
        assert rep["substitutions"][0] == {"hyp": "z", "ref": "d", "count": 1}
        assert rep["deletions"][0] == {"ref": "z", "count": 1}
        ids = [d["id"] for d in rep["worst_lines"]]
        assert set(ids) == {"b", "c"}
        assert rep["cer"] == round(2 / 9, 5)

    def test_matches_cer_wer(self):
        from vistaocr_tpu.text import cer_wer

        rng = np.random.default_rng(11)
        refs, hyps = [], []
        for _ in range(20):
            refs.append(_u("".join(rng.choice(list("abc de"), 12))))
            hyps.append(_u("".join(rng.choice(list("abc de"), 11))))
        rep = error_report(hyps, refs)
        c, w = cer_wer(hyps, refs)
        assert rep["cer"] == pytest.approx(round(c, 5))
        assert rep["wer"] == pytest.approx(round(w, 5))

    def test_cli(self, tmp_path):
        import json

        from vistaocr_tpu.data.shards import ShardWriter, write_manifest
        from vistaocr_tpu.text.align import main as align_main

        w = ShardWriter(str(tmp_path), "test", 8)
        img = np.zeros((8, 16), np.uint8)
        w.add("l0", img, _u("abc"))
        w.add("l1", img, _u("abd"))
        shards = w.close()
        write_manifest(str(tmp_path), 8, {"test": shards})
        hyp_path = tmp_path / "hyps.jsonl"
        with open(hyp_path, "w") as f:
            for lid, h in [("l0", "abc"), ("l1", "abz")]:
                f.write(json.dumps({"id": lid, "hyp_uxxxx": _u(h)}) + "\n")
        rep = align_main([
            "--hyps", str(hyp_path), "--data", str(tmp_path),
            "--split", "test", "--json",
        ])
        assert rep["lines"] == 2 and rep["lines_with_errors"] == 1
        assert rep["substitutions"][0]["ref"] == "d"


class TestCalibration:
    def test_buckets_and_rates(self):
        refs = [_u("ab")] * 6
        hyps = [_u("ab"), _u("ab"), _u("ax"), _u("ab"), _u("xx"), _u("ab")]
        confs = [0.99, 0.97, 0.55, 0.92, 0.40, None]
        rep = error_report(hyps, refs, confs=confs)
        cal = rep["calibration"]
        by_lo = {b["conf_lo"]: b for b in cal}
        assert by_lo[0.0]["lines"] == 1 and by_lo[0.0]["exact_rate"] == 0.0
        assert by_lo[0.5]["lines"] == 1 and by_lo[0.5]["exact_rate"] == 0.0
        assert by_lo[0.9]["lines"] == 1 and by_lo[0.9]["exact_rate"] == 1.0
        assert by_lo[0.95]["lines"] == 1 and by_lo[0.95]["exact_rate"] == 1.0
        assert by_lo[0.99]["lines"] == 1 and by_lo[0.99]["exact_rate"] == 1.0
        # None conf lines are excluded from calibration entirely
        assert sum(b["lines"] for b in cal) == 5

    def test_absent_without_confs(self):
        rep = error_report([_u("a")], [_u("a")])
        assert "calibration" not in rep


class TestCalibrationTopBucket:
    def test_conf_exactly_one_counted(self):
        rep = error_report([_u("a"), _u("b")], [_u("a"), _u("b")],
                           confs=[1.0, 0.995])
        cal = {b["conf_lo"]: b for b in rep["calibration"]}
        assert cal[0.99]["lines"] == 2 and cal[0.99]["exact_rate"] == 1.0
