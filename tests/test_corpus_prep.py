"""IAM (C3) and MADCAT (C4) prep tests over synthetic fixtures: metadata
parsing, image collection, split assignment, Arabic normalization policy."""

import os

import numpy as np
import pytest
from PIL import Image

from vistaocr_tpu.data.iam import parse_lines_txt, prepare_iam
from vistaocr_tpu.data.madcat import (
    ArabicPolicy,
    crop_polygon,
    parse_madcat_xml,
    prepare_madcat,
)
from vistaocr_tpu.data.shards import ShardedLineDataset
from vistaocr_tpu.text import uxxxx_to_utf8


@pytest.fixture
def iam_fixture(tmp_path):
    root = tmp_path / "iam"
    (root / "ascii").mkdir(parents=True)
    lines = [
        ("a01-000u-00", "ok", "A MOVE to stop"),
        ("a01-000u-01", "ok", "Mr. Gaitskell from"),
        ("a01-003-00", "err", "nominating any more"),
    ]
    with open(root / "ascii" / "lines.txt", "w") as f:
        f.write("# comment line\n")
        for lid, seg, text in lines:
            f.write(f"{lid} {seg} 154 19 408 746 1663 91 {text.replace(' ', '|')}\n")
    rng = np.random.default_rng(0)
    for lid, _, _ in lines:
        form = lid.rsplit("-", 1)[0]
        d = root / "lines" / form.split("-")[0] / form
        d.mkdir(parents=True, exist_ok=True)
        img = np.full((60, 400), 250, np.uint8)
        img[20:40, 10:390] = rng.integers(0, 100, (20, 380))
        Image.fromarray(img).save(d / f"{lid}.png")
    return str(root)


class TestIam:
    def test_parse_lines_txt(self, iam_fixture):
        lines = parse_lines_txt(os.path.join(iam_fixture, "ascii", "lines.txt"))
        assert len(lines) == 3
        assert lines[0] == ("a01-000u-00", "A MOVE to stop")

    def test_skip_err(self, iam_fixture):
        lines = parse_lines_txt(
            os.path.join(iam_fixture, "ascii", "lines.txt"), skip_err=True
        )
        assert len(lines) == 2

    def test_prepare_random_split(self, iam_fixture, tmp_path):
        out = str(tmp_path / "ds")
        prepare_iam(iam_fixture, out, height=32, log=lambda *a: None)
        total = 0
        for split in ("train", "val", "test"):
            try:
                ds = ShardedLineDataset(out, split)
                total += len(ds)
                assert ds.height == 32
            except KeyError:
                pass
        assert total == 3

    def test_prepare_with_split_lists(self, iam_fixture, tmp_path):
        sp = os.path.join(iam_fixture, "splits")
        os.makedirs(sp)
        with open(os.path.join(sp, "train.uttlist"), "w") as f:
            f.write("a01-000u\n")  # form-level id matches 2 lines
        with open(os.path.join(sp, "test.uttlist"), "w") as f:
            f.write("a01-003-00\n")  # exact line id
        out = str(tmp_path / "ds2")
        prepare_iam(iam_fixture, out, height=32, log=lambda *a: None)
        assert len(ShardedLineDataset(out, "train")) == 2
        assert len(ShardedLineDataset(out, "test")) == 1
        # transcript survived the pipeline
        tr = ShardedLineDataset(out, "train")
        texts = {uxxxx_to_utf8(t) for t in tr.transcripts()}
        assert "A MOVE to stop" in texts


MADCAT_XML = """<?xml version="1.0" encoding="UTF-8"?>
<madcat>
  <writing-area>
    <zone id="z1">
      <line id="l1">
        <coords points="10,10 300,10 300,50 10,50"/>
        <token id="t1"><seg>السلام</seg></token>
        <token id="t2"><seg>عليكم</seg></token>
      </line>
      <line id="l2">
        <coords points="10,60 300,60 300,100 10,100"/>
        <token id="t3"><seg>مرحبا</seg></token>
      </line>
    </zone>
  </writing-area>
</madcat>
"""


@pytest.fixture
def madcat_fixture(tmp_path):
    root = tmp_path / "madcat_root"
    (root / "madcat").mkdir(parents=True)
    (root / "images").mkdir()
    with open(root / "madcat" / "page001.madcat.xml", "w", encoding="utf-8") as f:
        f.write(MADCAT_XML)
    rng = np.random.default_rng(1)
    page = np.full((120, 320), 245, np.uint8)
    page[15:45, 20:290] = rng.integers(0, 90, (30, 270))
    page[65:95, 20:200] = rng.integers(0, 90, (30, 180))
    Image.fromarray(page).save(root / "images" / "page001.png")
    return str(root)


class TestMadcat:
    def test_parse_xml(self, madcat_fixture):
        lines = parse_madcat_xml(
            os.path.join(madcat_fixture, "madcat", "page001.madcat.xml")
        )
        assert len(lines) == 2
        lid, poly, text = lines[0]
        assert lid == "l1"
        assert poly.shape == (4, 2)
        assert text == "السلام عليكم"  # tokens joined in document order

    def test_crop_polygon_masks_outside(self):
        page = np.zeros((100, 100), np.uint8)  # all ink
        poly = np.array([[10, 10], [50, 10], [50, 30], [10, 30]])
        crop = crop_polygon(page, poly, pad=5)
        assert crop.shape[0] >= 20 and crop.shape[1] >= 40
        # corners (outside polygon) are whitened
        assert crop[0, 0] == 255
        # interior stays ink
        assert crop[crop.shape[0] // 2, crop.shape[1] // 2] == 0

    def test_policy_diacritics_and_tatweel(self):
        text = "مُـحَمَّد"  # with harakat + tatweel
        p1 = ArabicPolicy(strip_diacritics=True, remove_tatweel=True)
        out = p1.apply(text)
        assert "ـ" not in out
        assert not any("ً" <= ch <= "ْ" for ch in out)
        p2 = ArabicPolicy(strip_diacritics=False, remove_tatweel=False)
        out2 = p2.apply(text)
        assert "ـ" in out2

    def test_policy_presentation_folding(self):
        # U+FEFB (LAM-ALEF ligature presentation form) -> base forms;
        # display_order=False isolates the folding step from the round-5
        # scan-order conversion (tested separately below)
        p = ArabicPolicy(fold_presentation=True, display_order=False)
        assert p.apply("ﻻ") == "لا"
        p_off = ArabicPolicy(fold_presentation=False, display_order=False)
        assert p_off.apply("ﻻ") == "ﻻ"

    def test_policy_display_order_default(self):
        # round 5: stored transcripts are scan-order (display order) —
        # CTC monotonicity; see text/bidi.py and docs/design.md
        from vistaocr_tpu.text.bidi import display_order

        logical = "السلام عليكم"
        assert ArabicPolicy().apply(logical) == display_order(logical)
        assert ArabicPolicy().apply(logical) != logical

    def test_prepare_end_to_end(self, madcat_fixture, tmp_path):
        out = str(tmp_path / "ds")
        prepare_madcat(
            madcat_fixture, out, height=32, val_frac=0.0, test_frac=0.0,
            log=lambda *a: None,
        )
        ds = ShardedLineDataset(out, "train")
        assert len(ds) == 2
        texts = [uxxxx_to_utf8(t) for t in ds.transcripts()]
        # stored transcripts are DISPLAY order (round 5; scan-order CTC
        # labels); display_order() recovers the logical reading form
        from vistaocr_tpu.text.bidi import display_order

        assert display_order("السلام عليكم") in texts
        assert "السلام عليكم" not in texts
        rec = ds[0]
        assert rec.image.shape[0] == 32
        assert rec.image.min() < 120  # ink present after crop+normalize


class TestHandwritingDegradations:
    """Handwriting-shaped synthetic degradations (configs #2/#3 stand-in):
    slant, elastic warp, stroke jitter must produce valid images that
    still differ from the clean rendering."""

    def test_degraded_render_differs_but_valid(self):
        import numpy as np

        from vistaocr_tpu.data.synth import (
            HANDWRITING_DEGRADATIONS,
            SynthConfig,
            SyntheticLineGenerator,
        )

        clean = SyntheticLineGenerator(
            SynthConfig(language="en", min_words=3, max_words=3), seed=4)
        hand = SyntheticLineGenerator(
            SynthConfig(language="en", **{**HANDWRITING_DEGRADATIONS,
                                          "min_words": 3, "max_words": 3}),
            seed=4)
        text = clean.sample_text()
        a = clean.render(text, height=32)
        b = hand.render(text, height=32)
        assert a.dtype == b.dtype == np.uint8
        assert b.shape[0] == 32 and b.shape[1] >= 8
        # both render ink
        assert (a < 128).mean() > 0.01 and (b < 128).mean() > 0.01
        # geometry differs (slant/warp changed pixel positions)
        wmin = min(a.shape[1], b.shape[1])
        assert (a[:, :wmin] != b[:, :wmin]).mean() > 0.05

    def test_determinism(self):
        from vistaocr_tpu.data.synth import (
            HANDWRITING_DEGRADATIONS,
            SynthConfig,
            SyntheticLineGenerator,
        )
        import numpy as np

        outs = []
        for _ in range(2):
            g = SyntheticLineGenerator(
                SynthConfig(language="en", **HANDWRITING_DEGRADATIONS),
                seed=9)
            img, text = g.sample(height=32, max_width=512)
            outs.append((img, text))
        assert outs[0][1] == outs[1][1]
        np.testing.assert_array_equal(outs[0][0], outs[1][0])


class TestIamTreeE2E:
    """scripts/iam_e2e.build_iam_tree writes the standard IAM layout and
    the real prepare_iam consumes it — the corpus-scale recipe's
    tree-level contract, pinned at fixture size."""

    def test_tree_prep_round_trip(self, tmp_path):
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(__file__), "..", "scripts"))
        try:
            from iam_e2e import build_iam_tree
        finally:
            sys.path.pop(0)

        from vistaocr_tpu.data.iam import prepare_iam
        from vistaocr_tpu.data.shards import ShardedLineDataset

        tree = str(tmp_path / "tree")
        stats = build_iam_tree(
            tree, num_forms=12, lines_per_form=3, render_height=40,
            err_every=5, seed=4, val_forms=0.2, test_forms=0.2,
        )
        assert stats["lines"] == 36 and stats["err_lines"] == 7
        out = str(tmp_path / "ds")
        prepare_iam(tree, out, height=32, skip_err=True, log=lambda *a: None)
        total = 0
        heights = set()
        for split in ("train", "val", "test"):
            ds = ShardedLineDataset(out, split)
            total += len(ds)
            for i in range(len(ds)):
                rec = ds[i]
                heights.add(rec.image.shape[0])
                assert rec.transcript  # uxxxx, non-empty
                # split honored the form-granularity uttlists
                assert rec.id.rsplit("-", 1)[0] in open(
                    f"{tree}/splits/{split}.uttlist").read()
        assert total == stats["lines"] - stats["err_lines"]
        assert heights == {32}  # prep height-normalized the 40px renders

    def test_tree_prep_keeps_err_when_asked(self, tmp_path):
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(__file__), "..", "scripts"))
        try:
            from iam_e2e import build_iam_tree
        finally:
            sys.path.pop(0)

        from vistaocr_tpu.data.iam import prepare_iam
        from vistaocr_tpu.data.shards import ShardedLineDataset

        tree = str(tmp_path / "tree")
        stats = build_iam_tree(
            tree, num_forms=6, lines_per_form=3, err_every=4, seed=9,
            val_forms=0.0, test_forms=0.0,
        )
        out = str(tmp_path / "ds")
        prepare_iam(tree, out, height=32, skip_err=False,
                    log=lambda *a: None)
        assert len(ShardedLineDataset(out, "train")) == stats["lines"]


class TestMadcatTreeE2E:
    """scripts/madcat_e2e.build_madcat_tree writes the MDF-style layout
    and the real prepare_madcat consumes it (polygon crops + policy +
    page-level splits), pinned at fixture size."""

    def test_tree_prep_round_trip(self, tmp_path):
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(__file__), "..", "scripts"))
        try:
            from madcat_e2e import build_madcat_tree
        finally:
            sys.path.pop(0)

        from vistaocr_tpu.data.madcat import prepare_madcat
        from vistaocr_tpu.data.shards import ShardedLineDataset

        tree = str(tmp_path / "tree")
        stats = build_madcat_tree(
            tree, num_pages=6, lines_per_page=3, render_height=40, seed=2,
        )
        assert stats["lines"] == 18
        out = str(tmp_path / "ds")
        prepare_madcat(tree, out, height=32, test_frac=0.34, val_frac=0.33,
                       log=lambda *a: None)
        import json

        with open(f"{out}/manifest.json") as f:
            manifest = json.load(f)
        counts = manifest["counts"]  # write_manifest flattens extra
        assert sum(counts.values()) == 18
        total = 0
        for split, n in counts.items():
            if not n:
                continue
            ds = ShardedLineDataset(out, split)
            assert len(ds) == n
            total += n
            page_ids = {ds[i].id.split("_l")[0] for i in range(len(ds))}
            for i in range(len(ds)):
                rec = ds[i]
                assert rec.image.shape[0] == 32  # height-normalized crop
                assert rec.transcript.startswith("u06") or " " in rec.transcript
        assert total == 18
        # page-level split: no page id appears in two splits
        seen = {}
        for split, n in counts.items():
            if not n:
                continue
            ds = ShardedLineDataset(out, split)
            for i in range(len(ds)):
                pid = ds[i].id.split("_l")[0]
                assert seen.setdefault(pid, split) == split
