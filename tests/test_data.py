"""Tests for the data layer: contract/buckets, shards, synth, pipeline."""

import numpy as np
import pytest

from vistaocr_tpu.data.buckets import BucketSpec, ShapeContract, make_ladder
from vistaocr_tpu.data.shards import ShardWriter, ShardedLineDataset, write_manifest
from vistaocr_tpu.data.synth import SynthConfig, SyntheticLineGenerator, build_synthetic_dataset
from vistaocr_tpu.data.pipeline import BatchPipeline
from vistaocr_tpu.data.transforms import height_normalize, maybe_invert, normalize_line
from vistaocr_tpu.text import Alphabet, utf8_to_uxxxx


class TestShapeContract:
    def test_frames_formula(self):
        c = ShapeContract(width_stride=4)
        assert c.frames_for_width(1) == 1
        assert c.frames_for_width(4) == 1
        assert c.frames_for_width(5) == 2
        assert c.frames_for_width(128) == 32

    def test_frames_formula_vectorized(self):
        c = ShapeContract(width_stride=4)
        w = np.array([1, 4, 5, 128])
        np.testing.assert_array_equal(c.frames_for_width(w), [1, 1, 2, 32])

    def test_bucket_assignment(self):
        c = ShapeContract(bucket_widths=(128, 256, 512))
        assert c.bucket_for_width(1) == 0
        assert c.bucket_for_width(128) == 0
        assert c.bucket_for_width(129) == 1
        assert c.bucket_for_width(512) == 2
        assert c.bucket_for_width(513) == -1

    def test_misaligned_bucket_rejected(self):
        with pytest.raises(ValueError):
            ShapeContract(bucket_widths=(130,), width_stride=4)

    def test_label_cap(self):
        c = ShapeContract(bucket_widths=(128, 2048), width_stride=4, max_label_len=256)
        assert c.label_cap(128) == 32
        assert c.label_cap(2048) == 256

    def test_json_roundtrip(self):
        c = ShapeContract()
        assert ShapeContract.from_json(c.to_json()) == c

    def test_make_ladder_waste_bound(self):
        rng = np.random.default_rng(0)
        widths = rng.integers(40, 1500, 2000)
        ladder = make_ladder(widths, stride=4, align=128, max_waste=0.10)
        assert all(w % 128 == 0 for w in ladder)
        # every width fits
        assert max(widths) <= ladder[-1]
        # waste actually below bound
        pad = sum(min(b for b in ladder if b >= w) - w for w in widths)
        tot = sum(min(b for b in ladder if b >= w) for w in widths)
        assert pad / tot <= 0.10


class TestTransforms:
    def test_height_normalize_aspect(self):
        img = np.full((64, 200), 255, np.uint8)
        out = height_normalize(img, 32)
        assert out.shape == (32, 100)

    def test_height_normalize_clamp(self):
        img = np.full((32, 5000), 255, np.uint8)
        out = height_normalize(img, 32, max_width=1024)
        assert out.shape == (32, 1024)

    def test_invert_polarity(self):
        dark = np.full((10, 10), 10, np.uint8)
        assert maybe_invert(dark).mean() > 128
        light = np.full((10, 10), 240, np.uint8)
        assert (maybe_invert(light) == light).all()

    def test_normalize_line_rgb_input(self):
        rgb = np.full((64, 100, 3), 255, np.uint8)
        out = normalize_line(rgb, 32)
        assert out.shape == (32, 50) and out.dtype == np.uint8


class TestShards:
    def test_write_read_roundtrip(self, tmp_path):
        d = str(tmp_path)
        w = ShardWriter(d, "train", height=32)
        rng = np.random.default_rng(0)
        imgs, texts = [], []
        for i in range(5):
            img = rng.integers(0, 256, (32, 50 + 10 * i), dtype=np.uint8)
            imgs.append(img)
            texts.append(utf8_to_uxxxx(f"line {i}"))
            w.add(f"l{i}", img, texts[-1])
        shards = w.close()
        write_manifest(d, 32, {"train": shards})

        ds = ShardedLineDataset(d, "train")
        assert len(ds) == 5
        for i in range(5):
            rec = ds[i]
            np.testing.assert_array_equal(rec.image, imgs[i])
            assert rec.transcript == texts[i]
        np.testing.assert_array_equal(ds.widths, [50, 60, 70, 80, 90])

    def test_read_into(self, tmp_path):
        d = str(tmp_path)
        w = ShardWriter(d, "train", height=4)
        img = np.arange(4 * 10, dtype=np.uint8).reshape(4, 10)
        w.add("a", img, utf8_to_uxxxx("a"))
        write_manifest(d, 4, {"train": w.close()})
        ds = ShardedLineDataset(d, "train")
        out = np.full((4, 16), 255, np.uint8)
        width = ds.read_into(0, out)
        assert width == 10
        np.testing.assert_array_equal(out[:, :10], img)
        assert (out[:, 10:] == 255).all()

    def test_shard_rolling(self, tmp_path):
        d = str(tmp_path)
        w = ShardWriter(d, "train", height=8, max_shard_bytes=100)
        for i in range(4):
            w.add(f"l{i}", np.zeros((8, 30), np.uint8), utf8_to_uxxxx("x"))
        shards = w.close()
        assert len(shards) > 1
        write_manifest(d, 8, {"train": shards})
        assert len(ShardedLineDataset(d, "train")) == 4

    def test_wrong_height_rejected(self, tmp_path):
        w = ShardWriter(str(tmp_path), "train", height=32)
        with pytest.raises(ValueError):
            w.add("x", np.zeros((16, 10), np.uint8), "u0061")


class TestSynth:
    def test_render_shape_and_polarity(self):
        gen = SyntheticLineGenerator(SynthConfig(), seed=1)
        img, text = gen.sample(height=32, max_width=512)
        assert img.dtype == np.uint8
        assert img.shape[0] == 32 and img.shape[1] <= 512
        assert text
        # dark ink on light paper: mean high, min low
        assert img.mean() > 128 and img.min() < 100

    def test_deterministic(self):
        a = SyntheticLineGenerator(SynthConfig(), seed=7)
        b = SyntheticLineGenerator(SynthConfig(), seed=7)
        ia, ta = a.sample(32)
        ib, tb = b.sample(32)
        assert ta == tb
        np.testing.assert_array_equal(ia, ib)

    def test_arabic_rendering(self):
        gen = SyntheticLineGenerator(SynthConfig(language="ar"), seed=2)
        img, text = gen.sample(height=32)
        assert img.min() < 100  # some ink rendered
        assert any("؀" <= ch <= "ۿ" for ch in text)

    def test_build_dataset(self, tmp_path):
        d = build_synthetic_dataset(
            str(tmp_path), num_train=12, num_val=4, height=32, seed=3
        )
        train = ShardedLineDataset(d, "train")
        val = ShardedLineDataset(d, "val")
        assert len(train) == 12 and len(val) == 4
        assert train[0].image.shape[0] == 32


class TestPipeline:
    @pytest.fixture
    def dataset(self, tmp_path):
        d = build_synthetic_dataset(
            str(tmp_path), num_train=40, num_val=0, height=32, max_width=512, seed=4
        )
        return ShardedLineDataset(d, "train")

    @pytest.fixture
    def contract(self):
        return ShapeContract(bucket_widths=(128, 256, 384, 512), width_stride=4)

    def test_static_shapes(self, dataset, contract):
        alpha = Alphabet.build(dataset.transcripts())
        pipe = BatchPipeline(
            dataset, alpha, contract, batch_pixels=32 * 256 * 8, drop_remainder=False
        )
        assert pipe.dropped == 0
        shapes = set()
        n_seen = 0
        for batch in pipe.epoch(0):
            spec = batch.bucket
            assert batch.images.shape == (batch.size, spec.height, spec.width)
            assert batch.labels.shape == (batch.size, spec.label_len)
            assert (batch.widths <= spec.width).all()
            assert (batch.label_lengths <= spec.label_len).all()
            # CTC feasibility: labels fit in frames
            frames = contract.frames_for_width(batch.widths)
            assert (batch.label_lengths[batch.valid] <= frames[batch.valid]).all()
            shapes.add(batch.images.shape)
            n_seen += int(batch.valid.sum())
        assert n_seen == 40
        assert shapes <= set(
            (b, s[1], s[2]) for s in pipe.batch_shapes() for b in [s[0]]
        )

    def test_batch_multiple(self, dataset, contract):
        alpha = Alphabet.build(dataset.transcripts())
        pipe = BatchPipeline(
            dataset, alpha, contract, batch_pixels=32 * 512 * 8, batch_multiple=4
        )
        assert all(b % 4 == 0 for b in pipe.batch_sizes)

    def test_epoch_determinism_and_reshuffle(self, dataset, contract):
        alpha = Alphabet.build(dataset.transcripts())
        pipe = BatchPipeline(dataset, alpha, contract, batch_pixels=32 * 256 * 4, seed=9)
        seq0 = [tuple(b.indices.tolist()) for b in pipe.epoch(0)]
        seq0b = [tuple(b.indices.tolist()) for b in pipe.epoch(0)]
        seq1 = [tuple(b.indices.tolist()) for b in pipe.epoch(1)]
        assert seq0 == seq0b  # same epoch -> same order (resume determinism)
        assert seq0 != seq1  # different epoch -> reshuffled

    def test_device_prefetch(self, dataset, contract):
        import jax

        alpha = Alphabet.build(dataset.transcripts())
        pipe = BatchPipeline(
            dataset, alpha, contract, batch_pixels=32 * 256 * 8, drop_remainder=False
        )
        host = list(pipe.epoch(0))
        dev = list(pipe.device_epoch(0))
        assert len(dev) == len(host)
        for h, d in zip(host, dev):
            assert isinstance(d.images, jax.Array)
            np.testing.assert_array_equal(np.asarray(d.images), h.images)
            np.testing.assert_array_equal(np.asarray(d.labels), h.labels)

    def test_infeasible_label_dropped(self, tmp_path):
        # A 1000-char transcript in a 128-wide image cannot fit 32 frames.
        d = str(tmp_path)
        w = ShardWriter(d, "train", height=32)
        w.add("bad", np.zeros((32, 100), np.uint8), utf8_to_uxxxx("a" * 1000))
        w.add("good", np.zeros((32, 100), np.uint8), utf8_to_uxxxx("ok"))
        write_manifest(d, 32, {"train": w.close()})
        ds = ShardedLineDataset(d, "train")
        alpha = Alphabet.build(ds.transcripts())
        contract = ShapeContract(bucket_widths=(128,), width_stride=4)
        pipe = BatchPipeline(ds, alpha, contract, batch_pixels=32 * 128)
        assert pipe.dropped == 1


class TestBatchShapesDropRemainder:
    def test_undersized_bucket_excluded(self, tmp_path):
        from vistaocr_tpu.data.shards import ShardWriter, write_manifest
        import numpy as np
        from vistaocr_tpu.text import utf8_to_uxxxx

        d = str(tmp_path)
        w = ShardWriter(d, "train", height=32)
        # 10 narrow lines, 2 wide lines
        for i in range(10):
            w.add(f"n{i}", np.zeros((32, 100), np.uint8), utf8_to_uxxxx("ab"))
        for i in range(2):
            w.add(f"w{i}", np.zeros((32, 500), np.uint8), utf8_to_uxxxx("ab"))
        write_manifest(d, 32, {"train": w.close()})
        ds = ShardedLineDataset(d, "train")
        alpha = Alphabet.build(ds.transcripts())
        contract = ShapeContract(bucket_widths=(128, 512))
        pipe = BatchPipeline(ds, alpha, contract, batch_pixels=32 * 128 * 4,
                             drop_remainder=True)
        # wide bucket has 2 members but batch size 4 (min) -> excluded
        emitted = {b.images.shape for b in pipe.epoch(0)}
        declared = {(s[0], s[1], s[2]) for s in pipe.batch_shapes()}
        assert emitted == declared


class TestConcatDataset:
    """Joint-training dataset view (data/shards.ConcatLineDataset +
    open_dataset): multiple corpora as one index space."""

    def _make(self, tmp_path, name, n, height=16, with_val=True):
        import numpy as np

        from vistaocr_tpu.data.shards import ShardWriter, write_manifest
        from vistaocr_tpu.text import utf8_to_uxxxx

        d = str(tmp_path / name)
        splits = {}
        for split, count in (("train", n), ("val", 2 if with_val else 0)):
            if not count:
                continue
            w = ShardWriter(d, split, height)
            for i in range(count):
                img = np.full((height, 10 + i), 200 + i, np.uint8)
                w.add(f"{name}-{split}-{i}", img,
                      utf8_to_uxxxx(f"{name}{i}"))
            splits[split] = w.close()
        write_manifest(d, height, splits)
        return d

    def test_concat_indexing_and_reads(self, tmp_path):
        import numpy as np

        from vistaocr_tpu.data.shards import open_dataset

        a = self._make(tmp_path, "aa", 3)
        b = self._make(tmp_path, "bb", 4)
        ds = open_dataset(f"{a},{b}", "train")
        assert len(ds) == 7
        assert ds.widths.tolist() == [10, 11, 12, 10, 11, 12, 13]
        assert ds.id(0) == "aa-train-0" and ds.id(3) == "bb-train-0"
        assert ds.transcript(6).startswith("u")
        rec = ds[4]
        assert rec.id == "bb-train-1" and rec.image.shape == (16, 11)
        out = np.zeros((16, 32), np.uint8)
        assert ds.read_into(5, out) == 12
        assert (out[:, :12] == 202).all()
        assert len(list(ds.transcripts())) == 7
        assert len(ds.ids()) == 7

    def test_open_dataset_skips_missing_split(self, tmp_path):
        import pytest

        from vistaocr_tpu.data.shards import open_dataset

        a = self._make(tmp_path, "ha", 3, with_val=False)
        b = self._make(tmp_path, "hb", 2)
        val = open_dataset(f"{a},{b}", "val")
        assert len(val) == 2  # only hb has a val split
        with pytest.raises(KeyError):
            open_dataset(a, "val")

    def test_height_mismatch_rejected(self, tmp_path):
        import pytest

        from vistaocr_tpu.data.shards import ConcatLineDataset, ShardedLineDataset

        a = self._make(tmp_path, "h16", 2, height=16)
        b = self._make(tmp_path, "h32", 2, height=32)
        with pytest.raises(ValueError, match="height"):
            ConcatLineDataset([
                ShardedLineDataset(a, "train"),
                ShardedLineDataset(b, "train"),
            ])

    def test_joint_training_smoke(self, tmp_path):
        """fit() over two comma-joined corpora: alphabet is the union and
        training runs."""
        from vistaocr_tpu.data import build_synthetic_dataset
        from vistaocr_tpu.data.synth import SynthConfig
        from vistaocr_tpu.train import PRESETS, TrainConfig, fit

        a = str(tmp_path / "ca")
        b = str(tmp_path / "cb")
        build_synthetic_dataset(
            a, num_train=24, num_val=4, height=32, max_width=256,
            config=SynthConfig(language="charset", charset="ab ",
                               min_words=1, max_words=2), seed=1)
        build_synthetic_dataset(
            b, num_train=24, num_val=4, height=32, max_width=256,
            config=SynthConfig(language="charset", charset="cd ",
                               min_words=1, max_words=2), seed=2)
        base = dict(PRESETS["synth-tiny"])
        base.update(
            data_dir=f"{a},{b}", snapshot_dir=str(tmp_path / "run"),
            epochs=2, bucket_widths=(128, 256), batch_pixels=2**16,
            val_interval_steps=1000, log_interval=1000,
        )
        summary = fit(TrainConfig(**base), log=lambda *a: None)
        assert summary["steps"] > 0
        from vistaocr_tpu.checkpoint import load_model

        _, _, alphabet, _ = load_model(str(tmp_path / "run" / "last"))
        import string

        toks = set("".join(chr(int(t[1:], 16)) for t in alphabet.tokens))
        assert {"a", "b", "c", "d"} <= toks  # union alphabet

    def test_partial_split_coverage_warns(self, tmp_path):
        import warnings

        from vistaocr_tpu.data.shards import open_dataset

        a = self._make(tmp_path, "wa", 3)
        b = self._make(tmp_path, "wb", 2, with_val=False)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            val = open_dataset(f"{a},{b}", "val")
        assert len(val) == 2
        assert any("missing" in str(w.message) for w in rec)

    def test_infer_accepts_comma_spec(self, tmp_path):
        """Eval surfaces accept the same comma-joined corpus spec as
        training (review finding: they used to reject it)."""
        from vistaocr_tpu.data import build_synthetic_dataset
        from vistaocr_tpu.data.synth import SynthConfig
        from vistaocr_tpu.infer import run_inference
        from vistaocr_tpu.train import PRESETS, TrainConfig, fit

        a = str(tmp_path / "ia")
        b = str(tmp_path / "ib")
        for d, seed in ((a, 3), (b, 4)):
            build_synthetic_dataset(
                d, num_train=24, num_val=4, num_test=4, height=32,
                max_width=256,
                config=SynthConfig(language="charset", charset="ab ",
                                   min_words=1, max_words=2), seed=seed)
        base = dict(PRESETS["synth-tiny"])
        base.update(
            data_dir=f"{a},{b}", snapshot_dir=str(tmp_path / "run"),
            epochs=2, bucket_widths=(128, 256), batch_pixels=2**16,
            val_interval_steps=1000, log_interval=1000,
        )
        fit(TrainConfig(**base), log=lambda *a: None)
        rep = run_inference(
            str(tmp_path / "run" / "last"), f"{a},{b}", "test",
            batch_pixels=2**16, log=lambda *a: None)
        assert rep["lines"] == 8  # both corpora's test splits
