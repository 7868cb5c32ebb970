"""DeviceCache must be observationally identical to the streaming pipeline:
same batches (content-wise) for the same epoch seed, same shuffle
semantics, correct tail padding."""

import numpy as np
import pytest

import jax

from vistaocr_tpu.data import build_synthetic_dataset, ShardedLineDataset, BatchPipeline, ShapeContract
from vistaocr_tpu.data.device_cache import DeviceCache
from vistaocr_tpu.text import Alphabet


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = build_synthetic_dataset(
        str(tmp_path_factory.mktemp("dc")), num_train=40, num_val=0,
        height=32, max_width=512, seed=4,
    )
    ds = ShardedLineDataset(d, "train")
    alpha = Alphabet.build(ds.transcripts())
    contract = ShapeContract(bucket_widths=(128, 256, 384, 512))
    return ds, alpha, contract


class TestDeviceCache:
    def test_matches_streaming_pipeline(self, setup):
        ds, alpha, contract = setup
        pipe = BatchPipeline(ds, alpha, contract, batch_pixels=32 * 256 * 8,
                             drop_remainder=False, seed=5)
        cache = DeviceCache(BatchPipeline(ds, alpha, contract,
                                          batch_pixels=32 * 256 * 8,
                                          drop_remainder=False, seed=5))
        for epoch in (0, 1):
            stream = {tuple(b.indices[b.valid].tolist()): b for b in pipe.epoch(epoch)}
            cached = {tuple(b.indices[b.valid].tolist()): b for b in cache.epoch(epoch)}
            assert set(stream) == set(cached)
            for key, sb in stream.items():
                cb = cached[key]
                assert isinstance(cb.images, jax.Array)
                np.testing.assert_array_equal(np.asarray(cb.images)[cb.valid],
                                              sb.images[sb.valid])
                np.testing.assert_array_equal(np.asarray(cb.labels)[cb.valid],
                                              sb.labels[sb.valid])
                np.testing.assert_array_equal(np.asarray(cb.widths)[cb.valid],
                                              sb.widths[sb.valid])

    def test_reshuffles_across_epochs(self, setup):
        ds, alpha, contract = setup
        cache = DeviceCache(BatchPipeline(ds, alpha, contract,
                                          batch_pixels=32 * 256 * 4, seed=9))
        e0 = [tuple(b.indices.tolist()) for b in cache.epoch(0)]
        e1 = [tuple(b.indices.tolist()) for b in cache.epoch(1)]
        assert e0 != e1
        e0b = [tuple(b.indices.tolist()) for b in cache.epoch(0)]
        assert e0 == e0b  # deterministic per epoch

    def test_memory_cap(self, setup):
        ds, alpha, contract = setup
        pipe = BatchPipeline(ds, alpha, contract, batch_pixels=32 * 256 * 8)
        with pytest.raises(MemoryError):
            DeviceCache(pipe, max_bytes=1024)
