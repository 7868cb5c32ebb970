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

    def test_epoch_plan_stacking_is_concatenation(self, setup):
        """epoch_plan(e, stack=N) must contain, per bucket, exactly the
        rows of epoch_plan(e)..epoch_plan(e+N-1) concatenated in epoch
        order — stacking changes dispatch granularity, never the data."""
        ds, alpha, contract = setup
        cache = DeviceCache(BatchPipeline(ds, alpha, contract,
                                          batch_pixels=32 * 256 * 4, seed=9,
                                          shuffle=True))

        def rows(plan):
            return {b: np.asarray(idx) for b, _, idx, _ in plan}

        singles = [rows(cache.epoch_plan(e)) for e in (3, 4, 5)]
        stacked = rows(cache.epoch_plan(3, stack=3))
        assert set(stacked) == set(singles[0])
        for b, idx in stacked.items():
            expect = np.concatenate([s[b] for s in singles], axis=0)
            np.testing.assert_array_equal(idx, expect)
        # weights shape rides along
        for b, _, idx, w in cache.epoch_plan(3, stack=3):
            assert w.shape == idx.shape


class TestDeviceCacheSharding:
    """The cached path must keep DP alive: gathered batches land
    batch-sharded on the 'data' mesh axis (not replicated), and a train
    step over them matches the streaming-DP step exactly."""

    def test_gather_outputs_are_data_sharded(self, setup, eight_devices):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from vistaocr_tpu.parallel import MeshConfig, make_mesh, replicated, shard_batch_arrays

        ds, alpha, contract = setup
        mesh = make_mesh(MeshConfig(data=8), devices=eight_devices)
        pipe = BatchPipeline(ds, alpha, contract, batch_pixels=32 * 256 * 8,
                             batch_multiple=8, drop_remainder=True, seed=5)
        cache = DeviceCache(pipe, sharding=replicated(mesh))
        sh = shard_batch_arrays(mesh)
        want = NamedSharding(mesh, P("data"))
        n = 0
        for b in cache.device_epoch(0, sharding=sh):
            assert b.images.sharding.is_equivalent_to(want, b.images.ndim)
            assert b.labels.sharding.is_equivalent_to(want, b.labels.ndim)
            # every device holds only its slice, not the full batch
            shard_rows = {s.data.shape[0] for s in b.images.addressable_shards}
            assert shard_rows == {b.images.shape[0] // 8}
            n += 1
        assert n > 0

    def test_cached_dp_step_matches_streaming_dp(self, setup, eight_devices):
        import jax.numpy as jnp
        import optax
        from vistaocr_tpu.models import CnnLstmOcr, ModelConfig
        from vistaocr_tpu.models.cnn import ConvStageSpec
        from vistaocr_tpu.parallel import MeshConfig, make_mesh, replicated, shard_batch_arrays
        from vistaocr_tpu.train import TrainState, make_train_step

        ds, alpha, contract = setup
        mesh = make_mesh(MeshConfig(data=8), devices=eight_devices)
        cfg = ModelConfig(
            num_classes=alpha.num_classes,
            stages=(ConvStageSpec(8, 1, (2, 2)), ConvStageSpec(8, 1, (2, 2))),
            bridge_dim=32, lstm_hidden=32, lstm_layers=1, dropout=0.0,
        )
        model = CnnLstmOcr(cfg)
        # Host-side copies: the train step donates its state, and device_put
        # aliases (doesn't copy) arrays whose sharding already matches — so
        # each run must restage from host memory.
        variables = jax.tree.map(np.asarray, model.init_params(jax.random.PRNGKey(0)))
        tx = optax.scale_by_adam()

        def fresh_state():
            return jax.device_put(
                TrainState(params=variables["params"],
                           batch_stats=variables["batch_stats"],
                           opt_state=tx.init(variables["params"]),
                           step=jnp.asarray(0, jnp.int32)),
                replicated(mesh),
            )

        step = make_train_step(model, tx, label_average=False, ctc_impl="scan")
        sh = shard_batch_arrays(mesh)
        contract2 = ShapeContract(bucket_widths=(128, 256, 384, 512),
                                  width_stride=cfg.width_stride)

        def run(pipe_factory):
            state = fresh_state()
            losses = []
            pipe = pipe_factory()
            for b in pipe.device_epoch(0, sharding=sh):
                state, m = step(
                    state, b.images, b.widths, b.labels, b.label_lengths,
                    jnp.asarray(b.valid, jnp.float32),
                    jnp.asarray(1e-3, jnp.float32), jax.random.PRNGKey(7),
                )
                losses.append(float(m["loss"]))
            return losses

        def streaming():
            return BatchPipeline(ds, alpha, contract2,
                                 batch_pixels=32 * 256 * 8, batch_multiple=8,
                                 drop_remainder=True, seed=5)

        def cached():
            return DeviceCache(streaming(), sharding=replicated(mesh))

        ls, lc = run(streaming), run(cached)
        assert len(ls) == len(lc) > 0
        np.testing.assert_allclose(ls, lc, rtol=1e-5)
