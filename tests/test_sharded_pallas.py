"""Pallas kernels under a sharded data mesh (SURVEY.md §2: DP is
first-class, which means the FAST path, not just the scan path).

pallas_call is opaque to the XLA partitioner; without the
parallel/partition.py wrappers GSPMD all-gathers batch-sharded operands
and replicates the kernel on every device. These tests pin:

- value/grad parity of the partitioned kernels (interpret mode) with the
  lax.scan oracles under an 8-virtual-device data mesh;
- that the compiled programs contain NO all-gather around the kernels
  (the DP-scaling property itself);
- a full train step with lstm/ctc on the fused impls matching the scan
  impls under DP sharding.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vistaocr_tpu.parallel import MeshConfig, make_mesh, replicated, shard_batch_arrays


@pytest.fixture(scope="module")
def mesh(eight_devices):
    return make_mesh(MeshConfig(data=8), devices=eight_devices)


def _batch_sharded(mesh, x, axis=0):
    spec = [None] * x.ndim
    spec[axis] = "data"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


class TestShardedCtc:
    def test_loss_and_grad_match_scan(self, mesh):
        from vistaocr_tpu.ops.ctc import ctc_loss
        from vistaocr_tpu.ops.ctc_pallas import ctc_loss_pallas

        B, T, K, L = 16, 32, 12, 8
        rng = np.random.default_rng(0)
        lp = jax.nn.log_softmax(
            jnp.asarray(rng.normal(size=(B, T, K)), jnp.float32), axis=-1
        )
        il = jnp.asarray(rng.integers(T // 2, T + 1, (B,)), jnp.int32)
        lab = jnp.asarray(rng.integers(1, K, (B, L)), jnp.int32)
        ll = jnp.asarray(rng.integers(1, L + 1, (B,)), jnp.int32)

        lp_s = _batch_sharded(mesh, lp)
        il_s, lab_s, ll_s = (_batch_sharded(mesh, a) for a in (il, lab, ll))

        def loss_pallas(lp_, il_, lab_, ll_):
            return jnp.sum(ctc_loss_pallas(lp_, il_, lab_, ll_, 0, True))

        def loss_scan(lp_, il_, lab_, ll_):
            return jnp.sum(ctc_loss(lp_, il_, lab_, ll_))

        v_p, g_p = jax.jit(jax.value_and_grad(loss_pallas))(
            lp_s, il_s, lab_s, ll_s
        )
        v_s, g_s = jax.jit(jax.value_and_grad(loss_scan))(lp, il, lab, ll)
        np.testing.assert_allclose(float(v_p), float(v_s), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g_p), np.asarray(g_s), atol=2e-5
        )

    def test_no_allgather_in_forward(self, mesh):
        from vistaocr_tpu.ops.ctc_pallas import ctc_loss_pallas

        B, T, K, L = 16, 32, 12, 8
        lp = jnp.zeros((B, T, K), jnp.float32)
        il = jnp.full((B,), T, jnp.int32)
        lab = jnp.ones((B, L), jnp.int32)
        ll = jnp.full((B,), L, jnp.int32)
        args = (
            _batch_sharded(mesh, lp),
            _batch_sharded(mesh, il),
            _batch_sharded(mesh, lab),
            _batch_sharded(mesh, ll),
        )
        hlo = (
            jax.jit(lambda *a: ctc_loss_pallas(*a, 0, True))
            .lower(*args)
            .compile()
            .as_text()
        )
        # No DATA tensor may be gathered (a tiny s32 index all-gather from
        # the terminal-state fancy-index is fine — bytes, not the batch).
        assert not re.search(r"all-gather[^=]*= f32", hlo), (
            "CTC kernel was replicated (f32 all-gather present)"
        )


class TestShardedLstm:
    def test_layer_value_and_grads_match_scan(self, mesh):
        from vistaocr_tpu.models.blstm import lstm_layer
        from vistaocr_tpu.ops.lstm_pallas import lstm_layer_pallas

        B, T, D, H = 16, 24, 16, 8
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
        lens = rng.integers(T // 2, T + 1, (B,))
        mask = jnp.asarray(np.arange(T)[None, :] < lens[:, None])
        wx = jnp.asarray(rng.normal(size=(D, 4 * H)) * 0.1, jnp.float32)
        wh = jnp.asarray(rng.normal(size=(H, 4 * H)) * 0.1, jnp.float32)
        b = jnp.zeros((4 * H,), jnp.float32)

        x_s = _batch_sharded(mesh, x)
        mask_s = _batch_sharded(mesh, mask)
        rep = replicated(mesh)
        wx_s, wh_s, b_s = (jax.device_put(a, rep) for a in (wx, wh, b))

        cot = jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32)
        cot_s = _batch_sharded(mesh, cot)

        def out_pallas(x_, wx_, wh_, b_, mask_, cot_):
            ys = lstm_layer_pallas(x_, mask_, wx_, wh_, b_, interpret=True)
            return jnp.sum(ys * cot_)

        def out_scan(x_, wx_, wh_, b_, mask_, cot_):
            ys = lstm_layer(x_, mask_, wx_, wh_, b_)
            return jnp.sum(ys * cot_)

        v_p, g_p = jax.jit(jax.value_and_grad(out_pallas, argnums=(0, 1, 2, 3)))(
            x_s, wx_s, wh_s, b_s, mask_s, cot_s
        )
        v_s, g_s = jax.jit(jax.value_and_grad(out_scan, argnums=(0, 1, 2, 3)))(
            x, wx, wh, b, mask, cot
        )
        np.testing.assert_allclose(float(v_p), float(v_s), rtol=1e-5)
        names = ("dx", "dwx", "dwh", "db")
        for n, a, bb in zip(names, g_p, g_s):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), atol=3e-5, err_msg=n
            )

    def test_recurrence_partition_no_allgather(self, mesh):
        from vistaocr_tpu.ops.lstm_pallas import lstm_recurrence_pallas

        T, B, H = 16, 16, 8
        xw = jnp.zeros((T, B, 4 * H), jnp.float32)
        m = jnp.ones((T, 1, B), jnp.float32)
        wh = jnp.zeros((H, 4 * H), jnp.float32)
        xw_s = _batch_sharded(mesh, xw, axis=1)
        m_s = _batch_sharded(mesh, m, axis=2)
        wh_s = jax.device_put(wh, replicated(mesh))
        hlo = (
            jax.jit(
                lambda a, b, c: lstm_recurrence_pallas(a, b, c, jnp.float32, True)
            )
            .lower(xw_s, m_s, wh_s)
            .compile()
            .as_text()
        )
        assert not re.search("all-gather", hlo), "LSTM kernel was replicated"


class TestShardedTrainStepFusedImpls:
    def test_full_step_matches_scan_impls(self, mesh, tmp_path):
        """Flagship train step with lstm_impl/ctc_impl on the Pallas kernels
        (interpret mode) under DP: loss and updated params must match the
        scan-impl step on the same sharded batch."""
        import optax
        from vistaocr_tpu.models import CnnLstmOcr, ModelConfig
        from vistaocr_tpu.models.cnn import ConvStageSpec
        from vistaocr_tpu.train import TrainState, make_train_step

        B, Hpx, W = 16, 32, 128
        rng = np.random.default_rng(3)
        images = rng.integers(0, 255, (B, Hpx, W), dtype=np.uint8)
        widths = rng.integers(W // 2, W + 1, (B,)).astype(np.int32)
        labels = rng.integers(1, 12, (B, 8)).astype(np.int32)
        lls = rng.integers(1, 9, (B,)).astype(np.int32)

        sh = shard_batch_arrays(mesh)
        batch = dict(
            images=jax.device_put(images, sh["images"]),
            widths=jax.device_put(widths, sh["widths"]),
            labels=jax.device_put(labels, sh["labels"]),
            label_lengths=jax.device_put(lls, sh["label_lengths"]),
        )
        weights = jax.device_put(
            jnp.ones((B,), jnp.float32), sh["widths"]
        )

        def make(lstm_impl, ctc_impl):
            cfg = ModelConfig(
                num_classes=12,
                stages=(ConvStageSpec(8, 1, (2, 2)), ConvStageSpec(8, 1, (2, 2))),
                bridge_dim=32, lstm_hidden=32, lstm_layers=1, dropout=0.0,
                lstm_impl=lstm_impl,
            )
            model = CnnLstmOcr(cfg)
            variables = jax.tree.map(
                np.asarray, model.init_params(jax.random.PRNGKey(0))
            )
            tx = optax.scale_by_adam()
            state = jax.device_put(
                TrainState(
                    params=variables["params"],
                    batch_stats=variables["batch_stats"],
                    opt_state=tx.init(variables["params"]),
                    step=jnp.asarray(0, jnp.int32),
                ),
                replicated(mesh),
            )
            step = make_train_step(model, tx, label_average=False,
                                   ctc_impl=ctc_impl)
            return step(
                state, batch["images"], batch["widths"], batch["labels"],
                batch["label_lengths"], weights,
                jnp.asarray(1e-3, jnp.float32), jax.random.PRNGKey(5),
            )

        s_fused, m_fused = make("pallas_interpret", "pallas_interpret")
        s_scan, m_scan = make("scan", "scan")
        np.testing.assert_allclose(
            float(m_fused["loss"]), float(m_scan["loss"]), rtol=1e-4
        )
        for a, b in zip(
            jax.tree.leaves(jax.device_get(s_fused.params)),
            jax.tree.leaves(jax.device_get(s_scan.params)),
        ):
            np.testing.assert_allclose(a, b, atol=5e-4, rtol=2e-2)
