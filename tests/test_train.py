"""Training integration tests (SURVEY.md §4):

- config #1 smoke: tiny CNN-BLSTM-CTC on synthetic lines must reach ~0 CER
  on CPU in a few hundred steps — the whole-stack smoke test;
- checkpoint self-description: decode rebuilds the model from a snapshot
  alone (FromSavedWeights property);
- resume determinism;
- DP on the virtual 8-device mesh: same global batch => same loss as
  single-device (up to reduction order).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vistaocr_tpu.checkpoint import load_model, load_snapshot
from vistaocr_tpu.data import build_synthetic_dataset, ShardedLineDataset, BatchPipeline
from vistaocr_tpu.data.synth import SynthConfig
from vistaocr_tpu.decode import greedy_decode
from vistaocr_tpu.parallel import MeshConfig, make_mesh, shard_batch_arrays, replicated
from vistaocr_tpu.text import Alphabet, cer_wer
from vistaocr_tpu.train import (
    PRESETS,
    TrainConfig,
    TrainState,
    fit,
    make_eval_step,
    make_optimizer,
    make_train_step,
    evaluate,
)


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    # Small charset + short lines keep the CPU smoke fast.
    cfg = SynthConfig(language="charset", charset="abcdeo ", min_words=1, max_words=3)
    return build_synthetic_dataset(
        str(d), num_train=96, num_val=24, height=32, max_width=384,
        config=cfg, seed=11,
    )


def _smoke_config(data_dir, snapshot_dir, **over):
    base = dict(PRESETS["synth-tiny"])
    base.update(
        data_dir=data_dir,
        snapshot_dir=snapshot_dir,
        epochs=200,
        max_steps=over.pop("max_steps", 300),
        val_interval_steps=75,
        log_interval=25,
        batch_pixels=2**17,
        seed=1,
    )
    base.update(over)
    return TrainConfig(**base)


class TestSmokeTraining:
    def test_config1_cer_drops_to_zero(self, synth_dir, tmp_path):
        """BASELINE.json config #1: synthetic lines, tiny model, greedy
        decode; CER must collapse on CPU."""
        cfg = _smoke_config(synth_dir, str(tmp_path / "run"))
        summary = fit(cfg, log=lambda *a: None)
        assert summary["steps"] >= 300
        assert summary["best_cer"] is not None
        assert summary["best_cer"] < 0.05, f"smoke CER too high: {summary}"
        # metrics stream exists and parses
        lines = open(os.path.join(cfg.snapshot_dir, "metrics.jsonl")).read().splitlines()
        assert len(lines) > 3
        assert all(json.loads(l) for l in lines)

    def test_snapshot_is_self_describing(self, synth_dir, tmp_path):
        """Decode path needs ONLY the snapshot dir (C16 parity property)."""
        run = str(tmp_path / "run2")
        cfg = _smoke_config(synth_dir, run, max_steps=150)
        fit(cfg, log=lambda *a: None)

        model, variables, alphabet, contract = load_model(os.path.join(run, "best"))
        ds = ShardedLineDataset(synth_dir, "val")
        pipe = BatchPipeline(
            ds, alphabet, contract, batch_pixels=2**17, drop_remainder=False,
            shuffle=False,
        )
        eval_step = make_eval_step(model)
        c, w, _ = evaluate(
            eval_step, variables["params"], variables["batch_stats"], pipe, alphabet
        )
        assert c < 0.30  # 150 steps: learning clearly, not converged

    def test_resume_continues(self, synth_dir, tmp_path):
        run = str(tmp_path / "run3")
        cfg = _smoke_config(synth_dir, run, max_steps=60, val_interval_steps=30)
        s1 = fit(cfg, log=lambda *a: None)
        cfg2 = _smoke_config(
            synth_dir, run, max_steps=30, val_interval_steps=30,
        )
        cfg2.resume = True
        s2 = fit(cfg2, log=lambda *a: None)
        assert s2["steps"] > s1["steps"]
        meta = load_snapshot(os.path.join(run, "last"))[4]
        assert meta["step"] == s2["steps"]


class TestDataParallel:
    def test_dp_loss_matches_single_device(self, synth_dir, eight_devices):
        """Same global batch on a 1-device vs 8-device mesh: loss and the
        updated params must agree (up to reduction order ~1e-5)."""
        ds = ShardedLineDataset(synth_dir, "train")
        alpha = Alphabet.build(ds.transcripts())
        cfg = _smoke_config(synth_dir, "")
        contract = cfg.contract()
        from vistaocr_tpu.models import CnnLstmOcr

        model_cfg = cfg.model_config(alpha.num_classes)
        model = CnnLstmOcr(model_cfg)
        variables = model.init_params(jax.random.PRNGKey(0))
        tx = make_optimizer(cfg)
        train_step = make_train_step(model, tx, cfg.label_average)

        pipe = BatchPipeline(
            ds, alpha, contract, batch_pixels=2**17, batch_multiple=8,
            drop_remainder=True, shuffle=False,
        )
        batch = next(iter(pipe.epoch(0)))
        assert batch.size % 8 == 0

        results = {}
        for name, mesh_cfg in (("single", MeshConfig(data=1, model=1)),
                               ("dp8", MeshConfig(data=8, model=1))):
            devs = eight_devices[:1] if name == "single" else eight_devices
            mesh = make_mesh(mesh_cfg, devices=devs)
            state = TrainState(
                params=jax.device_get(variables["params"]),
                batch_stats=jax.device_get(variables["batch_stats"]),
                opt_state=tx.init(variables["params"]),
                step=jnp.asarray(0, jnp.int32),
            )
            state = jax.device_put(state, replicated(mesh))
            sh = shard_batch_arrays(mesh)
            images = jax.device_put(batch.images, sh["images"])
            widths = jax.device_put(batch.widths, sh["widths"])
            labels = jax.device_put(batch.labels, sh["labels"])
            ll = jax.device_put(batch.label_lengths, sh["label_lengths"])
            w = jax.device_put(
                jnp.asarray(batch.valid, jnp.float32), sh["widths"]
            )
            new_state, m = train_step(
                state, images, widths, labels, ll, w,
                jnp.asarray(1e-3, jnp.float32), jax.random.PRNGKey(5),
            )
            results[name] = (
                float(m["loss"]),
                jax.device_get(new_state.params),
            )

        assert results["single"][0] == pytest.approx(results["dp8"][0], rel=1e-5)
        flat_s = jax.tree.leaves(results["single"][1])
        flat_d = jax.tree.leaves(results["dp8"][1])
        # Reduction order differs across mesh sizes; Adam's rsqrt on
        # near-zero second moments amplifies ~1e-7 sum noise to ~1e-3 on a
        # handful of elements. Real sharding bugs diverge by orders of
        # magnitude, so these tolerances still bite.
        for a, b in zip(flat_s, flat_d):
            np.testing.assert_allclose(a, b, atol=3e-3, rtol=2e-2)

    def test_dp_fit_converges_like_single_device(self, synth_dir, tmp_path,
                                                 eight_devices):
        """fit() driven end-to-end through an 8-device DP mesh must
        CONVERGE, not just run one step (VERDICT r3 task 3a): same config
        + seed on a 1-device and an 8-device mesh, both trained to the
        smoke budget, final val CERs must both collapse and agree.
        Trajectories are not bit-identical (cross-device reduction
        order), so the gate is on the converged metric."""
        results = {}
        for name, n in (("single", 1), ("dp8", 8)):
            mesh = make_mesh(MeshConfig(data=n, model=1),
                             devices=eight_devices[:n])
            cfg = _smoke_config(
                synth_dir, str(tmp_path / f"fit_{name}"), max_steps=250,
            )
            results[name] = fit(cfg, mesh=mesh, log=lambda *a: None)
        cer_s = results["single"]["best_cer"]
        cer_d = results["dp8"]["best_cer"]
        assert cer_s is not None and cer_d is not None
        assert cer_s < 0.05, f"single-device fit did not converge: {cer_s}"
        assert cer_d < 0.05, f"8-device DP fit did not converge: {cer_d}"
        assert abs(cer_s - cer_d) <= 0.03, (cer_s, cer_d)


class TestTensorParallel:
    def test_tp_matches_replicated(self, synth_dir, eight_devices):
        """DPxTP (4x2) mesh with column-parallel LSTM/bridge shards must
        produce the same loss and updated params as pure DP."""
        from vistaocr_tpu.models import CnnLstmOcr
        from vistaocr_tpu.parallel import param_shardings

        ds = ShardedLineDataset(synth_dir, "train")
        alpha = Alphabet.build(ds.transcripts())
        cfg = _smoke_config(synth_dir, "")
        contract = cfg.contract()
        model_cfg = cfg.model_config(alpha.num_classes)
        model = CnnLstmOcr(model_cfg)
        variables = model.init_params(jax.random.PRNGKey(0))
        tx = make_optimizer(cfg)
        train_step = make_train_step(model, tx, cfg.label_average)

        pipe = BatchPipeline(
            ds, alpha, contract, batch_pixels=2**17, batch_multiple=8,
            drop_remainder=True, shuffle=False,
        )
        batch = next(iter(pipe.epoch(0)))

        results = {}
        for name, mesh_cfg in (("dp8", MeshConfig(data=8, model=1)),
                               ("dp4tp2", MeshConfig(data=4, model=2))):
            mesh = make_mesh(mesh_cfg, devices=eight_devices)
            state = TrainState(
                params=jax.device_get(variables["params"]),
                batch_stats=jax.device_get(variables["batch_stats"]),
                opt_state=tx.init(variables["params"]),
                step=jnp.asarray(0, jnp.int32),
            )
            sharding = (
                param_shardings(state, mesh)
                if mesh.shape["model"] > 1 else replicated(mesh)
            )
            state = jax.device_put(state, sharding)
            sh = shard_batch_arrays(mesh)
            args = [jax.device_put(a, sh["widths"]) if a.ndim == 1
                    else jax.device_put(a, sh["images"])
                    for a in (batch.images, batch.widths, batch.labels,
                              batch.label_lengths)]
            w = jax.device_put(jnp.asarray(batch.valid, jnp.float32),
                               sh["widths"])
            new_state, m = train_step(
                state, *args, w, jnp.asarray(1e-3, jnp.float32),
                jax.random.PRNGKey(5),
            )
            results[name] = (float(m["loss"]),
                             jax.device_get(new_state.params))

        assert results["dp8"][0] == pytest.approx(results["dp4tp2"][0],
                                                  rel=1e-4)
        for a, b in zip(jax.tree.leaves(results["dp8"][1]),
                        jax.tree.leaves(results["dp4tp2"][1])):
            np.testing.assert_allclose(a, b, atol=3e-3, rtol=2e-2)


class TestCli:
    def test_boolean_flags_can_be_negated(self):
        from vistaocr_tpu.train import build_argparser, config_from_args

        p = build_argparser()
        # preset enables tiny_model; the CLI must be able to switch it off
        args = p.parse_args(["--preset", "synth-tiny", "--no-tiny-model"])
        cfg = config_from_args(args)
        assert cfg.tiny_model is False
        args = p.parse_args(["--preset", "synth-tiny"])
        cfg = config_from_args(args)
        assert cfg.tiny_model is True  # preset value survives when unset
        args = p.parse_args(["--resume"])
        assert config_from_args(args).resume is True


class TestDistributedInit:
    def test_single_process_initialize(self):
        """maybe_init_distributed with a 1-process coordinator must come up
        and leave mesh construction working (the multi-host entry path)."""
        import subprocess, sys

        code = (
            "import jax; jax.config.update('jax_platforms','cpu');\n"
            "from vistaocr_tpu.train import maybe_init_distributed\n"
            "assert not maybe_init_distributed(None)\n"
            "assert maybe_init_distributed('localhost:12391', 1, 0)\n"
            "import jax\n"
            "assert jax.process_count() == 1\n"
            "from vistaocr_tpu.parallel import MeshConfig, make_mesh\n"
            "m = make_mesh(MeshConfig())\n"
            "print('mesh', m.shape)\n"
        )
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=300,
        )
        assert out.returncode == 0, out.stderr
        assert "mesh" in out.stdout
