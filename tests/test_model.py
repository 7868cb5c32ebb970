"""Model tests: preprocess, conv frame arithmetic, BLSTM vs torch oracle,
full CnnLstmOcr forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vistaocr_tpu.data.buckets import ShapeContract
from vistaocr_tpu.models import CnnLstmOcr, ModelConfig
from vistaocr_tpu.models.blstm import lstm_layer
from vistaocr_tpu.models.cnn import ConvStack, ConvStageSpec
from vistaocr_tpu.ops.preprocess import preprocess_images


class TestPreprocess:
    def test_shapes_and_polarity(self):
        imgs = np.full((2, 8, 16), 255, np.uint8)  # all paper
        imgs[0, :, :4] = 0  # ink block
        widths = jnp.array([8, 16], jnp.int32)
        out = preprocess_images(jnp.asarray(imgs), widths, standardize=False)
        assert out.shape == (2, 8, 16, 1)
        # ink -> 1, paper -> 0
        assert float(out[0, 0, 0, 0]) == 1.0
        assert float(out[0, 0, 5, 0]) == 0.0

    def test_padding_zeroed(self):
        imgs = np.zeros((1, 4, 8), np.uint8)  # all ink incl. pad region
        widths = jnp.array([5], jnp.int32)
        out = preprocess_images(jnp.asarray(imgs), widths, standardize=False)
        assert (np.asarray(out[0, :, 5:, 0]) == 0).all()
        assert (np.asarray(out[0, :, :5, 0]) == 1).all()

    def test_standardize_masked(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (1, 8, 16), dtype=np.uint8)
        widths = jnp.array([10], jnp.int32)
        out = np.asarray(preprocess_images(jnp.asarray(img), widths, standardize=True))
        valid = out[0, :, :10, 0]
        assert abs(valid.mean()) < 1e-4
        assert abs(valid.std() - 1.0) < 1e-2
        assert (out[0, :, 10:, 0] == 0).all()

    def test_standardize_invariant_to_pad_content(self):
        rng = np.random.default_rng(1)
        img1 = rng.integers(0, 256, (1, 8, 16), dtype=np.uint8)
        img2 = img1.copy()
        img2[:, :, 12:] = 7  # garbage in pad region must not matter
        widths = jnp.array([12], jnp.int32)
        o1 = np.asarray(preprocess_images(jnp.asarray(img1), widths))
        o2 = np.asarray(preprocess_images(jnp.asarray(img2), widths))
        np.testing.assert_allclose(o1, o2, atol=1e-6)


class TestConvFrameArithmetic:
    """Pin ShapeContract.frames_for_width against REAL conv output shapes
    (SURVEY.md hard-part #1: off-by-one here silently destroys parity)."""

    @pytest.mark.parametrize("width", [128, 256, 384, 512])
    def test_padded_width_exact(self, width):
        contract = ShapeContract(width_stride=4)
        stack = ConvStack()
        x = jnp.zeros((1, 32, width, 1))
        vars_ = stack.init(jax.random.PRNGKey(0), x, train=False)
        y = stack.apply(vars_, x, train=False)
        assert y.shape[2] == contract.frames_for_bucket(width)
        assert y.shape[1] == 32 // 8  # height 32 -> 4

    @pytest.mark.parametrize("true_w", [1, 3, 4, 5, 97, 128])
    def test_true_width_frames_within_padded(self, true_w):
        """Frames for the valid region: running the stack on exactly true_w
        columns yields frames_for_width(true_w) output columns (SAME padding
        and ceil-div pooling make this hold for any width)."""
        contract = ShapeContract(width_stride=4)
        stack = ConvStack()
        x = jnp.zeros((1, 32, true_w, 1))
        vars_ = stack.init(jax.random.PRNGKey(0), x, train=False)
        y = stack.apply(vars_, x, train=False)
        assert y.shape[2] == contract.frames_for_width(true_w)


class TestBLSTMvsTorch:
    """Numerical oracle: our masked scan LSTM vs torch.nn.LSTM (packed
    sequences), same weights (SURVEY.md §4 'numerical oracles')."""

    def _torch_lstm_outputs(self, x, lengths, wx, wh, b, reverse=False):
        import torch

        B, T, D = x.shape
        H = wh.shape[0]
        lstm = torch.nn.LSTM(D, H, num_layers=1, batch_first=True, bias=True)
        with torch.no_grad():
            lstm.weight_ih_l0.copy_(torch.from_numpy(wx.T.copy()))
            lstm.weight_hh_l0.copy_(torch.from_numpy(wh.T.copy()))
            lstm.bias_ih_l0.copy_(torch.from_numpy(b.copy()))
            lstm.bias_hh_l0.zero_()
        xt = torch.from_numpy(x.copy())
        if reverse:
            # emulate backward direction: flip valid region per sample
            flipped = xt.clone()
            for i, L in enumerate(lengths):
                flipped[i, :L] = torch.flip(xt[i, :L], dims=[0])
            xt = flipped
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            xt, torch.tensor(lengths), batch_first=True, enforce_sorted=False
        )
        out, _ = lstm(packed)
        out, _ = torch.nn.utils.rnn.pad_packed_sequence(
            out, batch_first=True, total_length=x.shape[1]
        )
        out = out.detach().numpy()
        if reverse:
            unflipped = out.copy()
            for i, L in enumerate(lengths):
                unflipped[i, :L] = out[i, :L][::-1]
            out = unflipped
        return out

    @pytest.mark.parametrize("reverse", [False, True])
    def test_matches_torch_packed(self, reverse):
        rng = np.random.default_rng(42)
        B, T, D, H = 3, 11, 8, 16
        lengths = [11, 7, 4]
        x = rng.normal(0, 1, (B, T, D)).astype(np.float32)
        wx = rng.normal(0, 0.3, (D, 4 * H)).astype(np.float32)
        wh = rng.normal(0, 0.3, (H, 4 * H)).astype(np.float32)
        b = rng.normal(0, 0.1, (4 * H,)).astype(np.float32)

        mask = np.arange(T)[None, :] < np.array(lengths)[:, None]
        ours = np.asarray(
            lstm_layer(
                jnp.asarray(x), jnp.asarray(mask), jnp.asarray(wx), jnp.asarray(wh),
                jnp.asarray(b), reverse=reverse,
            )
        )
        ref = self._torch_lstm_outputs(x, lengths, wx, wh, b, reverse=reverse)
        # compare only valid region (padded outputs differ by design:
        # ours repeats last state / pre-start zeros, torch pads with 0)
        for i, L in enumerate(lengths):
            np.testing.assert_allclose(ours[i, :L], ref[i, :L], atol=2e-5, rtol=2e-5)

    def test_carry_freeze_equals_short_sequence(self):
        """Forward states for a length-L sample inside a padded batch must
        equal running the same sample alone at exactly length L."""
        rng = np.random.default_rng(7)
        D, H, T, L = 6, 8, 12, 5
        x = rng.normal(0, 1, (1, T, D)).astype(np.float32)
        wx = rng.normal(0, 0.3, (D, 4 * H)).astype(np.float32)
        wh = rng.normal(0, 0.3, (H, 4 * H)).astype(np.float32)
        b = np.zeros((4 * H,), np.float32)
        mask = (np.arange(T) < L)[None, :]
        padded = np.asarray(
            lstm_layer(jnp.asarray(x), jnp.asarray(mask), jnp.asarray(wx),
                       jnp.asarray(wh), jnp.asarray(b))
        )
        alone = np.asarray(
            lstm_layer(jnp.asarray(x[:, :L]), jnp.ones((1, L), bool),
                       jnp.asarray(wx), jnp.asarray(wh), jnp.asarray(b))
        )
        np.testing.assert_allclose(padded[0, :L], alone[0], atol=1e-6)
        # frozen after L
        np.testing.assert_allclose(
            padded[0, L:], np.broadcast_to(padded[0, L - 1], (T - L, H)), atol=1e-6
        )


class TestCnnLstmOcr:
    def _tiny_config(self, num_classes=5):
        return ModelConfig(
            num_classes=num_classes,
            line_height=32,
            stages=(
                ConvStageSpec(8, 1, (2, 2)),
                ConvStageSpec(16, 1, (2, 2)),
                ConvStageSpec(16, 1, (2, 1)),
            ),
            bridge_dim=16,
            lstm_hidden=16,
            lstm_layers=1,
            dropout=0.0,
        )

    def test_forward_shapes(self):
        cfg = self._tiny_config()
        model = CnnLstmOcr(cfg)
        variables = model.init_params(jax.random.PRNGKey(0), batch=2, width=64)
        images = jnp.zeros((2, 32, 64), jnp.uint8)
        widths = jnp.array([64, 30], jnp.int32)
        log_probs, frame_mask = model.apply(
            variables, images, widths, train=False
        )
        assert log_probs.shape == (2, 16, 5)  # T = 64/4
        assert frame_mask.shape == (2, 16)
        # frame counts: ceil(64/4)=16, ceil(30/4)=8
        np.testing.assert_array_equal(np.asarray(frame_mask).sum(axis=1), [16, 8])
        # log-probs normalized
        np.testing.assert_allclose(
            np.exp(np.asarray(log_probs)).sum(-1), 1.0, atol=1e-5
        )

    def test_train_mode_with_batchnorm(self):
        cfg = self._tiny_config()
        model = CnnLstmOcr(cfg)
        variables = model.init_params(jax.random.PRNGKey(0))
        images = jnp.zeros((2, 32, 32), jnp.uint8)
        widths = jnp.array([32, 32], jnp.int32)
        (log_probs, _), updates = model.apply(
            variables, images, widths, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert "batch_stats" in updates

    def test_config_json_roundtrip(self):
        cfg = self._tiny_config()
        assert ModelConfig.from_json(cfg.to_json()) == cfg
        assert cfg.width_stride == 4

    def test_jit_compiles_once_per_shape(self):
        cfg = self._tiny_config()
        model = CnnLstmOcr(cfg)
        variables = model.init_params(jax.random.PRNGKey(0))
        n_traces = 0

        @jax.jit
        def fwd(images, widths):
            nonlocal n_traces
            n_traces += 1
            return model.apply(variables, images, widths, train=False)

        for _ in range(3):
            fwd(jnp.zeros((2, 32, 64), jnp.uint8), jnp.array([64, 32], jnp.int32))
        assert n_traces == 1


class TestAugment:
    def test_augment_changes_train_not_eval(self):
        from vistaocr_tpu.models import CnnLstmOcr, ModelConfig
        from vistaocr_tpu.models.cnn import ConvStageSpec
        import jax, numpy as np
        import jax.numpy as jnp

        cfg = ModelConfig(
            num_classes=5,
            stages=(ConvStageSpec(8, 1, (2, 2)), ConvStageSpec(8, 1, (2, 2)),
                    ConvStageSpec(8, 1, (2, 1))),
            bridge_dim=16, lstm_hidden=16, lstm_layers=1,
            dropout=0.0, augment=1.0, lstm_impl="scan",
        )
        model = CnnLstmOcr(cfg)
        variables = model.init_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.integers(0, 256, (2, 32, 64), np.uint8))
        widths = jnp.array([64, 48], jnp.int32)

        (lp_a, _), _ = model.apply(variables, images, widths, train=True,
                                   mutable=["batch_stats"],
                                   rngs={"dropout": jax.random.PRNGKey(1)})
        (lp_b, _), _ = model.apply(variables, images, widths, train=True,
                                   mutable=["batch_stats"],
                                   rngs={"dropout": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(lp_a), np.asarray(lp_b))
        # eval ignores augment entirely: deterministic
        lp_e1, _ = model.apply(variables, images, widths, train=False)
        lp_e2, _ = model.apply(variables, images, widths, train=False)
        np.testing.assert_array_equal(np.asarray(lp_e1), np.asarray(lp_e2))

    def test_augment_preserves_padding_zeros(self):
        from vistaocr_tpu.ops.preprocess import augment_images, preprocess_images
        import jax, numpy as np
        import jax.numpy as jnp

        rng = np.random.default_rng(1)
        images = jnp.asarray(rng.integers(0, 256, (2, 8, 16), np.uint8))
        widths = jnp.array([10, 16], jnp.int32)
        x = preprocess_images(images, widths)
        y = augment_images(x, widths, jax.random.PRNGKey(0), strength=1.0)
        assert (np.asarray(y[0, :, 10:, 0]) == 0).all()
        assert not np.allclose(np.asarray(y[0, :, :10, 0]),
                               np.asarray(x[0, :, :10, 0]))
