"""On-device height normalization (ops/resize.py) vs the prep-time PIL
oracle (data/transforms.height_normalize). PIL's 8-bit path uses int16
fixed-point filter coefficients, so parity is to within ~1 uint8 level."""

import numpy as np
import pytest

import jax.numpy as jnp

from vistaocr_tpu.data.transforms import height_normalize
from vistaocr_tpu.ops.resize import (
    MAX_SCALE,
    host_pool,
    resize_lines,
    resized_to_uint8,
)


def _line(rng, h, w):
    """Text-like synthetic content: paper + dark strokes."""
    img = np.full((h, w), 255, np.uint8)
    for _ in range(max(3, w // 12)):
        y = rng.integers(0, h)
        x = rng.integers(0, w)
        lw = rng.integers(1, max(2, w // 6))
        img[max(0, y - 1) : y + 2, x : x + lw] = rng.integers(0, 90)
    return img


class TestDeviceResizeVsPIL:
    @pytest.mark.parametrize(
        "h,w",
        [(32, 200), (48, 311), (64, 123), (20, 64), (33, 257), (17, 80)],
    )
    def test_matches_pil_within_quantization(self, h, w):
        out_h = 32
        rng = np.random.default_rng(h * 1000 + w)
        img = _line(rng, h, w)
        ref = height_normalize(img, out_h)  # PIL oracle
        new_w = ref.shape[1]

        Hr, Wr = MAX_SCALE * out_h, 2 * MAX_SCALE * out_h * 8
        assert h <= Hr and w <= Wr
        raw = np.full((1, Hr, Wr), 255, np.uint8)
        raw[0, :h, :w] = img
        out = resized_to_uint8(resize_lines(
            jnp.asarray(raw), jnp.asarray([h], np.int32),
            jnp.asarray([w], np.int32), jnp.asarray([new_w], np.int32),
            out_h=out_h, out_w=Wr // 2,
        ))
        got = np.asarray(out)[0, :, :new_w]
        diff = np.abs(got.astype(int) - ref.astype(int))
        assert diff.max() <= 2, (h, w, diff.max())
        assert diff.mean() < 0.5

    def test_identity_when_already_normalized(self):
        rng = np.random.default_rng(0)
        img = _line(rng, 32, 120)
        raw = np.full((1, 64, 256), 255, np.uint8)
        raw[0, :32, :120] = img
        out = resized_to_uint8(resize_lines(
            jnp.asarray(raw), jnp.asarray([32], np.int32),
            jnp.asarray([120], np.int32), jnp.asarray([120], np.int32),
            out_h=32, out_w=128,
        ))
        np.testing.assert_array_equal(np.asarray(out)[0, :, :120], img)

    def test_pad_columns_are_paper(self):
        rng = np.random.default_rng(1)
        img = _line(rng, 48, 100)
        raw = np.full((1, 64, 256), 0, np.uint8)  # adversarial pad content
        raw[0, :48, :100] = img
        new_w = round(100 * 32 / 48)
        out = resized_to_uint8(resize_lines(
            jnp.asarray(raw), jnp.asarray([48], np.int32),
            jnp.asarray([100], np.int32), jnp.asarray([new_w], np.int32),
            out_h=32, out_w=128,
        ))
        assert (np.asarray(out)[0, :, new_w:] == 255).all()

    def test_clamped_width_rescales_anisotropically(self):
        """When the host clamps new_w to the ladder max, x and y scales
        differ — matching height_normalize(max_width=...)."""
        rng = np.random.default_rng(2)
        img = _line(rng, 32, 250)
        ref = height_normalize(img, 32, max_width=128)
        assert ref.shape == (32, 128)
        raw = np.full((1, 64, 256), 255, np.uint8)
        raw[0, :32, :250] = img
        out = resized_to_uint8(resize_lines(
            jnp.asarray(raw), jnp.asarray([32], np.int32),
            jnp.asarray([250], np.int32), jnp.asarray([128], np.int32),
            out_h=32, out_w=128,
        ))
        diff = np.abs(np.asarray(out)[0].astype(int) - ref.astype(int))
        assert diff.max() <= 2


class TestHostPool:
    def test_tall_input_pools_under_cap(self):
        rng = np.random.default_rng(3)
        img = _line(rng, 200, 600)
        pooled = host_pool(img, cap=64)
        assert pooled.shape[0] <= 64
        assert pooled.dtype == np.uint8
        # box filter preserves overall ink mass roughly
        assert abs(float(pooled.mean()) - float(img.mean())) < 8.0

    def test_short_input_untouched(self):
        img = np.zeros((40, 80), np.uint8)
        assert host_pool(img, cap=64) is img
