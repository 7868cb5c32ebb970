"""Parity tests for the quarantined fused-input-stem experiment
(experiments/stem_pallas.py) vs the XLA oracle composition: values and
kernel gradients, interpret mode.

Run directly: python -m pytest experiments/test_stem_pallas.py -q
(Not collected by the product suite; the kernel is measured-and-rejected.)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vistaocr_tpu.ops.preprocess import preprocess_images
from stem_pallas import fused_stem


def _oracle(images, widths, kernel, standardize=True):
    x = preprocess_images(images, widths, standardize=standardize)
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _case(seed, B=4, H=32, W=128, CO=16):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.integers(0, 256, (B, H, W), np.uint8))
    widths = jnp.asarray(rng.integers(W // 3, W + 1, B).astype(np.int32))
    kernel = jnp.asarray(rng.normal(0, 0.3, (3, 3, 1, CO)).astype(np.float32))
    return images, widths, kernel


class TestFusedStem:
    @pytest.mark.parametrize("standardize", [True, False])
    def test_matches_oracle(self, standardize):
        images, widths, kernel = _case(0)
        ours = fused_stem(images, widths, kernel, standardize, jnp.float32, True)
        ref = _oracle(images, widths, kernel, standardize=standardize)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_kernel_grad_matches_oracle(self, ):
        images, widths, kernel = _case(1)
        rng = np.random.default_rng(9)
        proj = jnp.asarray(rng.normal(0, 1, (4, 32, 128, 16)).astype(np.float32))

        gp = jax.grad(lambda k: jnp.sum(
            fused_stem(images, widths, k, True, jnp.float32, True) * proj))(kernel)
        go = jax.grad(lambda k: jnp.sum(_oracle(images, widths, k) * proj))(kernel)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(go),
                                   atol=2e-4, rtol=1e-4)

    def test_narrow_width_masking(self):
        """Padding content beyond the true width must not leak through the
        stencil (the halo at the mask boundary is part of real conv
        semantics; content farther right is not)."""
        rng = np.random.default_rng(2)
        img1 = rng.integers(0, 256, (1, 32, 128), np.uint8)
        img2 = img1.copy()
        img2[:, :, 60:] = 13  # differs only beyond width
        widths = jnp.asarray(np.array([50], np.int32))
        k = jnp.asarray(rng.normal(0, 0.3, (3, 3, 1, 8)).astype(np.float32))
        o1 = fused_stem(jnp.asarray(img1), widths, k, True, jnp.float32, True)
        o2 = fused_stem(jnp.asarray(img2), widths, k, True, jnp.float32, True)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
