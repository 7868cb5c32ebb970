"""On-device deskew (ops/deskew.py): estimator recovery, shear
correctness vs a numpy oracle, and functional parity — a skewed line
decodes like its unskewed original once deskewed on device."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from vistaocr_tpu.ops.deskew import (
    device_deskew,
    estimate_skew_tan,
    shear_deskew,
)


def _shear_np(img, tan_theta, fill=255):
    """numpy oracle: vertical shear y_src = y + (x-cx)*tan, bilinear."""
    H, W = img.shape
    out = np.full((H, W), fill, np.float32)
    cx = (W - 1) / 2.0
    for y in range(H):
        for xx in range(W):
            src = y + (xx - cx) * tan_theta
            if 0.0 <= src <= H - 1.0:
                lo = int(np.floor(src))
                hi = min(lo + 1, H - 1)
                f = src - lo
                out[y, xx] = img[lo, xx] * (1 - f) + img[hi, xx] * f
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _skewed_line(tan_theta, H=32, W=200, seed=0):
    """A horizontal ink band, then sheared by +tan_theta (so the deskew
    must estimate -tan_theta... i.e. recover and undo it)."""
    rng = np.random.default_rng(seed)
    img = np.full((H, W), 255, np.uint8)
    img[12:20, 8:-8] = rng.integers(0, 60, (8, W - 16)).astype(np.uint8)
    return _shear_np(img, tan_theta)


class TestDeskew:
    def test_estimator_recovers_known_skew(self):
        for deg in (-3.0, -1.5, 0.0, 2.0, 4.0):
            t = math.tan(math.radians(deg))
            img = _skewed_line(t)
            est = np.asarray(estimate_skew_tan(
                jnp.asarray(img[None]), jnp.asarray([img.shape[1]])))[0]
            # undoing the band's shear means estimating ~ -t... the
            # estimator returns the angle whose SHEAR maximizes profile
            # variance, which re-compacts the band: est ≈ -t
            assert est == pytest.approx(-t, abs=math.tan(math.radians(0.8)))

    def test_shear_matches_numpy_oracle(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (32, 64)).astype(np.uint8)
        t = math.tan(math.radians(2.5))
        dev = np.asarray(shear_deskew(
            jnp.asarray(img[None]), jnp.asarray([64]),
            jnp.asarray([t], jnp.float32)))[0]
        ref = _shear_np(img, t)
        np.testing.assert_allclose(dev.astype(int), ref.astype(int), atol=1)

    def test_zero_skew_is_identity(self):
        img = _skewed_line(0.0)
        out, tan_theta = device_deskew(
            jnp.asarray(img[None]), jnp.asarray([img.shape[1]]))
        assert float(tan_theta[0]) == 0.0
        np.testing.assert_array_equal(np.asarray(out)[0], img)

    def test_deskew_restores_profile_compactness(self):
        t = math.tan(math.radians(3.5))
        img = _skewed_line(t)
        out, _ = device_deskew(
            jnp.asarray(img[None]), jnp.asarray([img.shape[1]]))
        out = np.asarray(out)[0]
        ink = 255.0 - img.astype(np.float32)
        ink_out = 255.0 - out.astype(np.float32)
        # the deskewed band concentrates into fewer rows: higher variance
        assert ink_out.sum(axis=1).var() > 1.5 * ink.sum(axis=1).var()
