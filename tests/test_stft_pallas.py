"""Pallas STFT kernel vs the XLA/dsp reference (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_sednn.dsp import StftConfig, stft_logpower
from tpu_sednn.ops.stft_pallas import stft_lps_pallas


def _sig(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 8000.0
    return (0.4 * np.sin(2 * np.pi * 523 * t) + 0.05 * rng.standard_normal(n)).astype(np.float32)


@pytest.mark.parametrize("n", [4096, 40000, 16512])
def test_stft_pallas_matches_reference_8k(n):
    cfg = StftConfig.for_rate(8000)  # hop 128, win 256
    x = jnp.asarray(_sig(n))
    ref = np.asarray(stft_logpower(x, cfg))
    got = np.asarray(stft_lps_pallas(x, cfg, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_stft_pallas_matches_reference_16k():
    cfg = StftConfig.for_rate(16000)  # hop 256, win 512
    x = jnp.asarray(_sig(50000, seed=3))
    ref = np.asarray(stft_logpower(x, cfg))
    got = np.asarray(stft_lps_pallas(x, cfg, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_stft_pallas_fallback_geometry():
    cfg = StftConfig(8000, 200, 80, 256)  # not 2*hop / not lane-aligned
    x = jnp.asarray(_sig(8000))
    ref = np.asarray(stft_logpower(x, cfg))
    got = np.asarray(stft_lps_pallas(x, cfg, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
