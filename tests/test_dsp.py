"""STFT/ISTFT correctness vs numpy FFT reference."""

import numpy as np
import jax.numpy as jnp

from tpu_sednn.dsp import (
    StftConfig,
    frame_signal,
    istft_overlap_add,
    reconstruct_from_lps,
    stft_logpower,
    stft_real_imag,
)
from tpu_sednn.dsp.stft import _window_np


def _sig(n=8192, sr=8000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    return (
        0.4 * np.sin(2 * np.pi * 523 * t)
        + 0.2 * np.sin(2 * np.pi * 1333 * t + 0.3)
        + 0.05 * rng.standard_normal(n)
    ).astype(np.float32)


def test_framing():
    cfg = StftConfig()
    x = np.arange(1000, dtype=np.float32)
    f = np.asarray(frame_signal(jnp.asarray(x), cfg))
    n_frames = 1 + (1000 - 256) // 128
    assert f.shape == (n_frames, 256)
    np.testing.assert_array_equal(f[0], x[:256])
    np.testing.assert_array_equal(f[3], x[3 * 128 : 3 * 128 + 256])


def test_stft_matches_numpy_rfft():
    cfg = StftConfig()
    x = _sig()
    re, im = stft_real_imag(jnp.asarray(x), cfg)
    w = _window_np(cfg)
    n_frames = 1 + (len(x) - cfg.win_len) // cfg.hop
    for i in (0, 7, n_frames - 1):
        seg = x[i * cfg.hop : i * cfg.hop + cfg.win_len] * w
        ref = np.fft.rfft(seg, cfg.n_fft)
        np.testing.assert_allclose(np.asarray(re)[i], ref.real, atol=2e-3)
        np.testing.assert_allclose(np.asarray(im)[i], ref.imag, atol=2e-3)


def test_stft_16k_config():
    cfg = StftConfig.for_rate(16000)
    assert (cfg.win_len, cfg.hop, cfg.n_fft, cfg.n_bins) == (512, 256, 512, 257)
    lps = stft_logpower(jnp.asarray(_sig(sr=16000)), cfg)
    assert lps.shape[1] == 257
    assert np.isfinite(np.asarray(lps)).all()


def test_istft_reconstruction():
    """Analysis -> synthesis must reconstruct the interior to high accuracy."""
    cfg = StftConfig()
    x = _sig()
    re, im = stft_real_imag(jnp.asarray(x), cfg)
    y = np.asarray(istft_overlap_add(re, im, cfg, n_samples=len(x)))
    # ignore first/last window where overlap-add is edge-deficient
    sl = slice(cfg.win_len, len(x) - cfg.win_len)
    err = np.abs(y[sl] - x[sl]).max()
    assert err < 1e-4, err


def test_reconstruct_from_lps_identity():
    """Feeding the noisy LPS back with noisy phase must reproduce the signal."""
    cfg = StftConfig()
    x = _sig(seed=5)
    re, im = stft_real_imag(jnp.asarray(x), cfg)
    lps = jnp.log(jnp.maximum(re**2 + im**2, 1e-12))
    y = np.asarray(reconstruct_from_lps(lps, re, im, cfg, n_samples=len(x)))
    sl = slice(cfg.win_len, len(x) - cfg.win_len)
    assert np.abs(y[sl] - x[sl]).max() < 1e-3


def test_lps_floor():
    cfg = StftConfig()
    lps = stft_logpower(jnp.zeros(4096), cfg)
    assert np.isfinite(np.asarray(lps)).all()
