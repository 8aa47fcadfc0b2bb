"""STFT / log-power-spectrum / inverse-STFT, TPU-first.

Design notes
------------
* The forward transform is a real DFT expressed as two matmuls
  (frames @ cos_mtx, frames @ sin_mtx).  For the canonical 256-point FFT this
  is a (N, 256) x (256, 129) contraction — ideal MXU shape — and XLA fuses the
  windowing and log-power elementwise chain around it.  An O(N log N) FFT
  would be *slower* on TPU at these sizes and would not fuse.
* The inverse uses the conjugate-transpose DFT matmul plus overlap-add with
  correct window-sum normalization.
* Enhancement decode keeps the noisy phase (README.md:39-48 of the reference:
  decode = forward pass + overlap-add ISTFT with noisy phase).  We never
  compute atan2: the enhanced spectrum is built by scaling the noisy (re, im)
  by (enhanced_mag / noisy_mag), which is cheaper and exactly equivalent.

Canonical configurations:
* 8 kHz, 32 ms window (256), 16 ms shift (128), n_fft 256 -> 129 bins
  (fea_dim=129 in the reference recipe, finetune_...NAT.pl:14-19; frame shift
  16 ms per how_to_get_pfile.txt:54 "-period 16.0").
* 16 kHz, 32 ms window (512), 16 ms shift (256), n_fft 512 -> 257 bins
  (the 257-bin CPU-runnable config in BASELINE.json).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

LPS_FLOOR = 1e-12  # power floor before log


@dataclass(frozen=True)
class StftConfig:
    sample_rate: int = 8000
    win_len: int = 256
    hop: int = 128
    n_fft: int = 256
    window: str = "hamming"

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def frame_shift_s(self) -> float:
        return self.hop / self.sample_rate

    @classmethod
    def for_rate(cls, sample_rate: int) -> "StftConfig":
        if sample_rate == 8000:
            return cls(8000, 256, 128, 256)
        if sample_rate == 16000:
            return cls(16000, 512, 256, 512)
        # generic: 32 ms window, 16 ms shift, next pow2 n_fft
        win = int(round(0.032 * sample_rate))
        n_fft = 1 << (win - 1).bit_length()
        return cls(sample_rate, win, int(round(0.016 * sample_rate)), n_fft)


def _window_np(cfg: StftConfig) -> np.ndarray:
    n = cfg.win_len
    if cfg.window == "hamming":
        # periodic hamming (better OLA properties than symmetric)
        return (0.54 - 0.46 * np.cos(2 * np.pi * np.arange(n) / n)).astype(np.float32)
    if cfg.window == "hann":
        return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)).astype(np.float32)
    if cfg.window == "rect":
        return np.ones(n, dtype=np.float32)
    raise ValueError(f"unknown window {cfg.window}")


@functools.lru_cache(maxsize=8)
def _rdft_matrices(win_len: int, n_fft: int, window: str) -> tuple[np.ndarray, np.ndarray]:
    """(cos_mtx, sin_mtx) of shape (win_len, n_bins), window folded in.

    frames_raw @ cos_mtx == Re(rfft(frames_raw * window, n_fft))
    frames_raw @ sin_mtx == Im(rfft(frames_raw * window, n_fft))
    """
    cfg = StftConfig(0, win_len, 0, n_fft, window)
    w = _window_np(cfg).astype(np.float64)
    n_bins = n_fft // 2 + 1
    t = np.arange(win_len)[:, None]  # zero-padding to n_fft only adds zero rows
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * t * k / n_fft
    cos_m = (np.cos(ang) * w[:, None]).astype(np.float32)
    sin_m = (-np.sin(ang) * w[:, None]).astype(np.float32)
    return cos_m, sin_m


@functools.lru_cache(maxsize=8)
def _irdft_matrices(win_len: int, n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """(icos_mtx, isin_mtx) of shape (n_bins, win_len): inverse real DFT.

    frames = re @ icos_mtx + im @ isin_mtx  reproduces irfft(re + i*im)[:win_len].
    """
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[:, None]
    t = np.arange(win_len)[None, :]
    ang = 2.0 * np.pi * k * t / n_fft
    # irfft coefficient weights: 1/n_fft for DC and Nyquist, 2/n_fft otherwise
    scale = np.full((n_bins, 1), 2.0 / n_fft)
    scale[0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        scale[-1] = 1.0 / n_fft
    icos = (np.cos(ang) * scale).astype(np.float32)
    isin = (-np.sin(ang) * scale).astype(np.float32)
    return icos, isin


def frame_signal(x: jnp.ndarray, cfg: StftConfig) -> jnp.ndarray:
    """(n_samples,) -> (n_frames, win_len), hop-strided, truncating the tail.

    When hop divides win_len the overlapping frames are assembled from
    hop-sized segments with static slices + concat — no gather op, which on
    TPU is dramatically cheaper than an (n_frames, win_len) index gather.
    """
    n_frames = 1 + (x.shape[0] - cfg.win_len) // cfg.hop
    if cfg.win_len % cfg.hop == 0:
        r = cfg.win_len // cfg.hop
        segs = x[: (n_frames + r - 1) * cfg.hop].reshape(n_frames + r - 1, cfg.hop)
        return jnp.concatenate([segs[j : j + n_frames] for j in range(r)], axis=1)
    idx = jnp.arange(n_frames)[:, None] * cfg.hop + jnp.arange(cfg.win_len)[None, :]
    return jnp.take(x, idx, axis=0)


def stft_real_imag(x: jnp.ndarray, cfg: StftConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Signal -> (re, im) each (n_frames, n_bins). Windowing folded into the matmul."""
    frames = frame_signal(x, cfg)
    cos_m, sin_m = _rdft_matrices(cfg.win_len, cfg.n_fft, cfg.window)
    re = frames @ jnp.asarray(cos_m)
    im = frames @ jnp.asarray(sin_m)
    return re, im


def stft_logpower(x: jnp.ndarray, cfg: StftConfig) -> jnp.ndarray:
    """Signal -> log-power spectrum (n_frames, n_bins); LPS = ln(|X|^2)."""
    re, im = stft_real_imag(x, cfg)
    return jnp.log(jnp.maximum(re * re + im * im, LPS_FLOOR))


def istft_overlap_add(
    re: jnp.ndarray, im: jnp.ndarray, cfg: StftConfig, n_samples: int | None = None
) -> jnp.ndarray:
    """(re, im) (n_frames, n_bins) -> signal via windowed overlap-add.

    Uses the analysis window also as synthesis window and divides by the
    window-square overlap sum (standard weighted OLA; exact reconstruction up
    to edge frames for any window/hop with nonzero overlap sum).
    """
    icos, isin = _irdft_matrices(cfg.win_len, cfg.n_fft)
    frames = re @ jnp.asarray(icos) + im @ jnp.asarray(isin)  # (n_frames, win_len)
    w_np = _window_np(cfg)
    frames = frames * jnp.asarray(w_np)[None, :]

    n_frames = frames.shape[0]
    total = (n_frames - 1) * cfg.hop + cfg.win_len
    # window-square overlap sum: shape-static, so build it on the host once
    # per trace and let XLA fold the division into a constant multiply
    wsum = np.zeros(total, np.float32)
    ww = (w_np * w_np).astype(np.float32)
    for f in range(n_frames):
        wsum[f * cfg.hop : f * cfg.hop + cfg.win_len] += ww
    inv_wsum = jnp.asarray(1.0 / np.maximum(wsum, 1e-8))

    if cfg.win_len % cfg.hop == 0:
        # hop divides the window (every canonical config): overlap-add is a
        # sum of r zero-padded hop-strips — pure pads + adds, no scatter.
        # TPU scatter-add serializes; this path is ~50x faster at decode batch
        # sizes and bit-equivalent (tests/test_dsp.py round-trip oracle).
        r = cfg.win_len // cfg.hop
        pieces = frames.reshape(n_frames, r, cfg.hop)
        acc = jnp.zeros((n_frames + r - 1, cfg.hop), frames.dtype)
        for j in range(r):
            acc = acc + jnp.pad(pieces[:, j, :], ((j, r - 1 - j), (0, 0)))
        sig = acc.reshape(-1)
    else:
        idx = (jnp.arange(n_frames)[:, None] * cfg.hop + jnp.arange(cfg.win_len)[None, :]).ravel()
        sig = jnp.zeros(total, frames.dtype).at[idx].add(frames.ravel())
    sig = sig * inv_wsum
    if n_samples is not None:
        if n_samples > total:  # framing truncated the tail; zero-pad back
            sig = jnp.concatenate([sig, jnp.zeros(n_samples - total, sig.dtype)])
        else:
            sig = sig[:n_samples]
    return sig


def reconstruct_from_lps(
    enhanced_lps: jnp.ndarray,
    noisy_re: jnp.ndarray,
    noisy_im: jnp.ndarray,
    cfg: StftConfig,
    n_samples: int | None = None,
) -> jnp.ndarray:
    """Enhanced LPS + noisy phase -> waveform (the reference decode semantics).

    The noisy (re, im) pair carries the phase; we rescale it to the enhanced
    magnitude: X_enh = X_noisy * (mag_enh / mag_noisy).
    """
    noisy_mag = jnp.sqrt(jnp.maximum(noisy_re**2 + noisy_im**2, LPS_FLOOR))
    gain = jnp.exp(0.5 * enhanced_lps) / noisy_mag
    return istft_overlap_add(noisy_re * gain, noisy_im * gain, cfg, n_samples)
