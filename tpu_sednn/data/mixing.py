"""Noise mixing and synthetic corpus generation.

The reference builds its multi-condition set offline (TIMIT clean x 104-115
noise types x 7 SNRs, README.md:13-24).  Here mixing is a one-liner that can
run on device; the synthetic generators produce TIMIT-shaped material for
tests and benchmarks without shipping corpora.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def mix_at_snr(clean: np.ndarray, noise: np.ndarray, snr_db: float,
               rng: np.random.Generator | None = None) -> np.ndarray:
    """clean + scaled noise at the given global-RMS SNR.

    noise is tiled/cropped (with a random offset when rng is given) to match
    the clean length.
    """
    clean = np.asarray(clean, np.float32)
    noise = np.asarray(noise, np.float32)
    n = len(clean)
    if len(noise) < n:
        noise = np.tile(noise, n // len(noise) + 1)
    off = int(rng.integers(0, len(noise) - n + 1)) if rng is not None and len(noise) > n else 0
    noise = noise[off : off + n]
    p_c = float(np.mean(clean**2)) + 1e-12
    p_n = float(np.mean(noise**2)) + 1e-12
    scale = np.sqrt(p_c / (p_n * 10.0 ** (snr_db / 10.0)))
    return (clean + scale * noise).astype(np.float32)


def synth_speech(rng: np.random.Generator, n_samples: int, sr: int = 8000) -> np.ndarray:
    """Speech-like synthetic signal: broadband harmonic source (up to ~0.45*sr)
    with drifting pitch, moving formant resonances, and noise-burst
    "consonants" — enough spectral structure that the noisy->clean LPS mapping
    is learnable across the whole band."""
    t = np.arange(n_samples) / sr
    f0 = 110.0 + 40.0 * np.sin(2 * np.pi * 0.7 * t + rng.uniform(0, 2 * np.pi))
    phase = 2 * np.pi * np.cumsum(f0) / sr
    sig = np.zeros(n_samples)
    n_harm = int(0.45 * sr / 150.0)  # cover most of the band
    # two moving formants impose a spectral envelope on the harmonics
    fmt1 = 500.0 + 300.0 * np.sin(2 * np.pi * rng.uniform(0.3, 1.0) * t)
    fmt2 = 1800.0 + 700.0 * np.sin(2 * np.pi * rng.uniform(0.2, 0.8) * t + 1.0)
    for h in range(1, n_harm + 1):
        fh = h * 130.0  # nominal harmonic frequency for envelope weighting
        res = (
            1.0 / (1.0 + ((fh - fmt1) / 300.0) ** 2)
            + 0.7 / (1.0 + ((fh - fmt2) / 400.0) ** 2)
            + 0.1
        )
        sig += (res / np.sqrt(h)) * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
    # syllabic amplitude envelope
    env = 0.35 + 0.65 * np.abs(np.sin(2 * np.pi * rng.uniform(1.5, 3.5) * t))
    sig = sig * env
    # unvoiced bursts: high-passed noise gated by a sparse envelope
    burst_env = np.clip(np.sin(2 * np.pi * rng.uniform(0.8, 1.6) * t + rng.uniform(0, 6)) - 0.8, 0, 1) * 5
    noise = rng.standard_normal(n_samples)
    noise = np.diff(noise, prepend=0.0)  # crude high-pass
    sig += 0.6 * burst_env * noise * sig.std()
    return (0.3 * sig / (np.abs(sig).max() + 1e-9)).astype(np.float32)


#: every synthetic noise family; NoiseX-92-flavored coverage of the stationary
#: / tonal / impulsive / band-limited axes the reference trains against
#: (README.md:13-24: "104-115 noise types")
NOISE_KINDS = ("white", "pink", "babble", "hum", "machinegun", "factory",
               "hfchannel")


def synth_noise(rng: np.random.Generator, n_samples: int, kind: str = "white") -> np.ndarray:
    t = np.arange(n_samples)
    if kind == "white":
        x = rng.standard_normal(n_samples)
    elif kind == "pink":
        # -3 dB/octave via FFT shaping
        spec = np.fft.rfft(rng.standard_normal(n_samples))
        f = np.maximum(np.fft.rfftfreq(n_samples), 1.0 / n_samples)
        x = np.fft.irfft(spec / np.sqrt(f), n_samples)
    elif kind == "babble":
        x = sum(synth_speech(rng, n_samples) for _ in range(6))
    elif kind == "hum":
        # tonal machinery: fundamental + harmonics + a little broadband bed
        f0 = rng.uniform(60.0, 220.0)
        x = sum((1.0 / h) * np.sin(2 * np.pi * f0 * h * t / 8000.0
                                   + rng.uniform(0, 2 * np.pi))
                for h in range(1, 9))
        x = x + 0.15 * rng.standard_normal(n_samples)
    elif kind == "machinegun":
        # impulsive bursts over near-silence (NoiseX machine-gun shape)
        x = 0.02 * rng.standard_normal(n_samples)
        period = int(rng.uniform(0.18, 0.5) * 8000)
        blen = int(0.03 * 8000)
        for st in range(int(rng.uniform(0, period)), n_samples - blen, period):
            x[st : st + blen] += rng.standard_normal(blen) * np.hanning(blen) * 4.0
    elif kind == "factory":
        # pink bed + random clanks + slow amplitude modulation
        x = synth_noise(rng, n_samples, "pink").astype(np.float64)
        for _ in range(max(1, n_samples // 6000)):
            st = int(rng.integers(0, max(1, n_samples - 400)))
            x[st : st + 400] += rng.standard_normal(400) * np.hanning(400) * 0.6
        x = x * (1.0 + 0.4 * np.sin(2 * np.pi * rng.uniform(0.3, 2.0) * t / 8000.0))
    elif kind == "hfchannel":
        # high-pass-weighted noise (hf radio channel flavor)
        spec = np.fft.rfft(rng.standard_normal(n_samples))
        f = np.fft.rfftfreq(n_samples)
        x = np.fft.irfft(spec * (0.1 + f / (f.max() + 1e-12)), n_samples)
    else:
        raise ValueError(f"unknown noise kind {kind}")
    return (0.1 * x / (np.abs(x).max() + 1e-9)).astype(np.float32)


def synth_corpus(
    seed: int,
    n_utts: int,
    sr: int = 8000,
    min_s: float = 1.0,
    max_s: float = 3.0,
    snrs: Tuple[float, ...] = (0.0, 5.0, 10.0),
    noise_kinds: Tuple[str, ...] = ("white", "pink"),
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """-> (clean_wavs, noisy_wavs): a tiny multi-condition training corpus."""
    rng = np.random.default_rng(seed)
    cleans, noisys = [], []
    for _ in range(n_utts):
        n = int(rng.uniform(min_s, max_s) * sr)
        c = synth_speech(rng, n, sr)
        nz = synth_noise(rng, n, str(rng.choice(noise_kinds)))
        snr = float(rng.choice(snrs))
        cleans.append(c)
        noisys.append(mix_at_snr(c, nz, snr, rng))
    return cleans, noisys
