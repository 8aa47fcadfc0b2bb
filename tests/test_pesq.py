"""Sanity properties of the P.862-style PESQ estimator."""

import numpy as np
import pytest

from tpu_sednn.data.mixing import mix_at_snr, synth_noise, synth_speech
from tpu_sednn.metrics import pesq

SR = 8000


@pytest.fixture(scope="module")
def clean():
    return synth_speech(np.random.default_rng(0), 4 * SR, SR)


def test_identity_is_max(clean):
    assert pesq(clean, clean, SR) == pytest.approx(4.5, abs=0.01)


def test_monotonic_in_snr(clean):
    rng = np.random.default_rng(1)
    noise = synth_noise(rng, 4 * SR, "white")
    scores = [pesq(clean, mix_at_snr(clean, noise, s, rng), SR) for s in (20, 10, 0)]
    assert scores[0] > scores[1] > scores[2]
    assert scores[0] > 2.5  # mild noise still intelligible
    assert scores[2] < 2.0  # heavy noise clearly degraded


def test_level_and_delay_robust(clean):
    # P.862 level-aligns, so pure gain must not change the score
    assert pesq(clean, 0.5 * clean, SR) == pytest.approx(4.5, abs=0.05)
    delayed = np.concatenate([np.zeros(640, np.float32), clean])[: len(clean)]
    assert pesq(clean, delayed, SR) > 3.8


def test_16k_input_resampled(clean):
    from scipy.signal import resample_poly
    c16 = resample_poly(clean, 2, 1).astype(np.float32)
    assert pesq(c16, c16, 16000) == pytest.approx(4.5, abs=0.05)
