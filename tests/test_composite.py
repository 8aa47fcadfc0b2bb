"""Composite quality measures (metrics/composite.py): identity, positivity,
and SNR monotonicity sanity."""

import numpy as np
import pytest

from tpu_sednn.data.mixing import mix_at_snr, synth_noise, synth_speech
from tpu_sednn.metrics.composite import composite, llr, wss

SR = 8000


@pytest.fixture(scope="module")
def speech():
    rng = np.random.default_rng(0)
    return synth_speech(rng, SR * 2, SR)


def _noisy(clean, snr_db, seed=1):
    rng = np.random.default_rng(seed)
    return mix_at_snr(clean, synth_noise(rng, len(clean), "white"), snr_db, rng)


def test_identity_is_best(speech):
    res = composite(speech, speech, SR)
    assert res["llr"] < 1e-6
    assert res["wss"] < 1e-6
    assert res["csig"] == 5.0  # clipped top of the MOS range at identity
    assert res["covl"] > 4.5


def test_base_measures_positive_and_monotone(speech):
    n0 = _noisy(speech, 0.0)
    n10 = _noisy(speech, 10.0)
    assert llr(speech, n0, SR) > llr(speech, n10, SR) > 0.0
    assert wss(speech, n0, SR) > wss(speech, n10, SR) > 0.0


def test_composites_rank_by_snr(speech):
    r0 = composite(speech, _noisy(speech, 0.0), SR)
    r10 = composite(speech, _noisy(speech, 10.0), SR)
    for k in ("csig", "cbak", "covl"):
        assert 1.0 <= r0[k] <= 5.0 and 1.0 <= r10[k] <= 5.0
        assert r10[k] > r0[k], (k, r0[k], r10[k])
