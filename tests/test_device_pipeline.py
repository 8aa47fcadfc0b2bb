"""On-device wav->samples pipeline vs the host array builder."""

import numpy as np
import jax.numpy as jnp

from tpu_sednn.data import build_training_arrays
from tpu_sednn.data.device_pipeline import streaming_sample_batches, wav_pair_to_samples
from tpu_sednn.data.mixing import mix_at_snr, synth_noise, synth_speech
from tpu_sednn.dsp import StftConfig, stft_logpower
from tpu_sednn.io import compute_norm

SR = 8000
CFG = StftConfig.for_rate(SR)


def _pairs(n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        ln = int(rng.uniform(1.0, 2.5) * SR)
        c = synth_speech(rng, ln, SR)
        nz = mix_at_snr(c, synth_noise(rng, ln, "white"), 5.0, rng)
        out.append((nz, c))
    return out


def test_device_matches_host_builder():
    pairs = _pairs(4)
    nlps = [np.asarray(stft_logpower(jnp.asarray(n), CFG)) for n, _ in pairs]
    clps = [np.asarray(stft_logpower(jnp.asarray(c), CFG)) for _, c in pairs]
    mean, istd = compute_norm(np.concatenate(nlps))
    x_host, t_host = build_training_arrays(nlps, clps, 5, 2, nat=True,
                                           mean=mean, inv_std=istd)

    xs, ts = [], []
    for x, t in streaming_sample_batches(pairs, mean, istd, CFG, 5, 2, nat=True):
        xs.append(np.asarray(x))
        ts.append(np.asarray(t))
    x_dev, t_dev = np.concatenate(xs), np.concatenate(ts)
    assert x_dev.shape == x_host.shape
    np.testing.assert_allclose(x_dev, x_host, rtol=1e-4, atol=1e-4)
    # targets are raw LPS: near the power floor (~1e-8) the log amplifies
    # benign fp-order differences between the two STFT paths by ~1e4, so
    # tolerate 0.02 nats there (=2% power) while staying tight elsewhere
    np.testing.assert_allclose(t_dev, t_host, rtol=1e-4, atol=2e-2)


def test_single_pair_jit():
    (nz, c) = _pairs(1, seed=3)[0]
    nlps = np.asarray(stft_logpower(jnp.asarray(nz), CFG))
    mean, istd = compute_norm(nlps)
    x, t = wav_pair_to_samples(jnp.asarray(nz), jnp.asarray(c),
                               jnp.asarray(mean), jnp.asarray(istd), CFG, 5, 2)
    n_frames = 1 + (len(nz) - CFG.win_len) // CFG.hop
    assert x.shape == (n_frames - 4, 5 * CFG.n_bins + CFG.n_bins)
    assert t.shape == (n_frames - 4, CFG.n_bins)
    assert np.isfinite(np.asarray(x)).all()
