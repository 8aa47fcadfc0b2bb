"""Minimum end-to-end slice (SURVEY.md §7 step 2): synthesize a noisy corpus,
train the DNN on LPS mapping, enhance an unseen noisy clip, verify quality
metrics move the right way, and round-trip the model through .wts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_sednn.data import build_training_arrays, mix_at_snr, synth_noise, synth_speech
from tpu_sednn.data.mixing import synth_corpus
from tpu_sednn.dsp import StftConfig, stft_logpower
from tpu_sednn.enhance import EnhanceConfig, enhance_waveform
from tpu_sednn.io import compute_norm, load_wts, save_wts
from tpu_sednn.io.wts import load_wts as _load
from tpu_sednn.metrics import lsd, seg_snr, si_sdr, snr, stoi
from tpu_sednn.model import ModelConfig, init_params, params_from_wts, params_to_wts
from tpu_sednn.train import init_train_state
from tpu_sednn.train.loop import train_epochs_arrays
from tpu_sednn.train.step import OptConfig

SR = 8000
CFG_STFT = StftConfig.for_rate(SR)
CONTEXT = 3
TARG_OFFSET = 1


def _corpus_lps(n_utts, seed):
    # style="simple": the single-template generator — these tests assert the
    # TRAINING MACHINERY converges at toy scale, not corpus realism (the
    # "rich" generator needs the full-size recipe to learn well)
    cleans, noisys = synth_corpus(seed, n_utts, sr=SR, min_s=1.0, max_s=2.0,
                                  snrs=(0.0, 5.0), noise_kinds=("white",),
                                  style="simple")
    clean_lps = [np.asarray(stft_logpower(jnp.asarray(c), CFG_STFT)) for c in cleans]
    noisy_lps = [np.asarray(stft_logpower(jnp.asarray(n), CFG_STFT)) for n in noisys]
    return cleans, noisys, clean_lps, noisy_lps


@pytest.fixture(scope="module")
def trained():
    _, _, clean_lps, noisy_lps = _corpus_lps(24, seed=0)
    mean, inv_std = compute_norm(np.concatenate(noisy_lps))
    t_mean, t_inv_std = compute_norm(np.concatenate(clean_lps))
    x, t = build_training_arrays(noisy_lps, clean_lps, CONTEXT, TARG_OFFSET,
                                 nat=True, mean=mean, inv_std=inv_std,
                                 targ_mean=t_mean, targ_inv_std=t_inv_std)
    n_cv = len(x) // 10
    x_cv, t_cv = x[-n_cv:], t[-n_cv:]
    x, t = x[:-n_cv], t[:-n_cv]

    d = CFG_STFT.n_bins
    sizes = (d * CONTEXT + d, 256, 256, d)
    mcfg = ModelConfig(layersizes=sizes, hidden="relu", output="linear")
    params = init_params(jax.random.key(0), mcfg, scheme="glorot")
    state = init_train_state(params)

    def sched(epoch):
        return OptConfig(lrate=1.0, momentum=min(0.5 + 0.04 * epoch, 0.9),
                         weightcost=0.0, bunchsize=128)

    state, results = train_epochs_arrays(
        state, mcfg, sched, x, t, x_cv, t_cv, n_epochs=12, seed=1, traincache=len(x)
    )
    return state, mcfg, results, (mean, inv_std, t_mean, t_inv_std)


def test_cv_mse_decreases(trained):
    _, _, results, _ = trained
    first, last = results[0].cv_mse, results[-1].cv_mse
    assert last < 0.7 * first, (first, last)


def test_enhancement_improves_quality(trained):
    state, mcfg, _, (mean, inv_std, t_mean, t_inv_std) = trained
    rng = np.random.default_rng(77)
    clean = synth_speech(rng, 3 * SR, SR, style="simple")
    noisy = mix_at_snr(clean, synth_noise(rng, 3 * SR, "white"), 2.5, rng)
    enh_cfg = EnhanceConfig(stft=CFG_STFT, fea_context=CONTEXT, targ_offset=TARG_OFFSET, nat=True)
    enh = enhance_waveform(state.params, mcfg, enh_cfg, noisy, mean, inv_std,
                           target_norm=(t_mean, t_inv_std))
    assert enh.shape == noisy.shape and np.isfinite(enh).all()

    sl = slice(CFG_STFT.win_len, len(clean) - CFG_STFT.win_len)
    snr_noisy = snr(clean[sl], noisy[sl])
    snr_enh = snr(clean[sl], enh[sl])
    assert snr_enh > snr_noisy + 1.0, (snr_noisy, snr_enh)

    # LSD to the clean spectrum must also improve
    cl = np.asarray(stft_logpower(jnp.asarray(clean), CFG_STFT))
    nl = np.asarray(stft_logpower(jnp.asarray(noisy), CFG_STFT))
    el = np.asarray(stft_logpower(jnp.asarray(enh), CFG_STFT))
    assert lsd(cl, el) < lsd(cl, nl), (lsd(cl, nl), lsd(cl, el))


def test_wts_roundtrip_preserves_decode(trained, tmp_path):
    state, mcfg, _, (mean, inv_std, _tm, _ts) = trained
    ws, bs = params_to_wts(state.params)
    p = str(tmp_path / "m.wts")
    save_wts(p, ws, bs)
    params2 = params_from_wts(*_load(p, layersizes=list(mcfg.layersizes)))

    rng = np.random.default_rng(5)
    noisy = mix_at_snr(synth_speech(rng, 2 * SR, SR), synth_noise(rng, 2 * SR, "white"), 5, rng)
    enh_cfg = EnhanceConfig(stft=CFG_STFT, fea_context=CONTEXT, targ_offset=TARG_OFFSET, nat=True)
    a = enhance_waveform(state.params, mcfg, enh_cfg, noisy, mean, inv_std)
    b = enhance_waveform(params2, mcfg, enh_cfg, noisy, mean, inv_std)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_metrics_sanity():
    rng = np.random.default_rng(1)
    clean = synth_speech(rng, 4 * SR, SR)
    noisy = mix_at_snr(clean, synth_noise(rng, 4 * SR, "white"), 0.0, rng)
    # identity is perfect
    assert snr(clean, clean) > 100
    assert si_sdr(clean, clean) > 100
    s_clean = stoi(clean, clean, SR)
    s_noisy = stoi(clean, noisy, SR)
    assert s_clean > 0.99
    assert s_noisy < s_clean
    assert seg_snr(clean, noisy, SR) < seg_snr(clean, clean, SR)
