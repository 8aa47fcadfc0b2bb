"""Mask-head training: IRM targets + sigmoid head + mask decode."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_sednn.data import (
    build_training_arrays,
    ibm_from_clean_noise,
    ibm_from_lps,
    irm_from_clean_noise,
    irm_from_lps,
    mix_at_snr,
    synth_noise,
    synth_speech,
)
from tpu_sednn.data.mixing import synth_corpus
from tpu_sednn.dsp import StftConfig, stft_logpower
from tpu_sednn.enhance import EnhanceConfig, enhance_waveform
from tpu_sednn.io import compute_norm
from tpu_sednn.metrics import snr
from tpu_sednn.model import ModelConfig, init_params
from tpu_sednn.train import init_train_state
from tpu_sednn.train.loop import train_epochs_arrays
from tpu_sednn.train.step import OptConfig
from tpu_sednn.utils.logging import Logger

SR = 8000
CFG = StftConfig.for_rate(SR)


def test_mask_definitions():
    s = np.array([[4.0, 1.0, 0.0]])
    n = np.array([[1.0, 4.0, 1.0]])
    irm = irm_from_clean_noise(s, n)
    np.testing.assert_allclose(irm, np.sqrt([[4 / 5, 1 / 5, 0.0]]), atol=1e-6)
    ibm = ibm_from_clean_noise(s, n, lc_db=5.0)
    np.testing.assert_array_equal(ibm, [[1.0, 0.0, 0.0]])  # 6dB, -6dB, -inf
    # from-lps variants agree where mixture ~ clean+noise
    clean_lps = np.log(s + 1e-12)
    noisy_lps = np.log(s + n + 1e-12)
    np.testing.assert_allclose(irm_from_lps(clean_lps, noisy_lps), irm, atol=1e-5)
    np.testing.assert_array_equal(ibm_from_lps(clean_lps, noisy_lps, 5.0), ibm)


def test_irm_training_and_mask_decode():
    C, TO = 3, 1
    # style="simple": toy-scale learnability of the mask head, not realism
    cleans, noisys = synth_corpus(0, 20, sr=SR, min_s=1.0, max_s=2.0,
                                  snrs=(0.0, 5.0), noise_kinds=("white",),
                                  style="simple")
    clps = [np.asarray(stft_logpower(jnp.asarray(c), CFG)) for c in cleans]
    nlps = [np.asarray(stft_logpower(jnp.asarray(n), CFG)) for n in noisys]
    irms = [irm_from_lps(c, n) for c, n in zip(clps, nlps)]
    mean, istd = compute_norm(np.concatenate(nlps))
    x, t = build_training_arrays(nlps, irms, C, TO, nat=True, mean=mean, inv_std=istd)
    assert t.min() >= 0.0 and t.max() <= 1.0

    d = CFG.n_bins
    mcfg = ModelConfig(layersizes=(d * C + d, 256, 256, d), output="sigmoid")
    st = init_train_state(init_params(jax.random.key(0), mcfg, "glorot"))
    sched = lambda e: OptConfig(lrate=3.0, momentum=min(0.5 + 0.04 * e, 0.9),
                                weightcost=0.0, bunchsize=128)
    ncv = len(x) // 10
    st, res = train_epochs_arrays(st, mcfg, sched, x[:-ncv], t[:-ncv], x[-ncv:], t[-ncv:],
                                  n_epochs=16, seed=1, traincache=len(x),
                                  logger=Logger(stream=None))
    assert res[-1].cv_mse < 0.7 * res[0].cv_mse, (res[0].cv_mse, res[-1].cv_mse)

    rng = np.random.default_rng(9)
    clean = synth_speech(rng, 3 * SR, SR, style="simple")
    noisy = mix_at_snr(clean, synth_noise(rng, 3 * SR, "white"), 2.0, rng)
    ecfg = EnhanceConfig(stft=CFG, fea_context=C, targ_offset=TO, nat=True,
                         head="irm", mask_floor=0.05)
    enh = enhance_waveform(st.params, mcfg, ecfg, noisy, mean, istd)
    assert np.isfinite(enh).all()
    sl = slice(CFG.win_len, len(clean) - CFG.win_len)
    assert snr(clean[sl], enh[sl]) > snr(clean[sl], noisy[sl]) + 1.0


def test_psm_definition():
    """PSM = Re(S Y*)/|Y|^2 clipped to [0,1]: 1 at identity, 0 in anti-phase,
    between IRM-like values for partial mixes."""
    from tpu_sednn.data.masks import psm_from_stft
    from tpu_sednn.dsp.stft import stft_real_imag

    rng = np.random.default_rng(0)
    s = synth_speech(rng, SR, SR, style="simple")
    sre, sim = (np.asarray(a) for a in stft_real_imag(jnp.asarray(s), CFG))
    # identity: mask 1 wherever the bin has energy
    m_id = psm_from_stft(sre, sim, sre, sim)
    live = (sre**2 + sim**2) > 1e-8
    assert np.allclose(m_id[live], 1.0, atol=1e-5)
    # anti-phase: cos term = -1 -> clipped to 0
    m_anti = psm_from_stft(sre, sim, -sre, -sim)
    assert np.allclose(m_anti[live], 0.0)
    # additive noise: strictly inside (0, 1) on live bins, finite everywhere
    n = synth_noise(rng, SR, "white") * (np.sqrt((s**2).mean()) + 1e-9)
    yre, yim = (np.asarray(a) for a in stft_real_imag(jnp.asarray(s + n), CFG))
    m = psm_from_stft(sre, sim, yre, yim)
    assert np.isfinite(m).all() and 0.0 <= m.min() and m.max() <= 1.0
    assert 0.05 < m.mean() < 0.95


def test_psm_training_and_mask_decode():
    """head="psm" end to end through the recipe trainer: targets learnable,
    decode identical plumbing to IRM, output beats noisy SNR."""
    from tpu_sednn.data.masks import psm_from_stft
    from tpu_sednn.dsp.stft import stft_real_imag

    C, TO = 3, 1
    cleans, noisys = synth_corpus(0, 20, sr=SR, min_s=1.0, max_s=2.0,
                                  snrs=(0.0, 5.0), noise_kinds=("white",),
                                  style="simple")
    nlps = [np.asarray(stft_logpower(jnp.asarray(n), CFG)) for n in noisys]

    def _psm(c, n):
        cre, cim = stft_real_imag(jnp.asarray(c), CFG)
        yre, yim = stft_real_imag(jnp.asarray(n), CFG)
        return psm_from_stft(np.asarray(cre), np.asarray(cim),
                             np.asarray(yre), np.asarray(yim))

    psms = [_psm(c, n) for c, n in zip(cleans, noisys)]
    mean, istd = compute_norm(np.concatenate(nlps))
    x, t = build_training_arrays(nlps, psms, C, TO, nat=True, mean=mean, inv_std=istd)
    assert t.min() >= 0.0 and t.max() <= 1.0

    d = CFG.n_bins
    mcfg = ModelConfig(layersizes=(d * C + d, 256, 256, d), output="sigmoid")
    st = init_train_state(init_params(jax.random.key(0), mcfg, "glorot"))
    sched = lambda e: OptConfig(lrate=3.0, momentum=min(0.5 + 0.04 * e, 0.9),
                                weightcost=0.0, bunchsize=128)
    ncv = len(x) // 10
    st, res = train_epochs_arrays(st, mcfg, sched, x[:-ncv], t[:-ncv], x[-ncv:], t[-ncv:],
                                  n_epochs=16, seed=1, traincache=len(x),
                                  logger=Logger(stream=None))
    # phase-dependent targets carry irreducible noise IRM lacks; the bar is
    # "clearly learning" (30%+ CV drop), the real gate is the SNR gain below
    assert res[-1].cv_mse < 0.75 * res[0].cv_mse, (res[0].cv_mse, res[-1].cv_mse)

    rng = np.random.default_rng(9)
    clean = synth_speech(rng, 3 * SR, SR, style="simple")
    noisy = mix_at_snr(clean, synth_noise(rng, 3 * SR, "white"), 2.0, rng)
    ecfg = EnhanceConfig(stft=CFG, fea_context=C, targ_offset=TO, nat=True,
                         head="psm", mask_floor=0.05)
    enh = enhance_waveform(st.params, mcfg, ecfg, noisy, mean, istd)
    assert np.isfinite(enh).all()
    sl = slice(CFG.win_len, len(clean) - CFG.win_len)
    assert snr(clean[sl], enh[sl]) > snr(clean[sl], noisy[sl]) + 1.0


def test_all_noise_kinds_generate():
    from tpu_sednn.data.mixing import NOISE_KINDS, mix_at_snr, synth_noise, synth_speech

    rng = np.random.default_rng(0)
    c = synth_speech(rng, 16000, 8000)
    for kind in NOISE_KINDS:
        n = synth_noise(rng, 16000, kind)
        assert n.shape == (16000,) and np.isfinite(n).all(), kind
        assert 0 < np.abs(n).max() <= 0.1 + 1e-6, kind
        nz = mix_at_snr(c, n, 5.0, rng)
        # mixed at the requested global SNR (within fp tolerance)
        p_c = np.mean(c**2)
        p_n = np.mean((nz - c) ** 2)
        assert abs(10 * np.log10(p_c / p_n) - 5.0) < 0.1, kind
