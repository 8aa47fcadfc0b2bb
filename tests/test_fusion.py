"""Head-fusion decode (enhance/fusion.py + recipes/fusion_sweep.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_sednn.dsp import StftConfig
from tpu_sednn.dsp.stft import stft_real_imag
from tpu_sednn.enhance.decode import LPS_FLOOR, EnhanceConfig, enhance_lps, enhance_waveform
from tpu_sednn.enhance.fusion import enhance_lps_multi, enhance_waveform_fused
from tpu_sednn.model import ModelConfig, init_params

SR = 8000
STFT = StftConfig.for_rate(SR)
D = STFT.n_bins


def _model(seed: int, head: str):
    ctx = 3
    sizes = (ctx * D, 64, D)
    mcfg = ModelConfig(layersizes=sizes,
                       output="sigmoid" if head != "lps" else "linear")
    ecfg = EnhanceConfig(stft=STFT, fea_context=ctx, targ_offset=1, nat=False,
                         head=head, mask_floor=0.05 if head != "lps" else 0.0)
    params = init_params(jax.random.key(seed), mcfg, scheme="glorot")
    mean = np.zeros((D,), np.float32)
    istd = np.ones((D,), np.float32)
    return (params, mcfg, ecfg, mean, istd, None, None)


@pytest.fixture(scope="module")
def models():
    return _model(0, "psm"), _model(1, "lps")


@pytest.fixture(scope="module")
def noisy():
    rng = np.random.default_rng(3)
    return rng.standard_normal(SR).astype(np.float32) * 0.1


def _noisy_lps(noisy):
    re, im = stft_real_imag(jnp.asarray(noisy), STFT)
    return jnp.log(jnp.maximum(re * re + im * im, LPS_FLOOR))


def test_endpoint_weights_match_single_models(models, noisy):
    """alpha in {0,1} must reproduce the single-model decode bitwise —
    the sweep's endpoint rows ARE the single-model baselines."""
    a, b = models
    nl = _noisy_lps(noisy)
    for w, m in (((1.0, 0.0), a), ((0.0, 1.0), b)):
        fused = enhance_lps_multi((a, b), nl, w)
        params, mcfg, ecfg, mean, istd, tn, gv = m
        single = enhance_lps(params, mcfg, ecfg, nl, jnp.asarray(mean),
                             jnp.asarray(istd))
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(single))
    # and the waveform endpoint matches enhance_waveform
    wav_fused = enhance_waveform_fused((a, b), noisy, (0.0, 1.0))
    params, mcfg, ecfg, mean, istd, tn, gv = b
    wav_single = enhance_waveform(params, mcfg, ecfg, noisy, mean, istd)
    np.testing.assert_allclose(wav_fused, wav_single, atol=1e-6)


def test_blend_interpolates(models, noisy):
    a, b = models
    nl = _noisy_lps(noisy)
    la = np.asarray(enhance_lps_multi((a, b), nl, (1.0, 0.0)))
    lb = np.asarray(enhance_lps_multi((a, b), nl, (0.0, 1.0)))
    lf = np.asarray(enhance_lps_multi((a, b), nl, (0.5, 0.5)))
    np.testing.assert_allclose(lf, 0.5 * la + 0.5 * lb, rtol=1e-5, atol=1e-5)
    wav = enhance_waveform_fused((a, b), noisy, (0.5, 0.5))
    assert wav.shape == noisy.shape and np.isfinite(wav).all()


def test_fusion_validations(models, noisy):
    a, b = models
    nl = _noisy_lps(noisy)
    with pytest.raises(ValueError, match="sum to 1"):
        enhance_lps_multi((a, b), nl, (0.7, 0.7))
    with pytest.raises(ValueError, match="models vs"):
        enhance_lps_multi((a, b), nl, (1.0,))
    c = list(_model(2, "lps"))
    from dataclasses import replace

    c[2] = replace(c[2], stft=StftConfig.for_rate(16000))
    with pytest.raises(ValueError, match="STFT geometry"):
        enhance_lps_multi((a, tuple(c)), nl, (0.5, 0.5))


def test_sweep_fusion_runs_and_is_self_calibrating(models):
    from tpu_sednn.recipes.fusion_sweep import sweep_fusion

    a, b = models
    res = sweep_fusion(a, b, SR, alphas=(0.0, 0.5, 1.0), n_clips=2)
    assert len(res["table"]) == 3
    assert {r["alpha"] for r in res["table"]} == {0.0, 0.5, 1.0}
    assert res["best"] in res["table"]
    for r in res["table"]:
        for k in ("lsd_gain", "stoi_gain", "segsnr_gain", "score"):
            assert np.isfinite(r[k])


def test_fused_serving_decoder_matches_eager(models, noisy):
    """The batched jitted fused decoder must reproduce the eager fused
    decode (keep-prob folding + shared-STFT program are optimizations, not
    math changes)."""
    from tpu_sednn.enhance.fusion import make_fused_serving_decoder

    a, b = models
    w = (0.65, 0.35)
    eager = enhance_waveform_fused((a, b), noisy, w)
    dec = make_fused_serving_decoder((a, b), w)
    batch = np.stack([noisy, noisy * 0.5])
    out = np.asarray(dec(batch))
    assert out.shape == batch.shape
    np.testing.assert_allclose(out[0], eager, rtol=1e-4, atol=1e-5)
    # zero-weight models are dropped from the program entirely
    dec1 = make_fused_serving_decoder((a, b), (0.0, 1.0))
    from tpu_sednn.enhance.decode import make_serving_decoder

    params, mcfg, ecfg, mean, istd, tn, gv = b
    single = make_serving_decoder(params, mcfg, ecfg, mean, istd)
    np.testing.assert_allclose(np.asarray(dec1(batch)),
                               np.asarray(single(batch)), atol=1e-6)
