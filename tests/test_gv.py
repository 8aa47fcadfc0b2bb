"""Global-variance equalization (TASLP'15 post-processing; the reference repo
stops at the raw DNN output — README.md:61-71 cites the paper that adds GV)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_sednn.enhance import EnhanceConfig, compute_gv, enhance_lps, equalize_gv
from tpu_sednn.dsp import StftConfig
from tpu_sednn.model import ModelConfig, init_params


def _corpus(rng, n=400, d=17, scale=None):
    x = rng.standard_normal((n, d)).astype(np.float32)
    if scale is not None:
        x = x * scale
    return x + rng.standard_normal((1, d)).astype(np.float32) * 3.0


def test_per_dim_restores_variance():
    rng = np.random.default_rng(0)
    clean = _corpus(rng, scale=np.linspace(1.0, 2.0, 17, dtype=np.float32))
    gv_ref = compute_gv(jnp.asarray(clean))
    # over-smoothed estimate: same mean structure, 60% of the std
    est = clean.mean(0) + 0.6 * (clean - clean.mean(0))
    out = np.asarray(equalize_gv(jnp.asarray(est), gv_ref, "per-dim"))
    # variance restored to the clean GV (alpha = 1/0.6 ≈ 1.67, inside the clip)
    np.testing.assert_allclose(out.var(0), np.asarray(gv_ref), rtol=1e-4)
    # utterance mean untouched
    np.testing.assert_allclose(out.mean(0), est.mean(0), atol=1e-4)


def test_global_mode_scalar_alpha_preserves_spectral_shape():
    rng = np.random.default_rng(1)
    clean = _corpus(rng)
    gv_ref = compute_gv(jnp.asarray(clean))
    est = clean.mean(0) + 0.7 * (clean - clean.mean(0))
    out = np.asarray(equalize_gv(jnp.asarray(est), gv_ref, "global"))
    # one scalar alpha: per-dim variance ratios all equal
    ratio = out.var(0) / est.var(0)
    np.testing.assert_allclose(ratio, ratio[0], rtol=1e-4)
    assert ratio[0] > 1.5  # ≈ (1/0.7)^2 ≈ 2.04, clipped at 4 (alpha<=2)


def test_alpha_clipped_to_never_dampen():
    rng = np.random.default_rng(2)
    clean = _corpus(rng)
    gv_ref = compute_gv(jnp.asarray(clean))
    # estimate MORE variable than clean -> alpha clips to 1 -> unchanged
    est = clean.mean(0) + 1.5 * (clean - clean.mean(0))
    out = np.asarray(equalize_gv(jnp.asarray(est), gv_ref, "per-dim"))
    np.testing.assert_allclose(out, est, atol=1e-5)


def test_enhance_lps_requires_gv_ref_and_applies_it():
    d = StftConfig.for_rate(8000).n_bins
    context, to = 3, 1
    mcfg = ModelConfig(layersizes=(d * context + d, 32, d))
    import jax

    params = init_params(jax.random.PRNGKey(0), mcfg)
    ecfg = EnhanceConfig(stft=StftConfig.for_rate(8000), fea_context=context,
                         targ_offset=to, nat=True, gv_mode="per-dim")
    rng = np.random.default_rng(3)
    lps = jnp.asarray(rng.standard_normal((40, d)).astype(np.float32))
    mean = jnp.zeros((d,)); istd = jnp.ones((d,))
    with pytest.raises(ValueError, match="gv_ref"):
        enhance_lps(params, mcfg, ecfg, lps, mean, istd)
    gv_ref = jnp.full((d,), 10.0)  # much larger than any raw-output variance
    out = np.asarray(enhance_lps(params, mcfg, ecfg, lps, mean, istd, gv_ref=gv_ref))
    base = np.asarray(enhance_lps(
        params, mcfg, EnhanceConfig(stft=ecfg.stft, fea_context=context,
                                    targ_offset=to, nat=True),
        lps, mean, istd))
    assert np.isfinite(out).all()
    # equalization strictly increased the output variance vs the raw decode
    assert (out.var(0) > base.var(0) * 1.5).all()
    np.testing.assert_allclose(out.mean(0), base.mean(0), atol=1e-4)


def test_gv_unknown_mode_raises():
    with pytest.raises(ValueError, match="gv mode"):
        equalize_gv(jnp.ones((4, 2)), jnp.ones((2,)), "nope")


def test_gain_window_clips_suppression_and_amplification():
    from tpu_sednn.dsp import StftConfig
    from tpu_sednn.enhance.decode import EnhanceConfig, limit_gain

    stft = StftConfig.for_rate(8000)
    rng = np.random.default_rng(7)
    noisy = jnp.asarray(rng.standard_normal((30, 129)).astype(np.float32))
    est = noisy + jnp.asarray(
        rng.uniform(-12.0, 12.0, (30, 129)).astype(np.float32))  # ln power
    cfg = EnhanceConfig(stft=stft, min_gain_db=-10.0, max_gain_db=0.0)
    out = np.asarray(limit_gain(est, noisy, cfg))
    gain_db = (out - np.asarray(noisy)) * 10.0 / np.log(10.0)
    assert gain_db.min() >= -10.0 - 1e-4
    assert gain_db.max() <= 0.0 + 1e-4
    # inside the window the estimate is untouched
    inside = (np.asarray(est - noisy) * 10.0 / np.log(10.0) > -10.0) & (
        np.asarray(est - noisy) < 0.0)
    np.testing.assert_allclose(out[inside], np.asarray(est)[inside], rtol=1e-6)
    # window off = identity
    off = EnhanceConfig(stft=stft)
    np.testing.assert_array_equal(np.asarray(limit_gain(est, noisy, off)),
                                  np.asarray(est))
