"""Head-fusion decode: blend two (or more) models' enhanced log-spectra.

Round-4 finding (BASELINE.md 16 kHz table): at 16 kHz the lps regression
head dominates LSD while the PSM mask head dominates the perceptual proxies
(STOI/SegSNR/PESQ) — no single head wins both axes.  A convex blend of the
FINAL enhanced LPS (each model's own post-processing applied first) is a
geometric blend of the estimated magnitudes,

    lps_fused = sum_i w_i * lps_i,   sum w_i = 1,

reconstructed with the shared noisy phase.  The blend weight is a decode-time
parameter, swept on HELD-OUT validation clips (recipes/fusion_sweep.py; never
the gate clips) like every other decode parameter (recipes/val_sweep.py).

The reference ships no analog (its decode is a single-model binary,
README.md:39-44); this is a serving-side capability on top of parity.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from tpu_sednn.dsp.stft import reconstruct_from_lps, stft_real_imag
from tpu_sednn.enhance.decode import LPS_FLOOR, enhance_lps


def enhance_lps_multi(models: Sequence, noisy_lps: jnp.ndarray,
                      weights: Sequence[float]) -> jnp.ndarray:
    """models: sequence of (params, mcfg, ecfg, mean, inv_std, tn, gv)
    tuples — exactly what recipes.artifact.load_run_dir returns.  Every
    model decodes the same noisy LPS (they must share the STFT geometry);
    the enhanced log-spectra are blended with `weights`."""
    if len(models) != len(weights):
        raise ValueError(f"{len(models)} models vs {len(weights)} weights")
    if abs(sum(weights) - 1.0) > 1e-6:
        raise ValueError(f"weights must sum to 1, got {sum(weights)}")
    geom = {(m[2].stft.sample_rate, m[2].stft.n_bins) for m in models}
    if len(geom) != 1:
        raise ValueError(f"models disagree on STFT geometry: {geom}")
    fused = None
    for w, (params, mcfg, ecfg, mean, inv_std, tn, gv) in zip(weights, models):
        if w == 0.0:
            continue
        lps = enhance_lps(
            params, mcfg, ecfg, noisy_lps,
            jnp.asarray(mean), jnp.asarray(inv_std),
            target_norm=None if tn is None else (jnp.asarray(tn[0]),
                                                 jnp.asarray(tn[1])),
            gv_ref=None if gv is None else jnp.asarray(gv))
        fused = w * lps if fused is None else fused + w * lps
    return fused


def enhance_waveform_fused(models: Sequence, noisy, weights: Sequence[float]
                           ) -> np.ndarray:
    """Noisy waveform -> fused enhanced waveform (noisy-phase overlap-add)."""
    stft = models[0][2].stft
    noisy = jnp.asarray(noisy, jnp.float32)
    re, im = stft_real_imag(noisy, stft)
    noisy_lps = jnp.log(jnp.maximum(re * re + im * im, LPS_FLOOR))
    fused = enhance_lps_multi(models, noisy_lps, weights)
    out = reconstruct_from_lps(fused, re, im, stft, n_samples=noisy.shape[0])
    return np.asarray(out)


def make_fused_serving_decoder(models: Sequence, weights: Sequence[float]):
    """Batched jitted wav->wav FUSED decoder — the serving-path analog of
    decode.make_serving_decoder for head fusion: every model's keep-prob
    scaling folded into its weights once, all constants device-resident,
    one vmapped program per utterance length.  The STFT/ISTFT and noisy-LPS
    work is shared across models inside the single fused program (a naive
    two-decoder blend would redo it per model).

    Returns decode(wavs: (batch, n)) -> (batch, n) enhanced."""
    import jax

    from tpu_sednn.enhance.decode import enhance_lps, fold_eval_params

    if len(models) != len(weights):
        raise ValueError(f"{len(models)} models vs {len(weights)} weights")
    if abs(sum(weights) - 1.0) > 1e-6:
        raise ValueError(f"weights must sum to 1, got {sum(weights)}")
    geom = {(m[2].stft.sample_rate, m[2].stft.n_bins) for m in models}
    if len(geom) != 1:
        raise ValueError(f"models disagree on STFT geometry: {geom}")
    stft = models[0][2].stft
    prepped = []
    for w, (params, mcfg, ecfg, mean, inv_std, tn, gv) in zip(weights, models):
        if w == 0.0:
            continue
        folded, eval_cfg = fold_eval_params(params, mcfg)
        prepped.append((
            float(w), jax.device_put(folded), eval_cfg, ecfg,
            jnp.asarray(mean), jnp.asarray(inv_std),
            None if tn is None else (jnp.asarray(tn[0]), jnp.asarray(tn[1])),
            None if gv is None else jnp.asarray(gv)))

    def one(ps, wav):
        re, im = stft_real_imag(wav, stft)
        noisy_lps = jnp.log(jnp.maximum(re * re + im * im, LPS_FLOOR))
        fused = None
        for (w, _, eval_cfg, ecfg, mean_d, istd_d, tn, gv), p in zip(prepped, ps):
            lps = enhance_lps(p, eval_cfg, ecfg, noisy_lps, mean_d, istd_d,
                              target_norm=tn, gv_ref=gv)
            fused = w * lps if fused is None else fused + w * lps
        return reconstruct_from_lps(fused, re, im, stft,
                                    n_samples=wav.shape[0])

    pipe = jax.jit(jax.vmap(one, in_axes=(None, 0)))
    folded_all = tuple(p[1] for p in prepped)

    def decode(wavs) -> jnp.ndarray:
        return pipe(folded_all, jnp.asarray(wavs, jnp.float32))

    return decode
