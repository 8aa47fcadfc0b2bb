"""Enhancement decode: the layer the reference ships only as an external
binary/Matlab tool (README.md:39-48; weight export via
toolbox/weights/change_cudaSavedModels2matlabWeigths_4layers.m).

Pipeline: noisy wav -> STFT -> noisy LPS -> normalize -> splice(+NAT) ->
DNN forward -> enhanced LPS (directly, or via an IRM/IBM mask applied to the
noisy spectrum) -> overlap-add ISTFT with the noisy phase -> enhanced wav.

Everything is jit-able end to end; a whole utterance is one batched forward.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_sednn.dsp.stft import (
    LPS_FLOOR,
    StftConfig,
    reconstruct_from_lps,
    stft_real_imag,
)
from tpu_sednn.model.mlp import ModelConfig, Params, fold_eval_params, forward_eval


@dataclass(frozen=True)
class EnhanceConfig:
    stft: StftConfig
    fea_context: int = 11
    targ_offset: int = 5
    nat: bool = True
    nat_frames: int = 6
    head: str = "lps"  # "lps" | "irm" | "ibm" | "psm" (all masks decode alike)
    mask_floor: float = 0.0  # mask post-processing (Interspeech'15 style)
    mask_smooth: int = 0  # moving-average width over time, 0/1 = off
    ibm_threshold: float = 0.5
    # Global-variance equalization (the TASLP'15 post-processing the reference
    # README cites): "off" | "global" (one scalar alpha) | "per-dim".
    gv_mode: str = "off"
    # lps-head gain limiting relative to the noisy spectrum (the spectral-floor
    # post-processing standard in enhancement practice): bound the per-bin
    # power gain out-noisy to [min_gain_db, max_gain_db].  A finite min_gain_db
    # (e.g. -15) caps maximum suppression — it limits speech distortion from
    # regression errors at the cost of residual noise.  None = off (parity).
    min_gain_db: float | None = None
    max_gain_db: float | None = None


def _splice_jnp(lps: jnp.ndarray, context: int, targ_offset: int) -> jnp.ndarray:
    """Edge-replicated splicing so every frame gets a prediction.

    Training windows exist only for interior frames; decode pads the feature
    sequence (targ_offset frames before, context-1-targ_offset after) with
    edge replication so window j predicts frame j for all j.
    """
    pad_l, pad_r = targ_offset, context - 1 - targ_offset
    padded = jnp.concatenate(
        [jnp.repeat(lps[:1], pad_l, axis=0), lps, jnp.repeat(lps[-1:], pad_r, axis=0)]
    )
    n = lps.shape[0]
    # context static slices + concat instead of an (n, context) gather — the
    # gather was a measurable slice of serving decode time on TPU
    return jnp.concatenate([padded[j : j + n] for j in range(context)], axis=1)


def enhance_lps(
    params: Params,
    model_cfg: ModelConfig,
    enh_cfg: EnhanceConfig,
    noisy_lps: jnp.ndarray,
    mean: jnp.ndarray,
    inv_std: jnp.ndarray,
    target_norm: Tuple[jnp.ndarray, jnp.ndarray] | None = None,
    gv_ref: jnp.ndarray | None = None,
    forward_fn=None,
) -> jnp.ndarray:
    """Noisy LPS (n_frames, d) -> enhanced LPS (n_frames, d).

    target_norm=(targ_mean, targ_inv_std) if the model was trained on
    normalized targets; the output is denormalized accordingly.
    gv_ref: per-dim global variance of clean training LPS (compute_gv) for
    GV equalization when enh_cfg.gv_mode != "off".
    forward_fn(params, x, cfg): alternative inference forward (e.g. the int8
    serving path, model/quant.py); defaults to forward_eval.
    """
    normed = (noisy_lps - mean) * inv_std
    x = _splice_jnp(normed, enh_cfg.fea_context, enh_cfg.targ_offset)
    if enh_cfg.nat:
        est = jnp.mean(normed[: enh_cfg.nat_frames], axis=0)
        x = jnp.concatenate([x, jnp.broadcast_to(est, (x.shape[0], normed.shape[1]))], axis=1)
    out = (forward_fn or forward_eval)(params, x, model_cfg)
    return finalize_lps(out, noisy_lps, enh_cfg, target_norm=target_norm,
                        gv_ref=gv_ref)


def finalize_lps(
    out: jnp.ndarray,
    noisy_lps: jnp.ndarray,
    enh_cfg: EnhanceConfig,
    target_norm: Tuple[jnp.ndarray, jnp.ndarray] | None = None,
    gv_ref: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Raw model output (frames, d) -> enhanced LPS: target denormalization,
    GV equalization, mask application, gain window — shared by the offline
    decode (enhance_lps) and the streaming enhancer."""
    if target_norm is not None and enh_cfg.head == "lps":
        t_mean, t_inv_std = target_norm
        out = out / t_inv_std + t_mean
    if enh_cfg.head == "lps":
        if enh_cfg.gv_mode != "off":
            if gv_ref is None:
                raise ValueError("gv_mode != 'off' requires gv_ref (see compute_gv)")
            out = equalize_gv(out, gv_ref, enh_cfg.gv_mode)
        return limit_gain(out, noisy_lps, enh_cfg)
    # mask heads: the mask itself bounds gain to [2*ln(mask_floor), 0]; the
    # configured dB window still applies on top so decode behavior is
    # uniform across heads
    return limit_gain(lps_from_mask(out, noisy_lps, enh_cfg), noisy_lps, enh_cfg)


# LPS here is natural-log POWER: gain_db = 10*log10(e) * (out - noisy)
_LN_PER_DB = float(np.log(10.0) / 10.0)


def limit_gain(est_lps: jnp.ndarray, noisy_lps: jnp.ndarray,
               enh_cfg: EnhanceConfig) -> jnp.ndarray:
    """Clip the per-bin power gain (est - noisy) to the configured dB window."""
    if enh_cfg.min_gain_db is None and enh_cfg.max_gain_db is None:
        return est_lps
    g = est_lps - noisy_lps
    lo = None if enh_cfg.min_gain_db is None else enh_cfg.min_gain_db * _LN_PER_DB
    hi = None if enh_cfg.max_gain_db is None else enh_cfg.max_gain_db * _LN_PER_DB
    return noisy_lps + jnp.clip(g, lo, hi)


def compute_gv(lps: jnp.ndarray) -> jnp.ndarray:
    """Per-dimension global variance of an LPS corpus/utterance (frames, d).

    For the reference-style recipe, run this over (a sample of) the clean
    training targets once and reuse the vector at decode time.
    """
    return jnp.var(lps, axis=0)


def equalize_gv(est_lps: jnp.ndarray, gv_ref: jnp.ndarray, mode: str = "global") -> jnp.ndarray:
    """Global-variance equalization (Xu et al., IEEE/ACM TASLP 2015, the
    post-processing step of the paper the reference README cites at
    README.md:61-71; the shipped repo stops at the raw DNN output).

    DNN regression over-smooths: the estimated LPS has lower variance than
    clean speech, which mutes formant dynamics. Rescale around the utterance
    mean so the output variance matches the clean-corpus global variance:

        alpha = sqrt(GV_ref / GV_est);  out = alpha * (est - mean) + mean

    mode="global" uses one scalar alpha (the paper's dimension-independent
    variant, found equally effective and more robust); mode="per-dim" uses a
    per-frequency alpha vector. alpha is clipped to [1, 2]: equalization only
    ever restores lost variance, never dampens, and short utterances can't
    explode quiet bins.
    """
    est_mean = jnp.mean(est_lps, axis=0)
    gv_est = jnp.maximum(jnp.var(est_lps, axis=0), 1e-8)
    if mode == "per-dim":
        alpha = jnp.sqrt(gv_ref / gv_est)
    elif mode == "global":
        alpha = jnp.sqrt(jnp.mean(gv_ref) / jnp.mean(gv_est))
    else:
        raise ValueError(f"unknown gv mode: {mode!r}")
    alpha = jnp.clip(alpha, 1.0, 2.0)
    return alpha * (est_lps - est_mean) + est_mean


def lps_from_mask(mask: jnp.ndarray, noisy_lps: jnp.ndarray, enh_cfg: EnhanceConfig) -> jnp.ndarray:
    """Apply an estimated IRM/IBM magnitude mask to the noisy spectrum."""
    mask = postprocess_mask(mask, enh_cfg)
    if enh_cfg.head == "ibm":
        mask = (mask >= enh_cfg.ibm_threshold).astype(noisy_lps.dtype)
        mask = jnp.maximum(mask, enh_cfg.mask_floor if enh_cfg.mask_floor > 0 else 1e-3)
    # magnitude-domain mask: |X_enh| = m * |X_noisy| -> LPS + 2*ln(m)
    return noisy_lps + 2.0 * jnp.log(jnp.maximum(mask, 1e-6))


def postprocess_mask(mask: jnp.ndarray, enh_cfg: EnhanceConfig) -> jnp.ndarray:
    """Mask post-processing in the spirit of the Interspeech 2015 follow-up
    the reference README cites (README.md:66-71): clip to [floor, 1] to bound
    maximum suppression, and smooth over time to reduce musical noise."""
    mask = jnp.clip(mask, 0.0, 1.0)
    if enh_cfg.mask_floor > 0.0:
        mask = jnp.maximum(mask, enh_cfg.mask_floor)
    if enh_cfg.mask_smooth > 1:
        k = enh_cfg.mask_smooth
        kern = jnp.ones((k,)) / k
        pad = k // 2
        padded = jnp.concatenate(
            [jnp.repeat(mask[:1], pad, 0), mask, jnp.repeat(mask[-1:], k - 1 - pad, 0)]
        )
        mask = jax.vmap(
            lambda col: jnp.convolve(col, kern, mode="valid"), in_axes=1, out_axes=1
        )(padded)
    return mask


def make_serving_decoder(
    params: Params,
    model_cfg: ModelConfig,
    enh_cfg: EnhanceConfig,
    mean: np.ndarray,
    inv_std: np.ndarray,
    target_norm: Tuple[np.ndarray, np.ndarray] | None = None,
    gv_ref: np.ndarray | None = None,
    quant: str = "none",
):
    """Build a batched wav->wav enhancement closure for serving.

    Serving-path optimizations over per-call enhance_waveform:
    * parity keep-prob scaling folded into the weights ONCE
      (fold_eval_params) instead of per forward;
    * normalization / GV constants put on device once;
    * one jitted vmapped program per utterance length (equal-length batches —
      a server pads/buckets utterances to a few lengths);
    * quant="int8": w8a8 dynamic quantization (model/quant.py). MEASURED NO
      WIN vs f32 on this chip (77.3k vs 80.7k audio-s/s at batch 64 — decode
      is not matmul-bound; BASELINE.md round-3 serving table). Kept for
      deployments where the int8 MXU path pays (bigger/matmul-bound models,
      4x-smaller weight footprint); accuracy gated in tests/test_quant.py.

    Returns decode(wavs: (batch, n_samples)) -> (batch, n_samples) enhanced.
    """
    folded, eval_cfg = fold_eval_params(params, model_cfg)
    fwd = None
    if quant == "int8":
        from tpu_sednn.model.quant import forward_eval_int8, quantize_params_int8

        folded = quantize_params_int8(folded)
        fwd = forward_eval_int8
    elif quant != "none":
        raise ValueError(f"unknown quant mode {quant!r}")
    folded = jax.device_put(folded)
    mean_d, istd_d = jnp.asarray(mean), jnp.asarray(inv_std)
    tn = None
    if target_norm is not None:
        tn = (jnp.asarray(target_norm[0]), jnp.asarray(target_norm[1]))
    gv = None if gv_ref is None else jnp.asarray(gv_ref)

    def one(p, wav):
        re, im = stft_real_imag(wav, enh_cfg.stft)
        noisy_lps = jnp.log(jnp.maximum(re * re + im * im, LPS_FLOOR))
        enh = enhance_lps(p, eval_cfg, enh_cfg, noisy_lps, mean_d, istd_d,
                          target_norm=tn, gv_ref=gv, forward_fn=fwd)
        return reconstruct_from_lps(enh, re, im, enh_cfg.stft, n_samples=wav.shape[0])

    pipe = jax.jit(jax.vmap(one, in_axes=(None, 0)))

    def decode(wavs) -> jnp.ndarray:
        return pipe(folded, jnp.asarray(wavs, jnp.float32))

    return decode


def make_bucketed_decoder(
    params: Params,
    model_cfg: ModelConfig,
    enh_cfg: EnhanceConfig,
    mean: np.ndarray,
    inv_std: np.ndarray,
    target_norm: Tuple[np.ndarray, np.ndarray] | None = None,
    gv_ref: np.ndarray | None = None,
    quant: str = "none",
    bucket_seconds: Tuple[float, ...] = (2.0, 4.0, 8.0, 16.0, 32.0),
    batch: int = 8,
):
    """Variable-length serving front-end over make_serving_decoder.

    Real traffic has ragged utterance lengths; XLA wants static shapes. The
    standard TPU serving answer is length bucketing: zero-pad each utterance
    UP (at the end, so the NAT first-frames estimate is untouched) to the
    smallest bucket, batch same-bucket utterances, run one compiled program
    per bucket (at most len(bucket_seconds) compilations, ever), and trim
    outputs back to the true lengths.

    Padding semantics: outputs are identical to the unpadded per-utterance
    decode except within the trailing edge region — the final analysis window
    plus the splice lookahead, win_len + (fea_context - targ_offset)*hop
    samples — where the decode sees zero-padding instead of utterance-edge
    frame replication (tested bound in tests/test_enhance_cli.py).
    Utterances longer than the largest bucket are decoded exactly at their
    own length (one extra compilation each).

    Returns decode_many(wavs: sequence of 1-D arrays) -> list of enhanced
    1-D arrays in the same order.
    """
    buckets = sorted(int(round(s * enh_cfg.stft.sample_rate)) for s in bucket_seconds)
    # one decoder closure; its inner jit caches one program per (batch, n)
    # shape, i.e. per bucket actually seen
    dec = make_serving_decoder(params, model_cfg, enh_cfg, mean, inv_std,
                               target_norm=target_norm, gv_ref=gv_ref,
                               quant=quant)

    def decode_many(wavs) -> list:
        wavs = [np.asarray(w, np.float32).ravel() for w in wavs]
        by_bucket: dict[int, list] = {}
        for i, w in enumerate(wavs):
            n = next((b for b in buckets if b >= w.size), w.size)
            by_bucket.setdefault(n, []).append(i)
        out: list = [None] * len(wavs)
        for n, idxs in by_bucket.items():
            for j in range(0, len(idxs), batch):
                group = idxs[j : j + batch]
                block = np.zeros((batch, n), np.float32)
                for r, i in enumerate(group):
                    block[r, : wavs[i].size] = wavs[i]
                for r in range(len(group), batch):  # pad batch: repeat row 0
                    block[r] = block[0]
                y = np.asarray(dec(block))
                for r, i in enumerate(group):
                    out[i] = y[r, : wavs[i].size]
        return out

    return decode_many


def enhance_waveform(
    params: Params,
    model_cfg: ModelConfig,
    enh_cfg: EnhanceConfig,
    noisy: np.ndarray | jnp.ndarray,
    mean: np.ndarray,
    inv_std: np.ndarray,
    target_norm: Tuple[np.ndarray, np.ndarray] | None = None,
    gv_ref: np.ndarray | None = None,
) -> np.ndarray:
    """Noisy waveform -> enhanced waveform (noisy-phase overlap-add)."""
    noisy = jnp.asarray(noisy, jnp.float32)
    re, im = stft_real_imag(noisy, enh_cfg.stft)
    noisy_lps = jnp.log(jnp.maximum(re * re + im * im, LPS_FLOOR))
    tn = None
    if target_norm is not None:
        tn = (jnp.asarray(target_norm[0]), jnp.asarray(target_norm[1]))
    enh_lps = enhance_lps(
        params, model_cfg, enh_cfg, noisy_lps, jnp.asarray(mean), jnp.asarray(inv_std),
        target_norm=tn,
        gv_ref=None if gv_ref is None else jnp.asarray(gv_ref),
    )
    out = reconstruct_from_lps(enh_lps, re, im, enh_cfg.stft, n_samples=noisy.shape[0])
    return np.asarray(out)
