"""Fully on-device sample construction: wav -> training samples as ONE jitted
program (Pallas STFT -> normalize -> splice -> NAT -> target extraction).

This is the end state of replacing the reference's offline feature toolchain
(SURVEY.md §3.5): no host-side feature files at all — raw audio goes in,
(X, T) sample matrices come out on the device, ready for the fused trainer.
The host-side paths (build_training_arrays / read_chunk_parity) remain for
pfile compatibility and parity testing.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_sednn.dsp.stft import LPS_FLOOR, StftConfig
from tpu_sednn.ops.stft_pallas import stft_lps_pallas


def splice_device(lps: jnp.ndarray, context: int) -> jnp.ndarray:
    """(n, d) -> (n-context+1, context*d) on device (same as data.splice)."""
    n, d = lps.shape
    idx = jnp.arange(n - context + 1)[:, None] + jnp.arange(context)[None, :]
    return lps[idx].reshape(n - context + 1, context * d)


@functools.partial(jax.jit, static_argnames=("cfg", "fea_context", "targ_offset", "nat"))
def wav_pair_to_samples(
    noisy: jnp.ndarray,
    clean: jnp.ndarray,
    mean: jnp.ndarray,
    inv_std: jnp.ndarray,
    cfg: StftConfig,
    fea_context: int = 11,
    targ_offset: int = 5,
    nat: bool = True,
    targ_mean: jnp.ndarray | None = None,
    targ_inv_std: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(noisy wav, clean wav) -> (X, T) training samples, entirely on device.

    X: (n_samples, d*context [+ d]); T: (n_samples, d).  Matches
    build_training_arrays on the same LPS inputs.
    """
    noisy_lps = stft_lps_pallas(noisy, cfg)
    clean_lps = stft_lps_pallas(clean, cfg)
    normed = (noisy_lps - mean) * inv_std

    x = splice_device(normed, fea_context)
    if nat:
        est = jnp.mean(normed[:6], axis=0)  # first-6-frames NAT estimate
        x = jnp.concatenate(
            [x, jnp.broadcast_to(est, (x.shape[0], normed.shape[1]))], axis=1
        )
    t = jax.lax.dynamic_slice_in_dim(clean_lps, targ_offset, x.shape[0], axis=0)
    if targ_mean is not None:
        t = (t - targ_mean) * targ_inv_std
    return x, t


def streaming_sample_batches(
    wav_pairs,
    mean,
    inv_std,
    cfg: StftConfig,
    fea_context: int = 11,
    targ_offset: int = 5,
    nat: bool = True,
    targ_mean=None,
    targ_inv_std=None,
):
    """Generator over (X, T) per utterance pair, computed on device.

    Pads each wav to a bucketed length so jit recompiles only per bucket, not
    per utterance.  Sample rows corresponding to padding are trimmed (the LPS
    of trailing zeros would otherwise poison training).
    """
    mean = jnp.asarray(mean)
    inv_std = jnp.asarray(inv_std)
    tm = jnp.asarray(targ_mean) if targ_mean is not None else None
    ts = jnp.asarray(targ_inv_std) if targ_inv_std is not None else None
    bucket = 4 * cfg.sample_rate  # 4-second buckets

    for noisy, clean in wav_pairs:
        n = len(noisy)
        n_frames_true = 1 + (n - cfg.win_len) // cfg.hop if n >= cfg.win_len else 0
        n_samples_true = max(0, n_frames_true - fea_context + 1)
        if n_samples_true == 0:
            continue
        padded = ((n + bucket - 1) // bucket) * bucket
        pn = jnp.pad(jnp.asarray(noisy, jnp.float32), (0, padded - n))
        pc = jnp.pad(jnp.asarray(clean, jnp.float32), (0, padded - n))
        x, t = wav_pair_to_samples(pn, pc, mean, inv_std, cfg, fea_context,
                                   targ_offset, nat, tm, ts)
        yield x[:n_samples_true], t[:n_samples_true]
