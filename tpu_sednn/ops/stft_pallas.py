"""Pallas STFT/log-power-spectrum kernel — the on-device replacement for the
reference's offline Wav2LogSpec.exe feature extractor (how_to_get_pfile.txt:3).

Exploits the canonical geometry win_len == 2*hop (32 ms window, 16 ms shift):
a block of F frames starting at hop-aligned offsets is just two shifted
reshapes of the flat signal,

    frames[j] = [ sig[j*hop:(j+1)*hop] | sig[(j+1)*hop:(j+2)*hop] ]

so the kernel builds the frame matrix with two strided VMEM views (no gather),
then runs the windowed real-DFT as two MXU matmuls (cos/sin, window folded in)
and fuses power + log.  Output matches tpu_sednn.dsp.stft_logpower exactly.

Constraints: hop % 128 == 0 (v5e lane width) and win == 2*hop — both hold for
the 8 kHz (hop 128) and 16 kHz (hop 256) canonical configs.  Other geometries
fall back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_sednn.dsp.stft import LPS_FLOOR, StftConfig, _rdft_matrices, stft_logpower

FRAME_BLOCK = 128  # frames per grid step


def _stft_kernel(a_ref, b_ref, cos_a_ref, cos_b_ref, sin_a_ref, sin_b_ref, out_ref):
    """Frame j's window = [a[j] | b[j]] with b pre-shifted by one hop; the
    split-matrix form frames@C == a@C_top + b@C_bot avoids any unaligned
    sublane slicing or concatenation inside the kernel."""
    a = a_ref[0]  # (F, hop) first half of each window
    b = b_ref[0]  # (F, hop) second half
    re = (jnp.dot(a, cos_a_ref[:], preferred_element_type=jnp.float32)
          + jnp.dot(b, cos_b_ref[:], preferred_element_type=jnp.float32))
    im = (jnp.dot(a, sin_a_ref[:], preferred_element_type=jnp.float32)
          + jnp.dot(b, sin_b_ref[:], preferred_element_type=jnp.float32))
    out_ref[:] = jnp.log(jnp.maximum(re * re + im * im, LPS_FLOOR))


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def stft_lps_pallas(x: jnp.ndarray, cfg: StftConfig, interpret: bool = False) -> jnp.ndarray:
    """Signal (n_samples,) -> LPS (n_frames, n_bins), n_frames as in dsp.stft."""
    hop, win = cfg.hop, cfg.win_len
    if win != 2 * hop or hop % 128 != 0:
        return stft_logpower(x, cfg)
    if not interpret and jax.default_backend() != "tpu":
        # Pallas compiled path is TPU-only; CPU/virtual-device runs use XLA
        return stft_logpower(x, cfg)

    n_frames = 1 + (x.shape[0] - win) // hop
    n_blocks = (n_frames + FRAME_BLOCK - 1) // FRAME_BLOCK
    # pad signal so every block has a full (FRAME_BLOCK+1)*hop sample window
    needed = (n_blocks * FRAME_BLOCK + 1) * hop
    sig = jnp.pad(x.astype(jnp.float32), (0, max(0, needed - x.shape[0])))

    cos_m, sin_m = _rdft_matrices(win, cfg.n_fft, cfg.window)
    n_bins = cfg.n_bins
    pad_bins = (n_bins + 127) // 128 * 128
    cos_p = jnp.asarray(np.pad(cos_m, ((0, 0), (0, pad_bins - n_bins))))
    sin_p = jnp.asarray(np.pad(sin_m, ((0, 0), (0, pad_bins - n_bins))))

    f = FRAME_BLOCK
    total_frames = n_blocks * f
    # frame starts a[j] = sig[j*hop : (j+1)*hop]; second halves b[j] shifted
    # by one hop — both are plain reshapes, built once in XLA (signal bytes
    # are negligible next to the spectrogram)
    a = sig[: total_frames * hop].reshape(n_blocks, f, hop)
    b = sig[hop : (total_frames + 1) * hop].reshape(n_blocks, f, hop)

    out = pl.pallas_call(
        _stft_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, f, hop), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, hop), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hop, pad_bins), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hop, pad_bins), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hop, pad_bins), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hop, pad_bins), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((f, pad_bins), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total_frames, pad_bins), jnp.float32),
        interpret=interpret,
    )(a, b, cos_p[:hop], cos_p[hop:], sin_p[:hop], sin_p[hop:])
    return out[:n_frames, :n_bins]


