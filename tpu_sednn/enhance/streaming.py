"""Streaming (online) enhancement: push audio in arbitrary-sized chunks, get
enhanced samples back with bounded algorithmic latency.

The reference's decode exists only as an offline external tool applied to
whole utterances (README.md:39-48); this is the production-serving extension:
the same pipeline (STFT -> LPS -> normalize -> splice+NAT -> DNN forward ->
noisy-phase overlap-add) restructured as an incremental state machine whose
output is SAMPLE-EXACT equal to the offline `enhance_waveform` (gated in
tests/test_streaming.py) for any chunking of the input.

Latency model (samples, for StftConfig(win, hop), context C, targ_offset o):
  * splice lookahead: frame j's network input needs frames j..j+(C-1-o)
  * overlap-add finalization: a sample is final once no future frame window
    can touch it — (win - hop) additional samples
  * block batching: centers are forwarded in blocks of `block_frames` to
    amortize dispatch (set 1 for minimum latency)
  upper bound: (C-1-o + block_frames-1)*hop + win   (canonical 8 kHz flagship,
  block 8: (5+7)*128 + 256 = 1792 samples = 224 ms).

Streaming-incompatible decode options are rejected up front: gv_mode != "off"
(global-variance equalization is an utterance-level statistic) and
mask_smooth > 1 (centered moving average; a causal variant would change
numerics vs offline).

NAT semantics follow the reference exactly (Interface.cc:776-779): the noise
estimate is the mean of the FIRST nat_frames frames of the stream, then
frozen — output starts after those frames have arrived.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_sednn.dsp.stft import (
    LPS_FLOOR,
    _irdft_matrices,
    _rdft_matrices,
    _window_np,
)
from tpu_sednn.enhance.decode import EnhanceConfig, finalize_lps
from tpu_sednn.model.mlp import ModelConfig, Params, fold_eval_params, forward_eval


class StreamingEnhancer:
    """Stateful one-utterance streaming enhancer.

    Usage:
        se = StreamingEnhancer(params, model_cfg, enh_cfg, mean, inv_std)
        for chunk in audio_chunks:
            out.append(se.push(chunk))
        out.append(se.flush())
        enhanced = np.concatenate(out)   # same length as the input

    One instance = one stream (NAT estimate and overlap-add state are
    per-utterance). Build once per connection; `reset()` rearms it.
    """

    def __init__(
        self,
        params: Params,
        model_cfg: ModelConfig,
        enh_cfg: EnhanceConfig,
        mean: np.ndarray,
        inv_std: np.ndarray,
        target_norm: Tuple[np.ndarray, np.ndarray] | None = None,
        block_frames: int = 8,
        quant: str = "none",
    ):
        if enh_cfg.gv_mode != "off":
            raise ValueError("streaming cannot apply GV equalization "
                             "(utterance-global statistic); use gv_mode='off'")
        if enh_cfg.mask_smooth > 1:
            raise ValueError("streaming does not support centered mask "
                             "smoothing (mask_smooth > 1)")
        self.enh_cfg = enh_cfg
        self.block_frames = int(block_frames)
        if self.block_frames < 1:
            raise ValueError("block_frames must be >= 1")
        stft = enh_cfg.stft
        self._win, self._hop = stft.win_len, stft.hop
        self._d = stft.n_bins
        self._pad_l = enh_cfg.targ_offset
        self._pad_r = enh_cfg.fea_context - 1 - enh_cfg.targ_offset

        folded, eval_cfg = fold_eval_params(params, model_cfg)
        fwd = None
        if quant == "int8":
            from tpu_sednn.model.quant import forward_eval_int8, quantize_params_int8

            folded = quantize_params_int8(folded)
            fwd = forward_eval_int8
        elif quant != "none":
            raise ValueError(f"unknown quant mode {quant!r}")
        self._params = jax.device_put(folded)
        self._mean = jnp.asarray(mean, jnp.float32)
        self._istd = jnp.asarray(inv_std, jnp.float32)
        self._tn = None
        if target_norm is not None:
            self._tn = (jnp.asarray(target_norm[0]), jnp.asarray(target_norm[1]))

        cos_m, sin_m = _rdft_matrices(stft.win_len, stft.n_fft, stft.window)
        icos, isin = _irdft_matrices(stft.win_len, stft.n_fft)
        cos_d, sin_d = jnp.asarray(cos_m), jnp.asarray(sin_m)
        icos_d, isin_d = jnp.asarray(icos), jnp.asarray(isin)
        w_np = _window_np(stft)
        win_d = jnp.asarray(w_np)
        self._ww = (w_np * w_np).astype(np.float32)

        C = enh_cfg.fea_context
        B = self.block_frames
        use_nat = enh_cfg.nat

        def block(p, raw_frames, nat_est):
            """(B+C-1 context-extended raw sample frames, win) -> (B, win)
            windowed time-domain enhanced frames for the B centers."""
            re = raw_frames @ cos_d
            im = raw_frames @ sin_d
            noisy_lps = jnp.log(jnp.maximum(re * re + im * im, LPS_FLOOR))
            normed = (noisy_lps - self._mean) * self._istd
            x = jnp.concatenate([normed[j : j + B] for j in range(C)], axis=1)
            if use_nat:
                x = jnp.concatenate(
                    [x, jnp.broadcast_to(nat_est, (B, self._d))], axis=1)
            out = (fwd or forward_eval)(p, x, eval_cfg)
            ctr = slice(self._pad_l, self._pad_l + B)
            enh = finalize_lps(out, noisy_lps[ctr], enh_cfg, target_norm=self._tn)
            mag = jnp.sqrt(jnp.maximum(re[ctr] ** 2 + im[ctr] ** 2, LPS_FLOOR))
            g = jnp.exp(0.5 * enh) / mag
            td = (re[ctr] * g) @ icos_d + (im[ctr] * g) @ isin_d
            return td * win_d[None, :]

        self._block = jax.jit(block)

        def nat_of(raw_frames):
            re = raw_frames @ cos_d
            im = raw_frames @ sin_d
            lps = jnp.log(jnp.maximum(re * re + im * im, LPS_FLOOR))
            return jnp.mean((lps - self._mean) * self._istd, axis=0)

        self._nat_of = jax.jit(nat_of)
        self.reset()

    # -- state ---------------------------------------------------------------

    def reset(self) -> None:
        self._raw = np.zeros(0, np.float32)  # samples not yet fully framed
        self._frames: list[np.ndarray] = []  # raw (win,) frames, sliding
        self._frames_start = 0  # absolute index of self._frames[0]
        self._n_frames = 0  # frames produced so far
        self._next_center = 0  # first frame index not yet enhanced
        self._n_in = 0  # total samples pushed
        self._n_emitted = 0  # total samples returned
        self._nat_est = None if self.enh_cfg.nat else jnp.zeros(self._d)
        self._acc = np.zeros(0, np.float32)  # OLA accumulator from _n_emitted
        self._wacc = np.zeros(0, np.float32)  # window-square accumulator
        self._flushed = False

    @property
    def algorithmic_latency_samples(self) -> int:
        """Worst-case input-to-output sample latency (see module docstring)."""
        return (self._pad_r + self.block_frames - 1) * self._hop + self._win

    # -- streaming api ---------------------------------------------------------

    def push(self, samples: np.ndarray) -> np.ndarray:
        """Feed a chunk of samples; returns finalized enhanced samples (may be
        empty while the pipeline fills)."""
        if self._flushed:
            raise RuntimeError("stream already flushed; call reset()")
        samples = np.asarray(samples, np.float32).ravel()
        self._n_in += samples.size
        self._raw = np.concatenate([self._raw, samples])
        if self._raw.size >= self._win:
            # extract ALL complete frames in one vectorized gather (a per-frame
            # re-slice loop is O(N^2/hop) memcpy for a large single push — the
            # CLI --stream path pushes the whole file at once; ADVICE r3)
            n_new = (self._raw.size - self._win) // self._hop + 1
            idx = (np.arange(n_new)[:, None] * self._hop
                   + np.arange(self._win)[None, :])
            self._frames.extend(self._raw[idx])
            self._raw = self._raw[n_new * self._hop:]
            self._n_frames += n_new
        self._maybe_nat()
        self._run_ready_blocks(final=False)
        return self._emit(limit=self._next_center * self._hop)

    def flush(self) -> np.ndarray:
        """End of stream: process the tail (edge-replicated lookahead, exactly
        like the offline decode) and return all remaining samples; the total
        output length equals the total input length."""
        if self._flushed:
            raise RuntimeError("stream already flushed; call reset()")
        self._flushed = True
        self._maybe_nat(final=True)
        if self._n_frames == 0 or self._nat_est is None:
            # shorter than one analysis window (or than the NAT warmup with no
            # frames at all): nothing decodable; offline framing would yield
            # no frames either — pass silence of the right length
            return np.zeros(self._n_in - self._n_emitted, np.float32)
        self._run_ready_blocks(final=True)
        total = (self._n_frames - 1) * self._hop + self._win
        out = self._emit(limit=total)
        if self._n_emitted < self._n_in:  # framing truncated the tail
            pad = np.zeros(self._n_in - self._n_emitted, np.float32)
            self._n_emitted = self._n_in
            out = np.concatenate([out, pad])
        return out[: out.size - max(0, self._n_emitted - self._n_in)]

    # -- internals -------------------------------------------------------------

    def _maybe_nat(self, final: bool = False) -> None:
        if self._nat_est is not None:
            return
        k = self.enh_cfg.nat_frames
        if self._n_frames >= k:
            self._nat_est = self._nat_of(jnp.asarray(np.stack(self._frames[:k])))
        elif final and self._n_frames > 0:
            # degenerate short stream: offline would average what exists
            self._nat_est = self._nat_of(jnp.asarray(np.stack(self._frames)))

    def _frame_at(self, idx: int) -> np.ndarray:
        """Raw frame by absolute index with edge replication outside [0, n)."""
        idx = min(max(idx, 0), self._n_frames - 1)
        return self._frames[idx - self._frames_start]

    def _run_ready_blocks(self, final: bool) -> None:
        if self._nat_est is None:
            return
        B, C = self.block_frames, self.enh_cfg.fea_context
        while True:
            last_center = self._next_center + B - 1
            if not final and last_center + self._pad_r >= self._n_frames:
                return
            if final and self._next_center >= self._n_frames:
                return
            n_valid = min(B, self._n_frames - self._next_center)
            rows = [
                self._frame_at(self._next_center - self._pad_l + j)
                for j in range(B + C - 1)
            ]
            td = np.asarray(
                self._block(self._params, jnp.asarray(np.stack(rows)), self._nat_est)
            )
            self._ola_add(td[:n_valid], self._next_center)
            self._next_center += n_valid
            self._trim_history()

    def _ola_add(self, td: np.ndarray, first_center: int) -> None:
        start = first_center * self._hop - self._n_emitted
        need = start + (td.shape[0] - 1) * self._hop + self._win
        if self._acc.size < need:
            grow = need - self._acc.size
            self._acc = np.concatenate([self._acc, np.zeros(grow, np.float32)])
            self._wacc = np.concatenate([self._wacc, np.zeros(grow, np.float32)])
        for k in range(td.shape[0]):
            s = start + k * self._hop
            self._acc[s : s + self._win] += td[k]
            self._wacc[s : s + self._win] += self._ww

    def _emit(self, limit: int) -> np.ndarray:
        n = min(limit - self._n_emitted, self._acc.size)
        if n <= 0:
            return np.zeros(0, np.float32)
        out = self._acc[:n] / np.maximum(self._wacc[:n], 1e-8)
        self._acc = self._acc[n:]
        self._wacc = self._wacc[n:]
        self._n_emitted += n
        return out

    def _trim_history(self) -> None:
        keep_from = max(self._next_center - self._pad_l, 0)
        drop = keep_from - self._frames_start
        if drop > 0:
            del self._frames[:drop]
            self._frames_start = keep_from
