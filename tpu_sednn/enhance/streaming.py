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


class _StreamCore:
    """Shared constants + jitted kernels for the streaming decoders.

    Holds the folded eval params on device, the DFT/IDFT matrices, and the
    two jitted functions every streaming variant needs: `block` (B centers ->
    windowed time-domain enhanced frames) and `nat_of` (NAT estimate from the
    first frames).  Built once per (model, decode config, block size)."""

    def __init__(
        self,
        params: Params,
        model_cfg: ModelConfig,
        enh_cfg: EnhanceConfig,
        mean: np.ndarray,
        inv_std: np.ndarray,
        target_norm: Tuple[np.ndarray, np.ndarray] | None,
        block_frames: int,
        quant: str,
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
        self.win, self.hop = stft.win_len, stft.hop
        self.d = stft.n_bins
        self.pad_l = enh_cfg.targ_offset
        self.pad_r = enh_cfg.fea_context - 1 - enh_cfg.targ_offset

        folded, eval_cfg = fold_eval_params(params, model_cfg)
        fwd = None
        if quant == "int8":
            from tpu_sednn.model.quant import forward_eval_int8, quantize_params_int8

            folded = quantize_params_int8(folded)
            fwd = forward_eval_int8
        elif quant != "none":
            raise ValueError(f"unknown quant mode {quant!r}")
        self.params = jax.device_put(folded)
        mean_d = jnp.asarray(mean, jnp.float32)
        istd_d = jnp.asarray(inv_std, jnp.float32)
        tn = None
        if target_norm is not None:
            tn = (jnp.asarray(target_norm[0]), jnp.asarray(target_norm[1]))

        cos_m, sin_m = _rdft_matrices(stft.win_len, stft.n_fft, stft.window)
        icos, isin = _irdft_matrices(stft.win_len, stft.n_fft)
        cos_d, sin_d = jnp.asarray(cos_m), jnp.asarray(sin_m)
        icos_d, isin_d = jnp.asarray(icos), jnp.asarray(isin)
        w_np = _window_np(stft)
        win_d = jnp.asarray(w_np)
        self.ww = (w_np * w_np).astype(np.float32)

        C = enh_cfg.fea_context
        B = self.block_frames
        d = self.d
        pad_l = self.pad_l
        use_nat = enh_cfg.nat

        def block(p, raw_frames, nat_est):
            """(B+C-1 context-extended raw sample frames, win) -> (B, win)
            windowed time-domain enhanced frames for the B centers."""
            re = raw_frames @ cos_d
            im = raw_frames @ sin_d
            noisy_lps = jnp.log(jnp.maximum(re * re + im * im, LPS_FLOOR))
            normed = (noisy_lps - mean_d) * istd_d
            x = jnp.concatenate([normed[j : j + B] for j in range(C)], axis=1)
            if use_nat:
                x = jnp.concatenate(
                    [x, jnp.broadcast_to(nat_est, (B, d))], axis=1)
            out = (fwd or forward_eval)(p, x, eval_cfg)
            ctr = slice(pad_l, pad_l + B)
            enh = finalize_lps(out, noisy_lps[ctr], enh_cfg, target_norm=tn)
            mag = jnp.sqrt(jnp.maximum(re[ctr] ** 2 + im[ctr] ** 2, LPS_FLOOR))
            g = jnp.exp(0.5 * enh) / mag
            td = (re[ctr] * g) @ icos_d + (im[ctr] * g) @ isin_d
            return td * win_d[None, :]

        self.block_fn = block  # un-jitted (for fusing into a bigger jit)
        self.block = jax.jit(block)

        def nat_of(raw_frames):
            re = raw_frames @ cos_d
            im = raw_frames @ sin_d
            lps = jnp.log(jnp.maximum(re * re + im * im, LPS_FLOOR))
            return jnp.mean((lps - mean_d) * istd_d, axis=0)

        self.nat_of = jax.jit(nat_of)


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
        core: "_StreamCore | None" = None,
    ):
        core = core or _StreamCore(params, model_cfg, enh_cfg, mean, inv_std,
                                   target_norm, block_frames, quant)
        self._core = core
        self.enh_cfg = core.enh_cfg
        self.block_frames = core.block_frames
        self._win, self._hop = core.win, core.hop
        self._d = core.d
        self._pad_l, self._pad_r = core.pad_l, core.pad_r
        self._params = core.params
        self._ww = core.ww
        self._block = core.block
        self._nat_of = core.nat_of
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


class DeviceStreamingEnhancer:
    """Streaming enhancer whose rolling state lives in DEVICE arrays inside
    ONE jitted step (the on-chip streaming path; VERDICT r3 item 5).

    The carry — context frame ring (C-1, win), raw-sample tail (win-hop,),
    overlap-add accumulators (win-hop,) x2, and the frozen NAT estimate — is
    a tuple of device arrays threaded through `step(params, carry, block)`:
    each call consumes exactly block_frames*hop new samples and emits the
    same number of finalized enhanced samples, with no host-side state
    between steps.  `scan_blocks` runs N steps inside one `lax.scan` dispatch
    (the on-chip RTF measurement: per-step relay latency amortizes away).

    Sample-exact vs StreamingEnhancer/enhance_waveform: warmup (priming the
    carry, NAT from the first nat_frames frames) and the end-of-stream tail
    (edge-replicated lookahead) run on the host through the same jitted
    block kernel; everything in between is the device step.  Streams too
    short to prime fall back to the host streaming class (same `_StreamCore`,
    identical output).

    Requires targ_offset < fea_context - 1 (at least one lookahead frame);
    use StreamingEnhancer for zero-lookahead configs.
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
        core = _StreamCore(params, model_cfg, enh_cfg, mean, inv_std,
                           target_norm, block_frames, quant)
        if core.pad_r < 1:
            raise ValueError("DeviceStreamingEnhancer needs >= 1 lookahead "
                             "frame (targ_offset < fea_context - 1)")
        self._core = core
        self.enh_cfg = core.enh_cfg
        self.block_frames = core.block_frames
        win, hop, B, C = core.win, core.hop, core.block_frames, enh_cfg.fea_context
        self._win, self._hop = win, hop
        self._params = core.params
        # samples consumed when the carry is primed: frames 0..pad_r-1 formed,
        # plus the (win-hop)-sample tail ahead of frame pad_r
        self._n_prime = (core.pad_r - 1) * hop + win
        ww_d = jnp.asarray(core.ww)
        block_fn = core.block_fn

        def step(p, carry, new):
            """(carry, (B*hop,) new samples) -> (carry, (B*hop,) enhanced)."""
            prev, tail, acc, wacc, nat = carry
            seg = jnp.concatenate([tail, new])
            newf = jnp.stack([
                jax.lax.dynamic_slice_in_dim(seg, j * hop, win)
                for j in range(B)
            ])
            rows = jnp.concatenate([prev, newf], axis=0)  # (C-1+B, win)
            td = block_fn(p, rows, nat)  # (B, win) windowed td frames
            L = (B - 1) * hop + win
            accf = jnp.zeros(L, jnp.float32).at[: win - hop].set(acc)
            waccf = jnp.zeros(L, jnp.float32).at[: win - hop].set(wacc)
            for k in range(B):
                accf = accf.at[k * hop : k * hop + win].add(td[k])
                waccf = waccf.at[k * hop : k * hop + win].add(ww_d)
            out = accf[: B * hop] / jnp.maximum(waccf[: B * hop], 1e-8)
            carry = (rows[B:], seg[B * hop :], accf[B * hop :],
                     waccf[B * hop :], nat)
            return carry, out

        self._step = jax.jit(step)
        self._scan = jax.jit(
            lambda p, carry, blocks: jax.lax.scan(
                lambda c, nb: step(p, c, nb), carry, blocks))
        self.reset()

    # -- state ---------------------------------------------------------------

    def reset(self) -> None:
        self._buf = np.zeros(0, np.float32)  # unconsumed samples
        self._carry = None
        self._n_in = 0
        self._n_emitted = 0
        self._frames_done = 0  # frames already folded into the carry
        self._centers_done = 0  # centers already emitted
        self._flushed = False

    @property
    def algorithmic_latency_samples(self) -> int:
        return (self._core.pad_r + self.block_frames - 1) * self._hop + self._win

    def _try_prime(self) -> bool:
        """Build the device carry once enough samples are buffered: the first
        pad_r frames (+ left edge replication) as the context ring, the NAT
        estimate from the first nat_frames frames, zeroed OLA accumulators."""
        core = self._core
        win, hop = self._win, self._hop
        need = self._n_prime
        k = self.enh_cfg.nat_frames
        if self.enh_cfg.nat:
            need = max(need, (k - 1) * hop + win)
        if self._buf.size < need:
            return False
        buf = self._buf
        pad_l, pad_r = core.pad_l, core.pad_r
        f0 = np.stack([buf[j * hop : j * hop + win] for j in range(pad_r)])
        prev = np.concatenate([np.repeat(f0[:1], pad_l, axis=0), f0], axis=0)
        if self.enh_cfg.nat:
            natf = np.stack([buf[j * hop : j * hop + win] for j in range(k)])
            nat = core.nat_of(jnp.asarray(natf))
        else:
            nat = jnp.zeros(core.d, jnp.float32)
        tail = buf[pad_r * hop : self._n_prime]
        z = jnp.zeros(win - hop, jnp.float32)
        self._carry = (jnp.asarray(prev), jnp.asarray(tail), z, z, nat)
        self._buf = buf[self._n_prime :]
        self._frames_done = pad_r
        self._centers_done = 0
        return True

    # -- streaming api -------------------------------------------------------

    def push(self, samples: np.ndarray) -> np.ndarray:
        """Feed samples; returns finalized enhanced samples (empty while the
        pipeline fills).  Each full block of block_frames*hop buffered samples
        runs one device step."""
        if self._flushed:
            raise RuntimeError("stream already flushed; call reset()")
        s = np.asarray(samples, np.float32).ravel()
        self._n_in += s.size
        self._buf = np.concatenate([self._buf, s])
        if self._carry is None and not self._try_prime():
            return np.zeros(0, np.float32)
        B, hop = self.block_frames, self._hop
        step_in = B * hop
        outs = []
        while self._buf.size >= step_in:
            self._carry, o = self._step(
                self._params, self._carry, jnp.asarray(self._buf[:step_in]))
            self._buf = self._buf[step_in:]
            self._frames_done += B
            self._centers_done += B
            self._n_emitted += step_in
            outs.append(np.asarray(o))
        return np.concatenate(outs) if outs else np.zeros(0, np.float32)

    def scan_blocks(self, blocks: np.ndarray) -> np.ndarray:
        """Run N steady-state steps inside ONE lax.scan dispatch.

        blocks: (N, block_frames*hop).  The stream must be primed (push at
        least prime+1 block of samples first).  Returns (N, block_frames*hop)
        enhanced samples; state advances exactly as N push() blocks would."""
        if self._carry is None:
            raise RuntimeError("stream not primed yet (push more samples)")
        if self._buf.size:
            raise RuntimeError("unconsumed buffered samples; push whole "
                               "blocks before scan_blocks")
        blocks = np.asarray(blocks, np.float32)
        n, width = blocks.shape
        if width != self.block_frames * self._hop:
            raise ValueError(f"blocks must be (N, {self.block_frames * self._hop})")
        self._carry, outs = self._scan(self._params, self._carry,
                                       jnp.asarray(blocks))
        self._n_in += n * width
        self._frames_done += n * self.block_frames
        self._centers_done += n * self.block_frames
        self._n_emitted += n * width
        return np.asarray(outs)

    def flush(self) -> np.ndarray:
        """End of stream: host-side tail processing (edge-replicated
        lookahead) through the same jitted block kernel; total output length
        equals total input length."""
        if self._flushed:
            raise RuntimeError("stream already flushed; call reset()")
        self._flushed = True
        core = self._core
        win, hop, B, C = self._win, self._hop, self.block_frames, self.enh_cfg.fea_context
        pad_l, pad_r = core.pad_l, core.pad_r
        if self._carry is None:
            # never primed (short stream): identical semantics via the host
            # streaming class sharing this core — self._buf holds ALL input
            se = StreamingEnhancer(None, None, None, None, None, core=core)
            parts = [se.push(self._buf)] if self._buf.size else []
            parts.append(se.flush())
            return np.concatenate(parts) if parts else np.zeros(0, np.float32)
        prev, tail, acc, wacc, nat = self._carry
        prev = np.asarray(prev)
        rest = np.concatenate([np.asarray(tail), self._buf])
        n_more = (len(rest) - win) // hop + 1 if len(rest) >= win else 0
        frames = {}
        for idx in range(C - 1):  # frames centers_done-pad_l .. frames_done-1
            frames[self._centers_done - pad_l + idx] = prev[idx]
        for j in range(n_more):
            frames[self._frames_done + j] = rest[j * hop : j * hop + win]
        n_frames = self._frames_done + n_more
        lo_key = self._centers_done - pad_l

        def frame_at(i):
            return frames[min(max(i, lo_key), n_frames - 1)]

        total = (n_frames - 1) * hop + win
        need = total - self._n_emitted
        acc_h = np.zeros(max(need, win - hop), np.float32)
        wacc_h = np.zeros_like(acc_h)
        acc_h[: win - hop] = np.asarray(acc)
        wacc_h[: win - hop] = np.asarray(wacc)
        c = self._centers_done
        while c < n_frames:
            n_valid = min(B, n_frames - c)
            rows = np.stack([frame_at(c - pad_l + j) for j in range(B + C - 1)])
            td = np.asarray(core.block(self._params, jnp.asarray(rows), nat))
            for k in range(n_valid):
                s = (c + k) * hop - self._n_emitted
                acc_h[s : s + win] += td[k]
                wacc_h[s : s + win] += core.ww
            c += n_valid
        out = (acc_h / np.maximum(wacc_h, 1e-8))[:need]
        self._n_emitted = total
        if self._n_emitted < self._n_in:  # framing truncated the tail
            out = np.concatenate(
                [out, np.zeros(self._n_in - self._n_emitted, np.float32)])
            self._n_emitted = self._n_in
        return out[: out.size - max(0, self._n_emitted - self._n_in)]
