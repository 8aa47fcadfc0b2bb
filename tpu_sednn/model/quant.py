"""int8 serving quantization for the regression MLP (TPU int8 MXU path).

The reference serves its model through an external fp32 Matlab tool
(README.md:39-48); this module is a TPU-native serving extension: w8a8
dynamic quantization so the forward matmuls can run on the MXU's int8 path
(~2x the bf16 peak on v5e-class chips).

MEASURED RESULT (v5e, BASELINE.md round-3 serving table): no throughput win
over the f32/bf16 decoder on this chip/backend (77.3k vs 80.7k audio-s/s at
batch 64) — the wav->wav decode is not matmul-bound enough for the matmul
savings to beat the dynamic-quantization overhead.  The path is kept for
deployments where it pays (bigger models, matmul-bound servers, memory-
footprint limits: int8 weights are 4x smaller); accuracy is what this repo
gates (tests/test_quant.py).

Scheme (standard w8a8 dynamic):
* weights: per-output-channel symmetric int8, scale sw[j] = max|W[:,j]|/127,
  computed ONCE at decoder build time (after fold_eval_params, so the parity
  keep-prob scaling is already in the weights);
* activations: per-row dynamic symmetric int8, sx[i] = max|x[i,:]|/127,
  computed on device per forward — no calibration set needed;
* accumulation in int32 on the MXU, dequantized as int32 * (sx sw) + b;
* the OUTPUT layer stays in bf16/f32 by default (quant_last=False): the
  regression head's absolute accuracy dominates enhancement quality and its
  matmul (2048x129) is a rounding error of the FLOPs.

Accuracy is gated in tests/test_quant.py (quantized decode within a small
LSD of the f32 decode on real demo clips) and the serving throughput rides
in bench.py as decode_int8_audio_s_per_s.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_sednn.model.mlp import ModelConfig, Params, _act

_QMAX = 127.0


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class QuantParams:
    """Per-layer quantized weights. `wq[l]` is int8 with per-column scales
    `sw[l]`; a layer kept in float has wq[l] is None and uses `w_f32[l]`."""

    wq: Tuple[jnp.ndarray, ...]  # int8 (n_in, n_out) or None placeholder
    sw: Tuple[jnp.ndarray, ...]  # f32 (n_out,) or None
    # f32 weights ONLY for skipped (non-quantized) layers; None where wq[l]
    # exists, so the device copy really is ~4x smaller for quantized layers
    # (ADVICE r3: keeping every f32 matrix made the struct 1.3x the f32 size)
    w_f32: Tuple[jnp.ndarray, ...]
    b: Tuple[jnp.ndarray, ...]
    skip_last: bool = True


def quantize_params_int8(params: Params, quant_last: bool = False) -> QuantParams:
    """Per-output-channel symmetric int8 quantization of the weight matrices.

    Call on ALREADY-FOLDED eval params (fold_eval_params) so the parity
    dropout keep-prob scaling is baked in before scales are computed.
    """
    n = len(params["w"])
    wq, sw, w_f32 = [], [], []
    for l, w in enumerate(params["w"]):
        if l == n - 1 and not quant_last:
            wq.append(None)
            sw.append(None)
            w_f32.append(w)
            continue
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / _QMAX
        q = jnp.clip(jnp.round(w / s), -_QMAX, _QMAX).astype(jnp.int8)
        wq.append(q)
        sw.append(s.astype(jnp.float32))
        w_f32.append(None)
    return QuantParams(
        wq=tuple(wq),
        sw=tuple(sw),
        w_f32=tuple(w_f32),
        b=tuple(params["b"]),
        skip_last=not quant_last,
    )


def _quantize_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-row symmetric int8: returns (x_q int8, scale f32 (rows, 1))."""
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-12) / _QMAX
    xq = jnp.clip(jnp.round(x / sx), -_QMAX, _QMAX).astype(jnp.int8)
    return xq, sx


def _int8_matmul(xq: jnp.ndarray, wq: jnp.ndarray) -> jnp.ndarray:
    """int8 x int8 -> int32 on the MXU (preferred_element_type drives the
    s8 systolic path; see pallas_guide: int8 matmul peak ~2x bf16 on v5e)."""
    return jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def forward_eval_int8(qp: QuantParams, x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Quantized inference forward: (batch, n_in) -> (batch, n_out).

    cfg must be the dropout-free eval config from fold_eval_params (the
    keep-prob compensation is already folded into the quantized weights).
    """
    if cfg.use_dropout:
        raise ValueError("forward_eval_int8 expects folded eval params/config")
    n_layers = len(qp.b)
    h = x
    for l in range(n_layers):
        if qp.wq[l] is None:
            y = (
                jax.lax.dot(
                    h.astype(jnp.bfloat16),
                    qp.w_f32[l].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                + qp.b[l]
            )
        else:
            hq, sx = _quantize_rows(h)
            acc = _int8_matmul(hq, qp.wq[l])
            y = acc.astype(jnp.float32) * (sx * qp.sw[l][None, :]) + qp.b[l]
        h = _act(cfg.hidden if l < n_layers - 1 else cfg.output, y)
    return h
