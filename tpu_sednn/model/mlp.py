"""Feed-forward regression DNN — the reference's one model family, TPU-first.

Semantics mirrored from /root/reference (with citations), architecture not:
parameters are a pytree of (prev, cur) matrices used as `y = x @ W + b` on
row-major batches, everything jit/vmap/pjit-friendly.

Reference behaviors covered:
* hidden activation ReLU (DevFunc.cu:67-97, the "kernSigmoid that is ReLU")
  or true sigmoid (the .bak originals); linear or sigmoid output head
  (linear LPS regression per BP_GPU.cu:570; sigmoid head for IRM/IBM masks).
* training dropout masks the INPUT of every layer without rescaling
  (BP_GPU.cu:536-551: visible_omit on the net input, hid_omit on each hidden
  activation), and inference compensates by scaling weights by keep-prob
  (cv_bunch_single, BP_GPU.cu:726-746).  That exact pair is `parity` mode;
  `inverted` mode is the modern equivalent (mask+rescale at train, identity
  at eval).
* init schemes: uniform [min,max] via the parity rand48 stream
  (Interface::GetRandWeight, Interface.cc:1036-1042) and the Gen_rand_net
  formulas (toolbox/weights/gen_rand_net/Gen_rand_net.cpp:84-97):
  U(±beta/sqrt(n_in)) or Glorot U(±beta*sqrt(6)/sqrt(n_in+n_out)).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Tuple[jnp.ndarray, ...]]


@dataclass(frozen=True)
class ModelConfig:
    layersizes: Tuple[int, ...] = (1548, 2048, 2048, 2048, 129)
    hidden: str = "relu"  # "relu" | "sigmoid"
    output: str = "linear"  # "linear" | "sigmoid" (mask head) | "softmax"
    dropout_vis: float = 0.0  # visible_omit
    dropout_hid: float = 0.0  # hid_omit
    dropout_mode: str = "parity"  # "parity" | "inverted"
    # matmul precision: "default" = TPU bf16-input/f32-accumulate (fast),
    # "highest" = true fp32 (for strict numerical parity with the reference's
    # cuBLAS SGEMM; ~3-8x slower on the MXU)
    precision: str = "default"
    # dropout mask source: "threefry" (jax.random; reproducible across
    # backends) or "tpu_prng" (Pallas hardware PRNG — threefry mask
    # generation costs ~30-50% of a training step at large bunch sizes)
    dropout_rng: str = "threefry"

    @property
    def num_layers(self) -> int:
        return len(self.layersizes)

    @property
    def use_dropout(self) -> bool:
        return self.dropout_vis > 0.0 or self.dropout_hid > 0.0

    def with_dropout(self, vis: float, hid: float, mode: str = "parity") -> "ModelConfig":
        return replace(self, dropout_vis=vis, dropout_hid=hid, dropout_mode=mode)


def _act(name: str, x: jnp.ndarray) -> jnp.ndarray:
    if name == "relu":
        return jax.nn.relu(x)
    if name == "sigmoid":
        return jax.nn.sigmoid(x)
    if name == "softmax":
        # classification head — the analog of the reference's kernSoftmax
        # (DevFunc.cu:100, dead code in the shipped trainer path but part of
        # the kernel surface); train via clean_train_step/jax.grad or
        # softmax_xent_loss (the resident megakernel covers linear/sigmoid)
        return jax.nn.softmax(x, axis=-1)
    if name == "linear":
        return x
    raise ValueError(f"unknown activation {name}")


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_params(
    key: jax.Array,
    cfg: ModelConfig,
    scheme: str = "glorot",
    beta: float = 1.0,
    w_range: Tuple[float, float] = (-0.1, 0.1),
    b_range: Tuple[float, float] = (0.0, 0.0),
) -> Params:
    """Random init.

    scheme:
      "uniform"  — U[w_range] for weights, U[b_range] for biases
                   (BPtrain's in-process init, Interface.cc:338-350)
      "fanin"    — U(±beta/sqrt(n_in)), zero bias (Gen_rand_net flag 0)
      "glorot"   — U(±beta*sqrt(6)/sqrt(n_in+n_out)), zero bias
                   (Gen_rand_net flag 1, Gen_rand_net.cpp:89-97)
    """
    ws: List[jnp.ndarray] = []
    bs: List[jnp.ndarray] = []
    sizes = cfg.layersizes
    for i in range(1, len(sizes)):
        key, kw, kb = jax.random.split(key, 3)
        n_in, n_out = sizes[i - 1], sizes[i]
        if scheme == "uniform":
            w = jax.random.uniform(kw, (n_in, n_out), jnp.float32, w_range[0], w_range[1])
            b = jax.random.uniform(kb, (n_out,), jnp.float32, b_range[0], b_range[1])
        elif scheme == "fanin":
            r = beta / np.sqrt(n_in)
            w = jax.random.uniform(kw, (n_in, n_out), jnp.float32, -r, r)
            b = jnp.zeros((n_out,), jnp.float32)
        elif scheme == "glorot":
            r = beta * np.sqrt(6.0) / np.sqrt(n_in + n_out)
            w = jax.random.uniform(kw, (n_in, n_out), jnp.float32, -r, r)
            b = jnp.zeros((n_out,), jnp.float32)
        else:
            raise ValueError(f"unknown init scheme {scheme}")
        ws.append(w)
        bs.append(b)
    return {"w": tuple(ws), "b": tuple(bs)}


def init_params_parity(rand: Any, cfg: ModelConfig, w_min: float, w_max: float,
                       b_min: float, b_max: float) -> Params:
    """Bit-exact reference init: drand48 stream, weights then bias per layer
    in file order (Interface.cc:338-350).  `rand` is a tpu_sednn.data.rand48.Rand48.

    The reference fills its column-major (cur, prev) buffer sequentially; our
    (prev, cur) row-major matrix has identical flat layout, so a straight
    reshape reproduces it element-for-element.
    """
    ws, bs = [], []
    sizes = cfg.layersizes
    for i in range(1, len(sizes)):
        n_in, n_out = sizes[i - 1], sizes[i]
        ws.append(jnp.asarray(rand.uniform(w_min, w_max, n_in * n_out).reshape(n_in, n_out)))
        bs.append(jnp.asarray(rand.uniform(b_min, b_max, n_out)))
    return {"w": tuple(ws), "b": tuple(bs)}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _dropout_mask(key: jax.Array, shape, omit: float, impl: str = "threefry") -> jnp.ndarray:
    """Reference mask: zero where uniform < omit (kernDropout, DevFunc.cu:34-45)."""
    if impl == "tpu_prng":
        from tpu_sednn.ops.dropout_pallas import dropout_mask_pallas

        seed = jax.random.bits(key, dtype=jnp.uint32).astype(jnp.int32)  # one scalar
        return dropout_mask_pallas(seed, tuple(shape), omit)
    return (jax.random.uniform(key, shape) >= omit).astype(jnp.float32)


def forward(
    params: Params,
    x: jnp.ndarray,
    cfg: ModelConfig,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
    compute_dtype: jnp.dtype | None = None,
    dropout_masks: Sequence[jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """Batched forward pass; (batch, n_in) -> (batch, n_out).

    train=True applies dropout per cfg.dropout_mode; train=False applies the
    matching inference compensation (weight-scaling in parity mode).
    compute_dtype=jnp.bfloat16 runs the matmuls on the MXU in bf16 with f32
    accumulation (clean mode only; parity runs pure f32).
    dropout_masks: optional per-layer explicit 0/1 masks (for parity testing
    against an external reference); overrides rng-generated masks.
    """
    if not train:
        return forward_eval(params, x, cfg, compute_dtype=compute_dtype)

    n_layers = len(params["w"])
    use_do = cfg.use_dropout
    if use_do and rng is None and dropout_masks is None:
        raise ValueError("dropout training requires rng or explicit masks")
    keys = (
        jax.random.split(rng, n_layers)
        if (use_do and dropout_masks is None)
        else [None] * n_layers
    )

    h = x
    for l, (w, b) in enumerate(zip(params["w"], params["b"])):
        if use_do:
            omit = cfg.dropout_vis if l == 0 else cfg.dropout_hid
            if omit > 0.0:
                mask = (
                    dropout_masks[l]
                    if dropout_masks is not None
                    else _dropout_mask(keys[l], h.shape, omit, cfg.dropout_rng)
                )
                h = h * mask
                if cfg.dropout_mode == "inverted":
                    h = h / (1.0 - omit)
        h = _matmul_bias(h, w, b, compute_dtype, cfg.precision)
        if l < n_layers - 1:
            h = _act(cfg.hidden, h)
        else:
            h = _act(cfg.output, h)
    return h


def forward_eval(
    params: Params,
    x: jnp.ndarray,
    cfg: ModelConfig,
    *,
    compute_dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """Inference forward.

    parity dropout mode: every layer's weights scaled by its input keep-prob
    (layer 0 by 1-visible_omit, all others by 1-hid_omit), exactly like
    cv_bunch_single's DevWeightMultiP bracket (BP_GPU.cu:726-746).
    inverted mode: no compensation needed.
    """
    n_layers = len(params["w"])
    h = x
    for l, (w, b) in enumerate(zip(params["w"], params["b"])):
        if cfg.use_dropout and cfg.dropout_mode == "parity":
            keep = 1.0 - (cfg.dropout_vis if l == 0 else cfg.dropout_hid)
            w = w * keep
        h = _matmul_bias(h, w, b, compute_dtype, cfg.precision)
        h = _act(cfg.hidden if l < n_layers - 1 else cfg.output, h)
    return h


def _matmul_bias(h, w, b, compute_dtype, precision: str = "default"):
    prec = jax.lax.Precision.HIGHEST if precision == "highest" else None
    if compute_dtype is not None:
        y = jax.lax.dot(
            h.astype(compute_dtype), w.astype(compute_dtype),
            precision=prec, preferred_element_type=jnp.float32,
        )
    else:
        y = jnp.matmul(h, w, precision=prec)
    return y + b


def fold_eval_params(params: Params, cfg: ModelConfig) -> Tuple[Params, ModelConfig]:
    """Pre-fold the parity-mode inference compensation into the weights ONCE.

    cv_bunch_single scales every layer's weights by its input keep-prob around
    each GEMM (BP_GPU.cu:726-746); forward_eval reproduces that per call,
    which re-reads and re-writes all ~50 MB of weights per dispatch.  For
    serving, fold the scaling in once and run a dropout-free config instead —
    numerically identical output, zero per-call overhead.
    """
    if cfg.use_dropout and cfg.dropout_mode == "parity":
        ws = tuple(
            w * (1.0 - (cfg.dropout_vis if l == 0 else cfg.dropout_hid))
            for l, w in enumerate(params["w"])
        )
        params = {"w": ws, "b": params["b"]}
    return params, replace(cfg, dropout_vis=0.0, dropout_hid=0.0)


# ---------------------------------------------------------------------------
# wts interop
# ---------------------------------------------------------------------------

def params_from_wts(weights: Sequence[np.ndarray], biases: Sequence[np.ndarray]) -> Params:
    return {
        "w": tuple(jnp.asarray(w, jnp.float32) for w in weights),
        "b": tuple(jnp.asarray(b, jnp.float32) for b in biases),
    }


def params_to_wts(params: Params) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    return (
        [np.asarray(w, np.float32) for w in params["w"]],
        [np.asarray(b, np.float32) for b in params["b"]],
    )
