"""Fused training / evaluation steps.

Two modes:

* **reference parity** (`reference_train_step` / `reference_train_chunk`):
  numerically reproduces the quirk-exact optimizer of
  `BP_GPU::train_bunch_single` (/root/reference/BP_GPU.cu:484-673) +
  `kernUpdatedelta` (/root/reference/DevFunc.cu:313-318):

      dedx_L   = (2/n) * (out - targ)                 (kernSubClean, DevFunc.cu:263)
      G_W      = prev_y^T @ dedx          (raw sum over the bunch, SgemmNT)
      G_b      = sum_batch dedx                        (DevAccSumrow)
      delta   <- m*delta - (1-m)*lr*(G/n + wc*W)       (note the double /n and
      W       <- W + delta                              the (1-m) factor)

  jax.grad of  loss = (1/n) * sum((out-targ)^2)  yields exactly G_W/G_b above
  (including the dropout-mask chain), so parity mode is jax.grad + a custom
  momentum rule — fully fused into one XLA program per chunk via lax.scan.
  Further parity quirks honored: the trailing partial bunch is dropped
  (BP_GPU.cu:315-318), dropout does not rescale at train time, pure fp32.

* **clean** (`clean_train_step`): modern equivalent — mean MSE, inverted
  dropout, standard Polyak momentum (optionally Nesterov-free, matching
  reference semantics minus the quirks), bf16 matmuls on the MXU.

Both are single jitted programs: forward + backward + optimizer update fuse
into one XLA executable, the TPU-native analog of the reference's
"one fused device loop per bunch".
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from tpu_sednn.model.mlp import ModelConfig, Params, forward, forward_eval


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: Params
    deltas: Params  # momentum buffers, same structure as params
    step: jnp.ndarray  # int32 scalar


def init_train_state(params: Params) -> TrainState:
    deltas = jax.tree.map(jnp.zeros_like, params)
    return TrainState(params=params, deltas=deltas, step=jnp.zeros((), jnp.int32))


@dataclass(frozen=True)
class OptConfig:
    lrate: float = 1.0
    momentum: float = 0.5
    weightcost: float = 0.0
    bunchsize: int = 128


# ---------------------------------------------------------------------------
# reference-parity path
# ---------------------------------------------------------------------------

def _parity_loss(params: Params, x, t, cfg: ModelConfig, rng, masks=None):
    out = forward(params, x, cfg, train=True, rng=rng, dropout_masks=masks)
    n = x.shape[0]
    return jnp.sum((out - t) ** 2) / n


def reference_train_step(
    state: TrainState,
    x: jnp.ndarray,
    t: jnp.ndarray,
    cfg: ModelConfig,
    opt: OptConfig,
    rng: jax.Array | None = None,
    dropout_masks=None,
) -> TrainState:
    """One bunch of SGD with the reference's exact update rule."""
    n = x.shape[0]
    grads = jax.grad(_parity_loss)(state.params, x, t, cfg, rng, dropout_masks)

    m, lr, wc = opt.momentum, opt.lrate, opt.weightcost

    def upd_w(delta, w, g):
        new_delta = m * delta - (1.0 - m) * lr * (g / n + wc * w)
        return new_delta, w + new_delta

    def upd_b(delta, b, g):
        new_delta = m * delta - (1.0 - m) * lr * (g / n)  # weightcost=0 for bias
        return new_delta, b + new_delta

    new = [upd_w(d, w, g) for d, w, g in zip(state.deltas["w"], state.params["w"], grads["w"])]
    new_dw, new_w = zip(*new)
    new = [upd_b(d, b, g) for d, b, g in zip(state.deltas["b"], state.params["b"], grads["b"])]
    new_db, new_b = zip(*new)
    return TrainState(
        params={"w": tuple(new_w), "b": tuple(new_b)},
        deltas={"w": tuple(new_dw), "b": tuple(new_db)},
        step=state.step + 1,
    )


def reference_train_chunk(
    state: TrainState,
    in_chunk: jnp.ndarray,
    targ_chunk: jnp.ndarray,
    cfg: ModelConfig,
    opt: OptConfig,
    rng: jax.Array,
) -> TrainState:
    """Train over a whole chunk: lax.scan over full bunches, partial dropped.

    Mirrors BP_GPU::train (BP_GPU.cu:241-331): the chunk lives on device, the
    scan body is the fused step, the trailing `n % bunchsize` samples are
    skipped exactly like the reference (BP_GPU.cu:315-318).
    """
    n = in_chunk.shape[0]
    bs = opt.bunchsize
    n_bunches = n // bs
    if n_bunches == 0:  # chunk smaller than one bunch: all samples dropped
        return state
    xb = in_chunk[: n_bunches * bs].reshape(n_bunches, bs, in_chunk.shape[1])
    tb = targ_chunk[: n_bunches * bs].reshape(n_bunches, bs, targ_chunk.shape[1])
    rngs = jax.random.split(rng, n_bunches)

    def body(st, inputs):
        x, t, r = inputs
        return reference_train_step(st, x, t, cfg, opt, rng=r), None

    state, _ = jax.lax.scan(body, state, (xb, tb, rngs))
    return state


def make_jit_train_chunk(cfg: ModelConfig, opt: OptConfig):
    """jit-compiled chunk trainer.

    Model config and bunchsize are static (shape-determining); lrate/momentum/
    weightcost are passed as dynamic scalars so per-epoch schedule changes
    (the recipe's momentum ramp) do NOT trigger recompilation.
    """
    bunchsize = opt.bunchsize

    @jax.jit
    def run(state: TrainState, in_chunk, targ_chunk, rng,
            lrate=opt.lrate, momentum=opt.momentum, weightcost=opt.weightcost):
        dyn_opt = OptConfig(lrate=lrate, momentum=momentum, weightcost=weightcost,
                            bunchsize=bunchsize)
        return reference_train_chunk(state, in_chunk, targ_chunk, cfg, dyn_opt, rng)

    return run


# ---------------------------------------------------------------------------
# clean path
# ---------------------------------------------------------------------------

def clean_train_step(
    state: TrainState,
    x: jnp.ndarray,
    t: jnp.ndarray,
    cfg: ModelConfig,
    opt: OptConfig,
    rng: jax.Array | None = None,
    compute_dtype=jnp.bfloat16,
) -> Tuple[TrainState, jnp.ndarray]:
    """Modern training step: mean-MSE, Polyak momentum, bf16 matmuls.

    Returns (new_state, loss).  Expects cfg.dropout_mode == "inverted" when
    dropout is enabled.
    """

    def loss_fn(p):
        out = forward(p, x, cfg, train=True, rng=rng, compute_dtype=compute_dtype)
        return jnp.mean((out - t) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    m, lr, wc = opt.momentum, opt.lrate, opt.weightcost

    def upd(delta, p, g, with_wc):
        g = g + (wc * p if with_wc else 0.0)
        new_delta = m * delta - lr * g
        return new_delta, p + new_delta

    new = [upd(d, w, g, True) for d, w, g in zip(state.deltas["w"], state.params["w"], grads["w"])]
    new_dw, new_w = zip(*new)
    new = [upd(d, b, g, False) for d, b, g in zip(state.deltas["b"], state.params["b"], grads["b"])]
    new_db, new_b = zip(*new)
    return (
        TrainState(
            params={"w": tuple(new_w), "b": tuple(new_b)},
            deltas={"w": tuple(new_dw), "b": tuple(new_db)},
            step=state.step + 1,
        ),
        loss,
    )


def softmax_xent_train_step(
    state: TrainState,
    x: jnp.ndarray,
    labels: jnp.ndarray,
    cfg: ModelConfig,
    opt: OptConfig,
    rng: jax.Array | None = None,
    compute_dtype=jnp.bfloat16,
) -> Tuple[TrainState, jnp.ndarray]:
    """Softmax classification step — the WORKING analog of the reference's
    shipped-but-dead softmax/binary kernels (kernSoftmax DevFunc.cu:100,
    kernBinary DevFunc.cu:4; neither is called by the trainer path).

    cfg.output must be "softmax"; `labels` is either int32 class ids
    (batch,) or one-hot/(soft) targets (batch, n_out).  Loss is mean
    cross-entropy computed from logits via log_softmax (numerically stable);
    the update is the clean Polyak-momentum rule.
    """
    from dataclasses import replace as _replace

    if cfg.output != "softmax":
        raise ValueError("softmax_xent_train_step requires cfg.output='softmax'")
    logits_cfg = _replace(cfg, output="linear")
    n_out = cfg.layersizes[-1]
    t1h = (jax.nn.one_hot(labels, n_out, dtype=jnp.float32)
           if labels.ndim == 1 else labels)

    def loss_fn(p):
        logits = forward(p, x, logits_cfg, train=True, rng=rng,
                         compute_dtype=compute_dtype)
        return -jnp.mean(jnp.sum(t1h * jax.nn.log_softmax(logits), axis=-1))

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    m, lr, wc = opt.momentum, opt.lrate, opt.weightcost

    def upd(delta, p, g, with_wc):
        g = g + (wc * p if with_wc else 0.0)
        new_delta = m * delta - lr * g
        return new_delta, p + new_delta

    new = [upd(d, w, g, True) for d, w, g in
           zip(state.deltas["w"], state.params["w"], grads["w"])]
    new_dw, new_w = zip(*new)
    new = [upd(d, b, g, False) for d, b, g in
           zip(state.deltas["b"], state.params["b"], grads["b"])]
    new_db, new_b = zip(*new)
    return (
        TrainState(
            params={"w": tuple(new_w), "b": tuple(new_b)},
            deltas={"w": tuple(new_dw), "b": tuple(new_db)},
            step=state.step + 1,
        ),
        loss,
    )


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def cv_forward_and_sqerr(params: Params, x: jnp.ndarray, t: jnp.ndarray, cfg: ModelConfig):
    """(outputs, total squared error) for a CV batch — the outputs feed the
    optional CV_out.txt dump (the reference's golden-output debugging channel,
    BP_GPU.cu:443-473: one "%f "-separated line per frame, writer shipped
    commented out)."""
    out = forward_eval(params, x, cfg)
    return out, jnp.sum((out - t) ** 2)


@partial(jax.jit, static_argnames=("cfg",))
def cv_squared_error_masked(params: Params, x: jnp.ndarray, t: jnp.ndarray,
                            n_valid: jnp.ndarray, cfg: ModelConfig):
    """Squared error over the first n_valid rows of a capacity-padded CV
    chunk (the device-splice path pads every chunk to fixed shapes so one
    compiled program serves the epoch; padded rows hold garbage)."""
    out = forward_eval(params, x, cfg)
    mask = (jnp.arange(x.shape[0]) < n_valid)[:, None]
    return jnp.sum(jnp.where(mask, (out - t) ** 2, 0.0))


@partial(jax.jit, static_argnames=("cfg",))
def cv_squared_error(params: Params, x: jnp.ndarray, t: jnp.ndarray, cfg: ModelConfig):
    """Total squared error over a CV batch (the reference's CV metric).

    BPtrain accumulates sum((out-targ)^2) over all CV samples and divides by
    cv_total_samples at the end (BPtrain.cc:61-87, BP_GPU.cu:458-467); the
    caller does the final division.  Forward uses the parity inference path
    (weight-scaling when dropout is configured).
    """
    out = forward_eval(params, x, cfg)
    return jnp.sum((out - t) ** 2)
