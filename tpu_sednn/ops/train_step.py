"""Hand-rolled fused training step built from the Pallas kernels.

Same math as tpu_sednn.train.step.reference_train_step (the quirk-exact
reference optimizer), but the backward+update runs as one Pallas kernel per
layer (fused_bwd_update), reading and writing each weight/momentum matrix
exactly once per bunch.  This is the TPU analog of the reference's
"train_bunch_single" fused device loop.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from tpu_sednn.model.mlp import ModelConfig, _dropout_mask
from tpu_sednn.ops.fused_mlp import fused_bwd_update, fused_linear_act
from tpu_sednn.train.step import OptConfig, TrainState


def pallas_train_step(
    state: TrainState,
    x: jnp.ndarray,
    t: jnp.ndarray,
    cfg: ModelConfig,
    opt: OptConfig,
    rng: Optional[jax.Array] = None,
    interpret: bool = False,
    valid_sizes=None,
    bf16: bool = True,
) -> TrainState:
    n_layers = len(state.params["w"])
    n = x.shape[0]
    use_do = cfg.use_dropout
    keys = jax.random.split(rng, n_layers) if (use_do and rng is not None) else [None] * n_layers

    # forward, saving post-dropout layer inputs
    ys = []
    h = x
    for l in range(n_layers):
        if use_do:
            omit = cfg.dropout_vis if l == 0 else cfg.dropout_hid
            if omit > 0.0:
                h = h * _dropout_mask(keys[l], h.shape, omit, cfg.dropout_rng)
        ys.append(h)
        act = (cfg.hidden if l < n_layers - 1 else cfg.output)
        h = fused_linear_act(h, state.params["w"][l], state.params["b"][l],
                             act=act, interpret=interpret, bf16=bf16)
        # sigmoid(0) = 0.5 on zero-PADDED hidden units would leak gradients
        # into padded weight rows; zero them so padding stays exact.
        if (
            l < n_layers - 1
            and cfg.hidden == "sigmoid"
            and valid_sizes is not None
            and valid_sizes[l + 1] < h.shape[1]
        ):
            mask = (jnp.arange(h.shape[1]) < valid_sizes[l + 1]).astype(h.dtype)
            h = h * mask
    out = h

    # backward + fused per-layer update
    dedx = (2.0 / n) * (out - t)
    if cfg.output == "sigmoid":  # mask-head extension: chain through sigma'
        dedx = dedx * out * (1.0 - out)
        # sigmoid(0)=0.5 on zero-PADDED output columns gives nonzero dedx
        # there, which would update padded weight columns and leak into dedy
        # for real units; zero it so padding stays exact.
        if valid_sizes is not None and valid_sizes[-1] < out.shape[1]:
            col_ok = (jnp.arange(out.shape[1]) < valid_sizes[-1]).astype(dedx.dtype)
            dedx = dedx * col_ok
    new_w, new_d, new_b, new_db = (
        list(state.params["w"]), list(state.deltas["w"]),
        list(state.params["b"]), list(state.deltas["b"]),
    )
    for l in range(n_layers - 1, -1, -1):
        w_, d_, dedy, b_, db_ = fused_bwd_update(
            dedx, ys[l], state.params["w"][l], state.deltas["w"][l],
            state.params["b"][l], state.deltas["b"][l],
            jnp.float32(opt.momentum), jnp.float32(opt.lrate),
            jnp.float32(1.0 / n), jnp.float32(opt.weightcost),
            interpret=interpret, bf16=bf16,
        )
        new_w[l], new_d[l], new_b[l], new_db[l] = w_, d_, b_, db_
        if l > 0:
            y = ys[l]  # post-dropout activation of layer l-1 (= this GEMM input)
            if cfg.hidden == "relu":
                dedx = jnp.where(y > 0, dedy, 0.0)
            else:  # sigmoid
                dedx = y * (1.0 - y) * dedy
    return TrainState(
        params={"w": tuple(new_w), "b": tuple(new_b)},
        deltas={"w": tuple(new_d), "b": tuple(new_db)},
        step=state.step + 1,
    )


def _round_up(x: int, m: int = 128) -> int:
    return (x + m - 1) // m * m


def _pad_state(state: TrainState, sizes, padded) -> TrainState:
    """Zero-pad params/deltas to 128-aligned layer sizes.

    Exact: padded input features are zero, padded weight rows/cols and biases
    are zero, so padded outputs are zero, padded target entries are zero,
    hence every padded gradient/delta entry stays identically zero.
    """

    def pad_mat(w, pk, pn):
        return jnp.pad(w, ((0, pk - w.shape[0]), (0, pn - w.shape[1])))

    ws = tuple(pad_mat(w, padded[i], padded[i + 1]) for i, w in enumerate(state.params["w"]))
    bs = tuple(jnp.pad(b, (0, padded[i + 1] - b.shape[0])) for i, b in enumerate(state.params["b"]))
    dw = tuple(pad_mat(w, padded[i], padded[i + 1]) for i, w in enumerate(state.deltas["w"]))
    db = tuple(jnp.pad(b, (0, padded[i + 1] - b.shape[0])) for i, b in enumerate(state.deltas["b"]))
    return TrainState(params={"w": ws, "b": bs}, deltas={"w": dw, "b": db}, step=state.step)


def _unpad_state(state: TrainState, sizes) -> TrainState:
    ws = tuple(w[: sizes[i], : sizes[i + 1]] for i, w in enumerate(state.params["w"]))
    bs = tuple(b[: sizes[i + 1]] for i, b in enumerate(state.params["b"]))
    dw = tuple(w[: sizes[i], : sizes[i + 1]] for i, w in enumerate(state.deltas["w"]))
    db = tuple(b[: sizes[i + 1]] for i, b in enumerate(state.deltas["b"]))
    return TrainState(params={"w": ws, "b": bs}, deltas={"w": dw, "b": db}, step=state.step)


def make_pallas_train_chunk(cfg: ModelConfig, opt: OptConfig, interpret: bool = False,
                            bf16: bool = True):
    """lax.scan chunk trainer over the Pallas step (partial bunch dropped).

    Non-128-aligned layer sizes (the canonical 1548/129) are zero-padded once
    per chunk call and sliced back after — exact, and amortized over the
    hundreds of bunches in a chunk.
    """
    import dataclasses

    sizes = cfg.layersizes
    padded = tuple(_round_up(s) for s in sizes)
    needs_pad = padded != tuple(sizes)
    pcfg = dataclasses.replace(cfg, layersizes=padded)  # keep ALL other fields

    @jax.jit
    def run(state: TrainState, in_chunk, targ_chunk, rng,
            lrate=opt.lrate, momentum=opt.momentum, weightcost=opt.weightcost):
        bs = opt.bunchsize
        n_bunches = in_chunk.shape[0] // bs
        if n_bunches == 0:
            return state
        if needs_pad:
            state = _pad_state(state, sizes, padded)
            in_chunk = jnp.pad(in_chunk, ((0, 0), (0, padded[0] - sizes[0])))
            targ_chunk = jnp.pad(targ_chunk, ((0, 0), (0, padded[-1] - sizes[-1])))
        xb = in_chunk[: n_bunches * bs].reshape(n_bunches, bs, in_chunk.shape[1])
        tb = targ_chunk[: n_bunches * bs].reshape(n_bunches, bs, targ_chunk.shape[1])
        rngs = jax.random.split(rng, n_bunches)
        dyn = OptConfig(lrate=lrate, momentum=momentum, weightcost=weightcost, bunchsize=bs)

        def body(st, inp):
            xi, ti, r = inp
            return pallas_train_step(st, xi, ti, pcfg, dyn, rng=r, interpret=interpret,
                                     valid_sizes=sizes if needs_pad else None,
                                     bf16=bf16), None

        state, _ = jax.lax.scan(body, state, (xb, tb, rngs))
        if needs_pad:
            state = _unpad_state(state, sizes)
        return state

    return run
