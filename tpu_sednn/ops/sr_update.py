"""Stochastic-rounding momentum update for bf16-resident weights.

The bunch-128 training step is HBM-bound on weight+momentum traffic
(BASELINE.md).  Keeping params AND momentum in bfloat16 halves that traffic;
plain bf16 rounding would bias tiny updates to zero (the reference's
effective per-step delta is ~1e-5 of weight scale), so the update is computed
in f32 and stochastically rounded with the TPU hardware PRNG
(pltpu.stochastic_round) — unbiased quantization, the standard TPU production
recipe for low-precision optimizer state.

Clean-mode only: parity mode stays f32 (the reference is fp32 end-to-end).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# seed spacing between layers; callers advance the step seed by small
# increments, so (layer, block, step) streams stay disjoint in practice
_LAYER_SEED_STRIDE = 1_000_003


def _sr_kernel(seed_ref, scal_ref, w_ref, d_ref, g_ref, w_out, d_out):
    # large odd stride per block so no two (layer, block, step) combinations
    # share a PRNG stream (callers stride layer seeds by _LAYER_SEED_STRIDE)
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * jnp.int32(7919))
    m = scal_ref[0]
    lr = scal_ref[1]
    wc = scal_ref[2]
    w = w_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    nd = m * d_ref[:].astype(jnp.float32) - lr * (g + wc * w)
    bits_d = pltpu.bitcast(pltpu.prng_random_bits(nd.shape), jnp.uint32)
    d_out[:] = pltpu.stochastic_round(nd, bits_d, target_dtype=jnp.bfloat16)
    bits_w = pltpu.bitcast(pltpu.prng_random_bits(nd.shape), jnp.uint32)
    w_out[:] = pltpu.stochastic_round(w + nd, bits_w, target_dtype=jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def sr_momentum_update(
    w: jnp.ndarray,      # (K, N) bfloat16
    delta: jnp.ndarray,  # (K, N) bfloat16
    g: jnp.ndarray,      # (K, N) gradient (bf16 or f32)
    seed: jnp.ndarray,   # int32 scalar
    momentum: jnp.ndarray,
    lrate: jnp.ndarray,
    weightcost: jnp.ndarray,
    block_rows: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (w', delta') in bfloat16 with stochastic rounding.

    Falls back to nearest-rounding XLA math off-TPU.
    """
    if jax.default_backend() != "tpu":
        nd = momentum * delta.astype(jnp.float32) - lrate * (
            g.astype(jnp.float32) + weightcost * w.astype(jnp.float32)
        )
        return (w.astype(jnp.float32) + nd).astype(jnp.bfloat16), nd.astype(jnp.bfloat16)

    orig_shape = w.shape
    if w.ndim == 1:  # biases: treat as one row block
        w, delta, g = w.reshape(1, -1), delta.reshape(1, -1), g.reshape(1, -1)
    K, N = w.shape
    rb = min(block_rows, K)
    n_blocks = (K + rb - 1) // rb
    pad = n_blocks * rb - K
    if pad:
        w = jnp.pad(w, ((0, pad), (0, 0)))
        delta = jnp.pad(delta, ((0, pad), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0)))
    scal = jnp.stack([jnp.float32(momentum), jnp.float32(lrate), jnp.float32(weightcost)])
    w_, d_ = pl.pallas_call(
        _sr_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks * rb, N), jnp.bfloat16),
            jax.ShapeDtypeStruct((n_blocks * rb, N), jnp.bfloat16),
        ),
    )(seed.reshape(1).astype(jnp.int32), scal, w, delta, g)
    if pad:
        w_, d_ = w_[:K], d_[:K]
    return w_.reshape(orig_shape), d_.reshape(orig_shape)


def sr_train_step(state, x, t, cfg, opt, rng, seed):
    """Clean training step with bf16 params/momentum + stochastic rounding.

    state params/deltas must be bfloat16 pytrees.  Returns (state', loss).
    """
    from tpu_sednn.model.mlp import forward
    from tpu_sednn.train.step import TrainState

    def loss_fn(p):
        out = forward(p, x, cfg, train=True, rng=rng, compute_dtype=jnp.bfloat16)
        return jnp.mean((out - t.astype(jnp.float32)) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    new_w, new_dw, new_b, new_db = [], [], [], []
    for l, (w, d, g) in enumerate(zip(state.params["w"], state.deltas["w"], grads["w"])):
        w_, d_ = sr_momentum_update(
            w, d, g, seed + _LAYER_SEED_STRIDE * l, jnp.float32(opt.momentum),
            jnp.float32(opt.lrate), jnp.float32(opt.weightcost),
        )
        new_w.append(w_)
        new_dw.append(d_)
    for l, (b, d, g) in enumerate(zip(state.params["b"], state.deltas["b"], grads["b"])):
        b_, d_ = sr_momentum_update(
            b, d, g, seed + _LAYER_SEED_STRIDE * (100 + l), jnp.float32(opt.momentum),
            jnp.float32(opt.lrate), jnp.float32(0.0),
        )
        new_b.append(b_)
        new_db.append(d_)
    return (
        TrainState(
            params={"w": tuple(new_w), "b": tuple(new_b)},
            deltas={"w": tuple(new_dw), "b": tuple(new_db)},
            step=state.step + 1,
        ),
        loss,
    )
