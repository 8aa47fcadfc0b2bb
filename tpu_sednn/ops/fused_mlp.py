"""Pallas TPU kernels for the MLP hot path.

The reference's hot loop is a chain of cuBLAS GEMMs + elementwise kernels per
bunch (train_bunch_single, /root/reference/BP_GPU.cu:484-673).  On TPU at
bunch 128 the step is HBM-bandwidth-bound on WEIGHT traffic (47 MB of params
per GEMM pass), so the Pallas win is fusing every pass over a weight matrix
into a single read:

* `fused_linear_act`  — y = act(x @ W + b): bias broadcast + activation fused
  into the matmul epilogue (one W read).
* `fused_bwd_update`  — for one layer, a SINGLE kernel computes
      dedy_prev = dedx @ W^T          (needs W)
      G         = y_prev^T @ dedx     (weight gradient)
      delta'    = m*delta - c*(G/n + wc*W)
      W'        = W + delta'
      g_b       = sum_batch dedx ; delta_b' ; b'
  reading W and delta exactly once and writing W' and delta' exactly once —
  the XLA schedule materializes G to HBM and re-reads W for the update.

Tiling: grid (K/BK, N/BN); dedy accumulates across the N-axis grid steps into
a K-indexed output block (revisited, init on first step).  All matmuls hit
the MXU with f32 accumulation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_block(dim: int, prefer: int) -> int:
    """Largest MXU-aligned block size that tiles `dim` exactly."""
    for cand in (prefer, 512, 256, 128):
        if cand <= dim and dim % cand == 0:
            return cand
    raise ValueError(f"dimension {dim} is not a multiple of 128")


# ---------------------------------------------------------------------------
# forward: y = act(x @ W + b)
# ---------------------------------------------------------------------------

def _dot(a, b, bf16: bool, transpose: int = 0):
    """MXU matmul with f32 accumulation.  bf16=True casts inputs to bfloat16
    first — the SAME numerics as XLA's DEFAULT f32 matmul precision on TPU,
    but ~8x faster than Mosaic's true-f32 dot (measured on v5e)."""
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    dims = ((((1,), (1,)), ((), ())) if transpose == 1       # a @ b.T
            else (((0,), (0,)), ((), ())) if transpose == 2  # a.T @ b
            else (((1,), (0,)), ((), ())))
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


def _fwd_kernel(x_ref, w_ref, b_ref, y_ref, *, act: str, bf16: bool):
    y = _dot(x_ref[:], w_ref[:], bf16)
    y = y + b_ref[:]
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "sigmoid":
        y = jax.nn.sigmoid(y)
    y_ref[:] = y


@functools.partial(jax.jit, static_argnames=("act", "block_n", "interpret", "bf16"))
def fused_linear_act(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                     act: str = "linear", block_n: int = 512,
                     interpret: bool = False, bf16: bool = True) -> jnp.ndarray:
    """(B, K) @ (K, N) + (N,) -> act -> (B, N).  K, N should be 128-aligned
    (the canonical layers are); unaligned shapes fall back to plain XLA."""
    B, K = x.shape
    K2, N = w.shape
    assert K == K2
    if K % 128 or N % 128 or B % 8:
        y = x @ w + b
        return jnp.maximum(y, 0) if act == "relu" else (
            jax.nn.sigmoid(y) if act == "sigmoid" else y)
    bn = _pick_block(N, block_n)
    grid = (N // bn,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, act=act, bf16=bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        interpret=interpret,
    )(x, w, b.reshape(1, N))


# ---------------------------------------------------------------------------
# fused backward + momentum update for one layer
# ---------------------------------------------------------------------------

def _bwd_kernel(scal_ref, dedx_ref, yprev_ref, w_ref, delta_ref, b_ref, db_ref,
                w_out, delta_out, dedy_out, b_out, db_out, *, bf16: bool):
    """Grid (nk, nn), nn fastest.  Block shapes:
    dedx (B, BN), yprev (B, BK), w/delta (BK, BN), dedy (B, BK) accumulated
    over nn; b/db (1, BN) updated once per nn column (at k == 0).
    scal = [momentum, c (=(1-m)*lr), inv_n, weightcost] in SMEM.
    """
    k = pl.program_id(0)
    j = pl.program_id(1)
    m = scal_ref[0]
    c = scal_ref[1]
    inv_n = scal_ref[2]
    wc = scal_ref[3]

    dedx = dedx_ref[:]
    w = w_ref[:]

    # dedy accumulation: dedx @ W^T contribution of this N tile
    part = _dot(dedx, w, bf16, transpose=1)  # (B, BK)

    @pl.when(j == 0)
    def _():
        dedy_out[:] = part

    @pl.when(j > 0)
    def _():
        dedy_out[:] = dedy_out[:] + part

    # weight gradient for this (K, N) tile + momentum update, single pass
    g = _dot(yprev_ref[:], dedx, bf16, transpose=2)  # (BK, BN)
    new_delta = m * delta_ref[:] - c * (g * inv_n + wc * w)
    delta_out[:] = new_delta
    w_out[:] = w + new_delta

    # bias: update once per column block (on the first K step)
    @pl.when(k == 0)
    def _():
        g_b = jnp.sum(dedx, axis=0, keepdims=True)
        new_db = m * db_ref[:] - c * (g_b * inv_n)
        db_out[:] = new_db
        b_out[:] = b_ref[:] + new_db


@functools.partial(jax.jit, static_argnames=("block_k", "block_n", "interpret", "bf16"))
def fused_bwd_update(
    dedx: jnp.ndarray,     # (B, N) upstream gradient dE/dx of this layer
    y_prev: jnp.ndarray,   # (B, K) layer input (post-dropout)
    w: jnp.ndarray,        # (K, N)
    delta: jnp.ndarray,    # (K, N) momentum buffer
    b: jnp.ndarray,        # (N,)
    delta_b: jnp.ndarray,  # (N,)
    momentum: jnp.ndarray,
    lrate: jnp.ndarray,
    inv_n: jnp.ndarray,    # 1 / bunchsize
    weightcost: jnp.ndarray,
    block_k: int = 512,
    block_n: int = 512,
    interpret: bool = False,
    bf16: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (w', delta', dedy_prev, b', delta_b') with one read/write of W/delta.

    Implements exactly the reference rule delta' = m*delta - (1-m)*lr*(G/n +
    wc*W); the caller multiplies dedy_prev by the activation derivative.
    """
    B, N = dedx.shape
    _, K = y_prev.shape
    assert w.shape == (K, N)
    if B % 8:
        raise ValueError(f"batch {B} must be a multiple of 8")
    bk = _pick_block(K, block_k)
    bn = _pick_block(N, block_n)
    nk, nn = K // bk, N // bn

    scal = jnp.stack([
        jnp.float32(momentum),
        (1.0 - jnp.float32(momentum)) * jnp.float32(lrate),
        jnp.float32(inv_n),
        jnp.float32(weightcost),
    ])

    grid = (nk, nn)
    out_shape = (
        jax.ShapeDtypeStruct((K, N), jnp.float32),  # w'
        jax.ShapeDtypeStruct((K, N), jnp.float32),  # delta'
        jax.ShapeDtypeStruct((B, K), jnp.float32),  # dedy
        jax.ShapeDtypeStruct((1, N), jnp.float32),  # b'
        jax.ShapeDtypeStruct((1, N), jnp.float32),  # delta_b'
    )
    w_, d_, dedy, b_, db_ = pl.pallas_call(
        functools.partial(_bwd_kernel, bf16=bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
            pl.BlockSpec((B, bn), lambda k, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, bk), lambda k, j: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda k, j: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda k, j: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda k, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda k, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bk, bn), lambda k, j: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda k, j: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, bk), lambda k, j: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda k, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda k, j: (0, j), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(scal, dedx, y_prev, w, delta, b.reshape(1, N), delta_b.reshape(1, N))
    return w_, d_, dedy, b_.reshape(N), db_.reshape(N)
