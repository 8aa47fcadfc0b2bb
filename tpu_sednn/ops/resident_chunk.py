"""VMEM-resident whole-chunk training megakernel.

The reference trains bunch-by-bunch, re-touching every weight/momentum matrix
in device memory per bunch (BP_GPU::train, /root/reference/BP_GPU.cu:241-331;
train_bunch_single :484-673).  On TPU v5e-class chips the whole canonical
model state — padded weights + momentum, ~99 MB fp32 — fits in VMEM, so this
kernel pins it there for an ENTIRE chunk:

* one `pallas_call`, grid = (n_bunches,): each grid step is a full
  forward + backward + reference-exact momentum update for one bunch of 128;
* at step 0 the weights/deltas/biases are DMA'd HBM->VMEM scratch once;
* every bunch streams only its (128, n_in) inputs and (128, n_out) targets
  from HBM (~1 MB) — per-bunch HBM weight traffic is ZERO;
* at the last step the final state is DMA'd back to the outputs.

This is the TPU-native answer to the reference's fused device loop: instead
of a chain of cuBLAS GEMMs + elementwise kernels over HBM-resident state, the
whole SGD recurrence runs out of on-chip memory at MXU speed.

Math is identical to train/step.py:reference_train_step (the quirk-exact
update rule: dedx_L = (2/n)(out-t), raw-sum gradients, delta = m*delta -
(1-m)*lr*(G/n + wc*W), partial bunch dropped by the caller) with bf16-input
f32-accumulate matmuls (XLA DEFAULT precision).  Dropout masks come from the
TPU hardware PRNG in-kernel (parity semantics: mask without train-time
rescale; "inverted" rescales), seeded per (seed, bunch, layer) — same
semantics as ops/dropout_pallas.py, not bit-identical streams.

Interpret-mode (CPU) support: exact for dropout-free configs; the mosaic
interpreter returns degenerate PRNG bits, so dropout behavior is validated on
real TPU (tests cover the no-dropout parity math).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_sednn.model.mlp import ModelConfig
from tpu_sednn.ops.fused_mlp import _dot
from tpu_sednn.ops.train_step import _pad_state, _round_up, _unpad_state
from tpu_sednn.train.step import OptConfig, TrainState

# seed strides: distinct PRNG streams per (bunch, layer) mask
_BUNCH_STRIDE = 7919
_LAYER_STRIDE = 104729


def _row_blocks(dim: int):
    """Row-tiles (offset, size) for the in-place weight update: greedy large
    blocks bound the (rb, N) gradient temporary, keep slices sublane-aligned,
    and minimize the dot count for non-power-of-two dims (1664 -> 512x3+128
    instead of 13x128)."""
    if dim % 128:
        raise ValueError(f"layer size {dim} is not 128-aligned")
    spans, off = [], 0
    while off < dim:
        size = next(c for c in (512, 256, 128) if c <= dim - off)
        spans.append((off, size))
        off += size
    return spans


def _mask_threshold(omit: float) -> int:
    return min(int(omit * 4294967296.0), 4294967295)


def _resident_kernel(*refs, L: int, sizes: Sequence[int], bunch: int,
                     n_bunches: int, hidden: str, output: str,
                     dropout: tuple, dropout_mode: str, valid_sizes,
                     bf16: bool, sr_state: bool):
    # ref layout: scal, seed, x, t, w[L], d[L], b[L], db[L] |
    #             w_out[L], d_out[L], b_out[L], db_out[L] |
    #             Ws[L], Ds[L], Bs[L], DBs[L], sem
    it = iter(refs)
    scal = next(it)
    seed = next(it)
    x_ref = next(it)
    t_ref = next(it)
    w_in = [next(it) for _ in range(L)]
    d_in = [next(it) for _ in range(L)]
    b_in = [next(it) for _ in range(L)]
    db_in = [next(it) for _ in range(L)]
    w_out = [next(it) for _ in range(L)]
    d_out = [next(it) for _ in range(L)]
    b_out = [next(it) for _ in range(L)]
    db_out = [next(it) for _ in range(L)]
    Ws = [next(it) for _ in range(L)]
    Ds = [next(it) for _ in range(L)]
    Bs = [next(it) for _ in range(L)]
    DBs = [next(it) for _ in range(L)]
    sem = next(it)

    i = pl.program_id(0)
    # generalized momentum rule: delta' = m*delta - (A*g + B*w), where g is
    # the gradient of (1/n)*sum((out-t)^2); A/B are precomputed by the caller
    # (parity: A=(1-m)*lr/n, B=(1-m)*lr*wc — the reference's double-1/n and
    # (1-m) quirks; clean: A=lr, B=lr*wc)
    m = scal[0]
    A = scal[1]
    B = scal[2]
    inv_n = jnp.float32(1.0 / bunch)

    @pl.when(i == 0)
    def _load_state():
        for src, dst in zip(w_in + d_in + b_in + db_in, Ws + Ds + Bs + DBs):
            cp = pltpu.make_async_copy(src, dst, sem)
            cp.start()
            cp.wait()

    # ---------------- forward ----------------
    h = x_ref[:]
    ys = []
    for l in range(L):
        omit = dropout[0] if l == 0 else dropout[1]
        if omit > 0.0:
            pltpu.prng_seed(seed[0] + i * _BUNCH_STRIDE + l * _LAYER_STRIDE)
            bits = pltpu.bitcast(pltpu.prng_random_bits(h.shape), jnp.uint32)
            mask = (bits >= jnp.uint32(_mask_threshold(omit))).astype(jnp.float32)
            h = h * mask
            if dropout_mode == "inverted":
                h = h * jnp.float32(1.0 / (1.0 - omit))
        ys.append(h)
        z = _dot(h, Ws[l][:], bf16) + Bs[l][:]
        if l < L - 1:
            h = jnp.maximum(z, 0.0) if hidden == "relu" else jax.nn.sigmoid(z)
            if hidden == "sigmoid" and valid_sizes[l + 1] < sizes[l + 1]:
                # sigmoid(0)=0.5 on zero-padded hidden cols would leak
                cols = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
                h = jnp.where(cols < valid_sizes[l + 1], h, 0.0)
        else:
            h = jax.nn.sigmoid(z) if output == "sigmoid" else z
    out = h

    # ---------------- backward + in-place update ----------------
    dedx = (2.0 * inv_n) * (out - t_ref[:])
    if output == "sigmoid":
        dedx = dedx * out * (1.0 - out)
        if valid_sizes[-1] < sizes[-1]:
            cols = jax.lax.broadcasted_iota(jnp.int32, dedx.shape, 1)
            dedx = jnp.where(cols < valid_sizes[-1], dedx, 0.0)

    for l in range(L - 1, -1, -1):
        # Row-tiled single pass over W: each (rb, N) block is read once and
        # serves BOTH the dedy backprop (with PRE-update values — SgemmTN
        # order, BP_GPU.cu:636 runs before DevAccSum :651) and the in-place
        # momentum update; the (rb, N) gradient temporary stays bounded.
        if sr_state:  # one PRNG stream per (bunch, layer) for the SR bits
            pltpu.prng_seed(seed[0] + i * _BUNCH_STRIDE + l * _LAYER_STRIDE + 1)
        dedy_parts = []
        for r0, rb in _row_blocks(sizes[l]):
            r1 = r0 + rb
            w_blk = Ws[l][r0:r1, :]
            if l > 0:
                dedy_parts.append(_dot(dedx, w_blk, bf16, transpose=1))
            g = _dot(ys[l][:, r0:r1], dedx, bf16, transpose=2)  # (rb, N)
            w32 = w_blk.astype(jnp.float32)
            nd = m * Ds[l][r0:r1, :].astype(jnp.float32) - (A * g + B * w32)
            if sr_state:
                # bf16 state: unbiased stochastic rounding via the hw PRNG —
                # nearest-rounding would bias the ~1e-5-scale updates to zero
                bits = pltpu.bitcast(pltpu.prng_random_bits(nd.shape), jnp.uint32)
                Ds[l][r0:r1, :] = pltpu.stochastic_round(
                    nd, bits, target_dtype=jnp.bfloat16)
                bits = pltpu.bitcast(pltpu.prng_random_bits(nd.shape), jnp.uint32)
                Ws[l][r0:r1, :] = pltpu.stochastic_round(
                    w32 + nd, bits, target_dtype=jnp.bfloat16)
            else:
                Ds[l][r0:r1, :] = nd
                Ws[l][r0:r1, :] = w32 + nd
        dedy = jnp.concatenate(dedy_parts, axis=1) if l > 0 else None

        gb = jnp.sum(dedx, axis=0, keepdims=True)
        ndb = m * DBs[l][:] - A * gb  # biases stay f32 in both state modes
        DBs[l][:] = ndb
        Bs[l][:] = Bs[l][:] + ndb

        if l > 0:
            y = ys[l]  # post-dropout activation of layer l-1 (reference uses
            # the masked value for the derivative, BP_GPU.cu:536-551, 614-615)
            dedx = jnp.where(y > 0, dedy, 0.0) if hidden == "relu" \
                else y * (1.0 - y) * dedy

    @pl.when(i == n_bunches - 1)
    def _store_state():
        for src, dst in zip(Ws + Ds + Bs + DBs, w_out + d_out + b_out + db_out):
            cp = pltpu.make_async_copy(src, dst, sem)
            cp.start()
            cp.wait()


def _resident_call(x, t, ws, ds, bs, dbs, scal, seed, *, sizes, bunch: int,
                   hidden: str, output: str, dropout, dropout_mode: str,
                   valid_sizes, bf16: bool, sr_state: bool, interpret: bool):
    L = len(ws)
    n_bunches = x.shape[0] // bunch
    kern = functools.partial(
        _resident_kernel, L=L, sizes=tuple(sizes), bunch=bunch,
        n_bunches=n_bunches, hidden=hidden, output=output,
        dropout=tuple(dropout), dropout_mode=dropout_mode,
        valid_sizes=tuple(valid_sizes), bf16=bf16, sr_state=sr_state)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec((bunch, sizes[0]), lambda i: (i, 0), memory_space=pltpu.VMEM),
           pl.BlockSpec((bunch, sizes[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [any_spec] * (4 * L)
    )
    out_specs = tuple([any_spec] * (4 * L))
    out_shape = tuple(
        jax.ShapeDtypeStruct(a.shape, a.dtype) for a in ws + ds + bs + dbs
    )
    scratch = (
        [pltpu.VMEM(a.shape, a.dtype) for a in ws + ds + bs + dbs]
        + [pltpu.SemaphoreType.DMA]
    )
    outs = pl.pallas_call(
        kern,
        grid=(n_bunches,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scal, seed, x, t, *ws, *ds, *bs, *dbs)
    return outs[:L], outs[L:2 * L], outs[2 * L:3 * L], outs[3 * L:]


def make_resident_train_chunk(cfg: ModelConfig, opt: OptConfig,
                              interpret: bool = False, bf16: bool = True,
                              rule: str = "parity", sr_state: bool = False):
    """jit chunk trainer: whole chunk, VMEM-resident state, one pallas_call.

    Same contract as train.step.make_jit_train_chunk / make_pallas_train_chunk
    (partial bunch dropped; unaligned layer sizes zero-padded exactly), but
    takes an int32 `seed` for the in-kernel hardware-PRNG dropout instead of a
    jax PRNG key.  lrate/momentum/weightcost are dynamic (no recompile across
    the recipe's momentum ramp).

    rule: "parity" = the reference's quirk-exact update (double 1/n, (1-m));
    "clean" = standard Polyak momentum on the mean-MSE gradient (matches
    train.step.clean_train_step).  sr_state: weights/momentum are bfloat16
    (biases stay f32) with hardware-PRNG stochastic rounding — halves the
    resident state's VMEM footprint and update traffic (clean mode; TPU only).
    """
    sizes = tuple(cfg.layersizes)
    padded = tuple(_round_up(s) for s in sizes)
    needs_pad = padded != sizes
    bunch = opt.bunchsize
    if bunch % 8:
        raise ValueError(f"bunchsize {bunch} must be a multiple of 8")
    if rule not in ("parity", "clean"):
        raise ValueError(f"unknown rule {rule!r}")
    if sr_state and rule == "parity":
        raise ValueError("sr_state (bf16 weights) is a clean-mode option; "
                         "parity is fp32 end-to-end")

    @jax.jit
    def run(state: TrainState, in_chunk, targ_chunk, seed,
            lrate=opt.lrate, momentum=opt.momentum, weightcost=opt.weightcost):
        n_bunches = in_chunk.shape[0] // bunch
        if n_bunches == 0:
            return state
        if needs_pad:
            state = _pad_state(state, sizes, padded)
            in_chunk = jnp.pad(in_chunk, ((0, 0), (0, padded[0] - sizes[0])))
            targ_chunk = jnp.pad(targ_chunk, ((0, 0), (0, padded[-1] - sizes[-1])))
        x = in_chunk[: n_bunches * bunch]
        t = targ_chunk[: n_bunches * bunch]
        m = jnp.float32(momentum)
        lr = jnp.float32(lrate)
        wc = jnp.float32(weightcost)
        if rule == "parity":
            a_coef = (1.0 - m) * lr * jnp.float32(1.0 / bunch)
            b_coef = (1.0 - m) * lr * wc
        else:
            # clean: the kernel's g carries 2/bunch; clean_train_step's loss
            # is the mean over ALL B*n_out elements, so scale by 1/n_out too
            a_coef = lr * jnp.float32(1.0 / sizes[-1])
            b_coef = lr * wc
        scal = jnp.stack([m, a_coef, b_coef])
        seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
        bs2 = [b.reshape(1, -1) for b in state.params["b"]]
        dbs2 = [d.reshape(1, -1) for d in state.deltas["b"]]
        dropout = (cfg.dropout_vis, cfg.dropout_hid) if cfg.use_dropout else (0.0, 0.0)
        ws, ds, bs, dbs = _resident_call(
            x, t, list(state.params["w"]), list(state.deltas["w"]), bs2, dbs2,
            scal, seed_arr, sizes=padded, bunch=bunch, hidden=cfg.hidden,
            output=cfg.output, dropout=dropout, dropout_mode=cfg.dropout_mode,
            valid_sizes=sizes, bf16=bf16, sr_state=sr_state, interpret=interpret)
        new = TrainState(
            params={"w": tuple(ws), "b": tuple(b.reshape(-1) for b in bs)},
            deltas={"w": tuple(ds), "b": tuple(d.reshape(-1) for d in dbs)},
            step=state.step + n_bunches,
        )
        if needs_pad:
            new = _unpad_state(new, sizes)
        return new

    return run
