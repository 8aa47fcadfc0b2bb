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

# seed strides: distinct PRNG streams per (bunch, layer) mask.  DP devices
# share the stream (global-bunch mask, sliced per device) — invariant contract
_BUNCH_STRIDE = 7919
_LAYER_STRIDE = 104729

# the mosaic program VMEM budget requested by _resident_call (v5e-class);
# footprint estimates leave headroom for kernel temporaries below it
VMEM_BUDGET_BYTES = 128 * 1024 * 1024
# per-layer activation/grad temporaries measured ~5.5 MiB over the
# resident_vmem_bytes estimate on the 16 kHz net (mosaic reported 129.02 MiB
# used vs 123.5 MiB estimated); 8 MiB headroom keeps both decisions correct
# (8 kHz: 95.9 -> fits; 16 kHz f32: 123.5 -> falls back, matching the
# observed over-budget compile failure)
_VMEM_HEADROOM_BYTES = 8 * 1024 * 1024


def spill_layer_order(padded_sizes) -> list:
    """Layer indices in the order the hybrid engine spills them to HBM:
    smallest padded W first (least per-bunch DMA traffic), later layers
    preferred on ties — the output layer's W is touched in the tightest
    window (end of forward, start of backward), so its VMEM residency buys
    the least."""
    L = len(padded_sizes) - 1
    return sorted(range(L),
                  key=lambda l: (padded_sizes[l] * padded_sizes[l + 1], -l))


def _spill_set(padded_sizes, hbm_spill: int) -> tuple:
    return tuple(sorted(spill_layer_order(padded_sizes)[:hbm_spill]))


SPILL_BLOCK = 256  # spilled-layer row-block (4 ping-pong slots = 2x512 bytes)


def _spill_stage_shape(padded_sizes, spill) -> tuple:
    """(rows, cols) of ONE W/Delta staging slot shared by spilled layers:
    the largest spilled row block x the widest output dim among them.  Four
    slots total (W x2 + Delta x2, double-buffered prefetch) — same bytes as
    the two full-width slots a serial scheme would need."""
    rb = max(max(b for _, b in _row_blocks(padded_sizes[l], SPILL_BLOCK))
             for l in spill)
    return rb, max(padded_sizes[l + 1] for l in spill)


def resident_vmem_bytes(cfg: ModelConfig, opt: OptConfig,
                        sr_state: bool = False,
                        tile_rows: int | None = None,
                        sr_delta: bool = False,
                        hbm_spill: int = 0) -> int:
    """Estimated VMEM footprint of the resident megakernel's pinned state +
    double-buffered input windows (the dominant terms).  Validation datapoint
    (16 kHz 3084-2048x3-257 net): this estimate gives 123.5 MiB while the
    failed mosaic compile reported 129.02 MiB actually used — the ~5.5 MiB
    delta is per-layer activation/grad temporaries, which is exactly what
    _VMEM_HEADROOM_BYTES (8 MiB) budgets for.  Weights+momentum are fp32;
    bf16 both when sr_state, bf16 momentum only when sr_delta.  Biases and
    x/t windows are always fp32.  hbm_spill > 0 (the f32 hybrid): the
    spilled layers' W+Delta live in HBM and cost only the two block staging
    buffers."""
    padded = [_round_up(s) for s in cfg.layersizes]
    spill = _spill_set(padded, hbm_spill)
    w_elems = sum(a * b for l, (a, b) in enumerate(zip(padded[:-1], padded[1:]))
                  if l not in spill)
    b_elems = sum(padded[1:])
    w_bytes = 2 if sr_state else 4
    d_bytes = 2 if (sr_state or sr_delta) else 4
    state_bytes = w_elems * (w_bytes + d_bytes) + 2 * b_elems * 4
    if spill:
        rb, cols = _spill_stage_shape(padded, spill)
        state_bytes += 4 * rb * cols * 4  # (Wstg + Dstg) x 2 slots (f32)
    tile = tile_rows if tile_rows is not None else opt.bunchsize
    window_bytes = 2 * tile * (padded[0] + padded[-1]) * 4  # 2 buffering levels
    return state_bytes + window_bytes


def resident_fits_vmem(cfg: ModelConfig, opt: OptConfig,
                       sr_state: bool = False,
                       tile_rows: int | None = None,
                       sr_delta: bool = False,
                       hbm_spill: int = 0) -> bool:
    return (resident_vmem_bytes(cfg, opt, sr_state, tile_rows, sr_delta,
                                hbm_spill)
            <= VMEM_BUDGET_BYTES - _VMEM_HEADROOM_BYTES)


def _row_blocks(dim: int, max_block: int = 512):
    """Row-tiles (offset, size) for the in-place weight update: greedy large
    blocks bound the (rb, N) gradient temporary, keep slices sublane-aligned,
    and minimize the dot count for non-power-of-two dims (1664 -> 512x3+128
    instead of 13x128).  max_block=256 is used for HBM-spilled layers under
    double-buffered prefetch (4 staging slots must fit the VMEM estimate)."""
    if dim % 128:
        raise ValueError(f"layer size {dim} is not 128-aligned")
    spans, off = [], 0
    while off < dim:
        size = next(c for c in (512, 256, 128) if c <= min(max_block, dim - off))
        spans.append((off, size))
        off += size
    return spans


def _mask_threshold(omit: float) -> int:
    return min(int(omit * 4294967296.0), 4294967295)


def _sr_to_bf16(val, bits, emulate: bool):
    """f32 -> bf16 with unbiased stochastic rounding.

    On TPU this is the hardware op.  The mosaic/HLO interpreters have no
    stochastic_round lowering on CPU, so interpret mode uses the equivalent
    construction the hardware implements: add the low 16 random bits to the
    f32 bit pattern and truncate the mantissa (rounds away from zero with
    probability equal to the dropped fraction — unbiased; mantissa carry
    correctly propagates into the exponent)."""
    if not emulate:
        return pltpu.stochastic_round(val, bits, target_dtype=jnp.bfloat16)
    vi = pltpu.bitcast(val, jnp.uint32)
    yi = (vi + (bits & jnp.uint32(0xFFFF))) & jnp.uint32(0xFFFF0000)
    return pltpu.bitcast(yi, jnp.float32).astype(jnp.bfloat16)


def _resident_kernel(*refs, L: int, sizes: Sequence[int], bunch: int,
                     n_bunches: int, hidden: str, output: str,
                     dropout: tuple, dropout_mode: str, valid_sizes,
                     bf16: bool, sr_state: bool, sr_delta: bool = False,
                     emulate_sr: bool = False,
                     axis_name: str | None = None, n_dev: int = 1,
                     grad_n: int | None = None, dedy_full: bool = False,
                     accum_tiles: int = 1, mask_rows: int | None = None,
                     spill: tuple = ()):
    # ref layout: scal, seed, x, t, w[L], d[L], b[L], db[L] |
    #             w_out[L], d_out[L], b_out[L], db_out[L] |
    #             Ws[L \ spill], Ds[L \ spill], Bs[L], DBs[L], sem
    #             [+ spill: Wstg, Dstg] [+ DP: comm, ready_sems, send/recv]
    # spill (the f32 HYBRID-residency mode, VERDICT r4 item 3): layers whose
    # W+Delta stay in HBM — their live state is the w_out/d_out buffer
    # (seeded from w_in/d_in at grid step (0,0); sequential grid semantics
    # make step i's writes visible at step i+1), streamed through the shared
    # Wstg/Dstg VMEM staging blocks per row block.  Everything stays f32 —
    # the exact full-resident update rule with the spilled layers' VMEM cost
    # reduced to two staging buffers, at ~4x the spilled W's bytes of HBM
    # traffic per bunch.
    spill = frozenset(spill)
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
    Ws = [next(it) if l not in spill else None for l in range(L)]
    Ds = [next(it) if l not in spill else None for l in range(L)]
    Bs = [next(it) for _ in range(L)]
    DBs = [next(it) for _ in range(L)]
    sem = next(it)
    if spill:
        Wstg = next(it)        # (2, rb, n) ping-pong staging slots
        Dstg = next(it)
        spill_sems = next(it)  # DMA x8: load W/D + store W/D, per slot
    if n_dev > 1:
        if dropout[0] > 0.0 or dropout[1] > 0.0:
            mask_buf = next(it)  # (mask_rows, max_width) VMEM staging
        comm = next(it)
        ready = next(it)
        send_sem = next(it)
        recv_sem = next(it)
        n_steps = n_dev.bit_length() - 1  # n_dev is a power of two
        my_id = jax.lax.axis_index(axis_name)

    def _allreduce(val):
        """Sum `val` (rb, n) over the "data" axis — identically on every
        device — via recursive doubling over in-kernel remote DMAs.

        Correctness-by-construction:
        * bitwise-replicated result: at step k both partners hold their
          2^k-group sums A and B and both compute A + B; IEEE addition is
          commutative, so all devices end with the same bits — the
          replicated-state invariant the in-place update needs.
        * flow control: one REGULAR token semaphore per butterfly step.
          Each side signals the partner's ready[k] then waits its own, so a
          device's incoming DMA for (block j, step k) can only start after
          it consumed its (block j-1, step k) buffer — queues never exceed
          depth 2, no slot is overwritten while in flight.
        """
        if n_dev == 1:
            return val
        rb, n = val.shape
        comm[0, pl.ds(0, rb), pl.ds(0, n)] = val
        for k in range(n_steps):
            partner = jax.lax.bitwise_xor(my_id, 1 << k)
            pltpu.semaphore_signal(
                ready.at[k], inc=1, device_id=partner,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_wait(ready.at[k], 1)
            rdma = pltpu.make_async_remote_copy(
                src_ref=comm.at[0, pl.ds(0, rb), pl.ds(0, n)],
                dst_ref=comm.at[1, pl.ds(0, rb), pl.ds(0, n)],
                send_sem=send_sem, recv_sem=recv_sem,
                device_id=partner,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            rdma.start()
            rdma.wait()
            val = (comm[0, pl.ds(0, rb), pl.ds(0, n)]
                   + comm[1, pl.ds(0, rb), pl.ds(0, n)])
            if k < n_steps - 1:
                comm[0, pl.ds(0, rb), pl.ds(0, n)] = val
        return val

    # 2-D grid (update batches, row tiles): j streams accum_tiles tiles of
    # `bunch` rows per update batch, accumulating the gradient INTO the
    # momentum buffer (no extra gradient scratch) and applying the weight
    # step only on the last tile — this is how the resident kernel takes
    # arbitrarily large update batches with a bounded activation footprint
    # (VERDICT r2 items 4/5).  accum_tiles == 1 reproduces the original
    # per-bunch update exactly.
    i = pl.program_id(0)
    j = pl.program_id(1)
    # generalized momentum rule: delta' = m*delta - (A*g + B*w), where g is
    # the gradient of (1/n)*sum((out-t)^2); A/B are precomputed by the caller
    # (parity: A=(1-m)*lr/n, B=(1-m)*lr*wc — the reference's double-1/n and
    # (1-m) quirks; clean: A=lr, B=lr*wc)
    m = scal[0]
    A = scal[1]
    B = scal[2]
    # dynamic real-batch count (seed[1]): the grid may be padded to a fixed
    # capacity so one compiled kernel serves every chunk size (pfile chunks
    # vary per sentence boundaries; mosaic compiles cost ~minutes per shape).
    # Grid steps >= n_real skip all compute and state stays untouched.
    n_real = seed[1]

    @pl.when((i == 0) & (j == 0))
    def _load_state():
        srcs, dsts = [], []
        for l in range(L):
            if l in spill:
                # spilled state lives in the HBM output buffers for the whole
                # chunk: seed them from the inputs once (HBM->HBM DMA)
                srcs += [w_in[l], d_in[l]]
                dsts += [w_out[l], d_out[l]]
            else:
                srcs += [w_in[l], d_in[l]]
                dsts += [Ws[l], Ds[l]]
        for src, dst in zip(srcs + b_in + db_in, dsts + Bs + DBs):
            cp = pltpu.make_async_copy(src, dst, sem)
            cp.start()
            cp.wait()

    def _train_bunch_body():
        inv_n = jnp.float32(1.0 / (grad_n if grad_n is not None else bunch))
        # ---------------- forward ----------------
        h = x_ref[:]
        ys = []
        for l in range(L):
            omit = dropout[0] if l == 0 else dropout[1]
            if omit > 0.0:
                # Device-count-INVARIANT masks (same contract as the XLA DP
                # path, parallel/mesh.py:95): every device seeds the hw PRNG
                # identically per (seed, bunch, layer), draws the GLOBAL
                # bunch's mask, and slices its own bunch_part rows — so the
                # DP mask streams are exactly the single-chip streams split
                # by row, for any power-of-two device count.
                gi = i * accum_tiles + j if accum_tiles > 1 else i
                pltpu.prng_seed(seed[0] + gi * _BUNCH_STRIDE + l * _LAYER_STRIDE)
                g_rows = mask_rows if mask_rows else bunch  # global tile rows
                bits = pltpu.bitcast(
                    pltpu.prng_random_bits((g_rows, h.shape[1])), jnp.uint32)
                mask = (bits >= jnp.uint32(_mask_threshold(omit))).astype(jnp.float32)
                if n_dev > 1:
                    # take my bunch_part rows.  Mosaic has no dynamic_slice
                    # on VALUES, so stage the global mask through a VMEM
                    # scratch and read back with a dynamic pl.ds ref load
                    # (start = my_id*bunch is 8-row aligned: bunch % 8 == 0)
                    w_ = h.shape[1]
                    mask_buf[0:g_rows, 0:w_] = mask
                    mask = mask_buf[pl.ds(my_id * bunch, bunch), 0:w_]
                h = h * mask
                if dropout_mode == "inverted":
                    h = h * jnp.float32(1.0 / (1.0 - omit))
            ys.append(h)
            if l in spill:
                # blockwise forward against the HBM-resident W, streamed
                # through the 2-slot staging buffer with the NEXT block's
                # load issued before the current block's dot — the DMA
                # latency hides behind the MXU (the z accumulation order
                # differs from the single-dot full-resident kernel by fp
                # rounding only)
                n_out = sizes[l + 1]
                blocks = _row_blocks(sizes[l], SPILL_BLOCK)

                def _load_w(bi):
                    r0, rb = blocks[bi]
                    cp = pltpu.make_async_copy(
                        w_out[l].at[r0:r0 + rb, :],
                        Wstg.at[bi % 2, 0:rb, 0:n_out],
                        spill_sems.at[bi % 2])
                    cp.start()
                    return cp

                acc = None
                pend = [_load_w(0), None]
                for bi, (r0, rb) in enumerate(blocks):
                    pend[bi % 2].wait()
                    if bi + 1 < len(blocks):
                        pend[(bi + 1) % 2] = _load_w(bi + 1)
                    part = _dot(h[:, r0:r0 + rb],
                                Wstg[bi % 2, 0:rb, 0:n_out], bf16)
                    acc = part if acc is None else acc + part
                z = acc + Bs[l][:]
            else:
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
            if sr_state or sr_delta:  # one PRNG stream per (bunch, layer) for SR bits
                pltpu.prng_seed(seed[0] + i * _BUNCH_STRIDE + l * _LAYER_STRIDE + 1)
            use_dedy_full = dedy_full and l not in spill
            if use_dedy_full and l > 0:
                # one (bunch, M) MXU dot against the full PRE-update W —
                # mathematically identical to the per-block parts (the N
                # contraction is elementwise-independent of row blocking) but
                # avoids the relayout of the (bunch, rb) concat below
                dedy = _dot(dedx, Ws[l][:], bf16, transpose=1)
            n_out = sizes[l + 1]
            dedy_parts = []
            if l in spill:
                # HBM-spilled layer: per-block staged load -> f32 update ->
                # async write-back, with the NEXT block's W/Delta loads
                # prefetched into the other slot before this block's dots —
                # the exposed DMA latency shrinks to ~2 waits per pass
                # (the serial start/wait version measured 0.79 vs 0.14
                # ms/bunch at 16 kHz).  Disjoint row blocks make prefetching
                # ahead of the in-place update safe; a load may only reuse a
                # slot after that slot's write-back drained (store_pend).
                blocks = _row_blocks(sizes[l], SPILL_BLOCK)

                def _load_wd(bi):
                    r0b, rbb = blocks[bi]
                    s_ = bi % 2
                    cw = pltpu.make_async_copy(
                        w_out[l].at[r0b:r0b + rbb, :],
                        Wstg.at[s_, 0:rbb, 0:n_out], spill_sems.at[s_])
                    cd = pltpu.make_async_copy(
                        d_out[l].at[r0b:r0b + rbb, :],
                        Dstg.at[s_, 0:rbb, 0:n_out], spill_sems.at[2 + s_])
                    cw.start()
                    cd.start()
                    return cw, cd

                store_pend = [None, None]
                load_pend = [_load_wd(0), None]
                for bi, (r0, rb) in enumerate(blocks):
                    s = bi % 2
                    for c in load_pend[s]:
                        c.wait()
                    if bi + 1 < len(blocks):
                        o = (bi + 1) % 2
                        if store_pend[o] is not None:
                            for c in store_pend[o]:
                                c.wait()
                            store_pend[o] = None
                        load_pend[o] = _load_wd(bi + 1)
                    w_blk = Wstg[s, 0:rb, 0:n_out]
                    if l > 0:
                        dedy_parts.append(_dot(dedx, w_blk, bf16, transpose=1))
                    g = _dot(ys[l][:, r0:r0 + rb], dedx, bf16, transpose=2)
                    g = _allreduce(g)
                    w32 = w_blk.astype(jnp.float32)
                    nd = m * Dstg[s, 0:rb, 0:n_out] - (A * g + B * w32)
                    Dstg[s, 0:rb, 0:n_out] = nd
                    Wstg[s, 0:rb, 0:n_out] = w32 + nd
                    sw = pltpu.make_async_copy(
                        Wstg.at[s, 0:rb, 0:n_out], w_out[l].at[r0:r0 + rb, :],
                        spill_sems.at[4 + s])
                    sd = pltpu.make_async_copy(
                        Dstg.at[s, 0:rb, 0:n_out], d_out[l].at[r0:r0 + rb, :],
                        spill_sems.at[6 + s])
                    sw.start()
                    sd.start()
                    store_pend[s] = (sw, sd)
                # drain write-backs: the next bunch's forward re-reads w_out
                for p in store_pend:
                    if p is not None:
                        for c in p:
                            c.wait()
            for r0, rb in ([] if l in spill else _row_blocks(sizes[l])):
                r1 = r0 + rb
                w_blk = Ws[l][r0:r1, :]
                if l > 0 and not use_dedy_full:
                    dedy_parts.append(_dot(dedx, w_blk, bf16, transpose=1))
                g = _dot(ys[l][:, r0:r1], dedx, bf16, transpose=2)  # (rb, N)
                g = _allreduce(g)  # DP: sum local-slice gradients over devices
                w32 = w_blk.astype(jnp.float32)
                if accum_tiles > 1:
                    # gradient accumulation INTO the momentum buffer: tile 0
                    # applies decay + weightcost once, later tiles only add
                    # their -A*g share; the weight step lands with the last
                    # tile (W stays PRE-update for every tile's backprop)
                    d_blk = Ds[l][r0:r1, :]
                    nd = jnp.where(j == 0, m * d_blk - (A * g + B * w32),
                                   d_blk - A * g)
                    Ds[l][r0:r1, :] = nd
                    Ws[l][r0:r1, :] = jnp.where(j == accum_tiles - 1,
                                                w32 + nd, w32)
                    continue
                nd = m * Ds[l][r0:r1, :].astype(jnp.float32) - (A * g + B * w32)
                if sr_state:
                    # bf16 state: unbiased stochastic rounding via the hw PRNG —
                    # nearest-rounding would bias the ~1e-5-scale updates to zero
                    bits = pltpu.bitcast(pltpu.prng_random_bits(nd.shape), jnp.uint32)
                    Ds[l][r0:r1, :] = _sr_to_bf16(nd, bits, emulate_sr)
                    bits = pltpu.bitcast(pltpu.prng_random_bits(nd.shape), jnp.uint32)
                    Ws[l][r0:r1, :] = _sr_to_bf16(w32 + nd, bits, emulate_sr)
                elif sr_delta:
                    # bf16 MOMENTUM only (weights stay f32): halves the delta
                    # buffer's VMEM share — what fits the 16 kHz
                    # 3084-2048x3-257 state in the mosaic budget.  The weight
                    # step applies the UNROUNDED f32 nd; only the stored
                    # recurrence is SR-rounded (unbiased).  Measured on v5e
                    # (round 4): 0.120 ms/bunch at 16 kHz — faster than both
                    # sr_state (0.142, extra SR words) and the XLA fallback
                    # (0.207).  (An earlier "200x slower" reading was a
                    # benchmark artifact: the f32->bf16 state auto-cast
                    # changes the jit signature after the first call, so a
                    # single-warmup bench timed the SECOND mosaic compile —
                    # warm both signatures before timing.)
                    bits = pltpu.bitcast(pltpu.prng_random_bits(nd.shape), jnp.uint32)
                    Ds[l][r0:r1, :] = _sr_to_bf16(nd, bits, emulate_sr)
                    Ws[l][r0:r1, :] = w32 + nd
                else:
                    Ds[l][r0:r1, :] = nd
                    Ws[l][r0:r1, :] = w32 + nd
            if not use_dedy_full:
                dedy = jnp.concatenate(dedy_parts, axis=1) if l > 0 else None

            gb = jnp.sum(dedx, axis=0, keepdims=True)
            if n_dev > 1:  # pad to a sublane-aligned (8, N) block for the DMA
                gb = _allreduce(jnp.pad(gb, ((0, 7), (0, 0))))[0:1, :]
            if accum_tiles > 1:
                ndb = jnp.where(j == 0, m * DBs[l][:] - A * gb,
                                DBs[l][:] - A * gb)
                DBs[l][:] = ndb
                Bs[l][:] = jnp.where(j == accum_tiles - 1,
                                     Bs[l][:] + ndb, Bs[l][:])
            else:
                ndb = m * DBs[l][:] - A * gb  # biases stay f32 either way
                DBs[l][:] = ndb
                Bs[l][:] = Bs[l][:] + ndb

            if l > 0:
                y = ys[l]  # post-dropout activation of layer l-1 (reference uses
                # the masked value for the derivative, BP_GPU.cu:536-551, 614-615)
                dedx = jnp.where(y > 0, dedy, 0.0) if hidden == "relu" \
                    else y * (1.0 - y) * dedy

    @pl.when(i < n_real)
    def _train_bunch():
        _train_bunch_body()

    @pl.when((i == jnp.maximum(n_real, 1) - 1) & (j == accum_tiles - 1))
    def _store_state():
        # spilled layers already live in w_out/d_out — nothing to store
        srcs = [r for l, r in enumerate(Ws + Ds) if l % L not in spill]
        dsts = [r for l, r in enumerate(w_out + d_out) if l % L not in spill]
        for src, dst in zip(srcs + Bs + DBs, dsts + b_out + db_out):
            cp = pltpu.make_async_copy(src, dst, sem)
            cp.start()
            cp.wait()


def _resident_call(x, t, ws, ds, bs, dbs, scal, seed, *, sizes, bunch: int,
                   hidden: str, output: str, dropout, dropout_mode: str,
                   valid_sizes, bf16: bool, sr_state: bool, interpret: bool,
                   sr_delta: bool = False,
                   axis_name: str | None = None, n_dev: int = 1,
                   grad_n: int | None = None, dedy_full: bool = False,
                   accum_tiles: int = 1, mask_rows: int | None = None,
                   spill: tuple = ()):
    L = len(ws)
    n_mega = x.shape[0] // (bunch * accum_tiles)
    kern = functools.partial(
        _resident_kernel, L=L, sizes=tuple(sizes), bunch=bunch,
        n_bunches=n_mega, hidden=hidden, output=output,
        dropout=tuple(dropout), dropout_mode=dropout_mode,
        valid_sizes=tuple(valid_sizes), bf16=bf16, sr_state=sr_state,
        sr_delta=sr_delta, emulate_sr=bool(interpret),
        axis_name=axis_name, n_dev=n_dev, grad_n=grad_n, dedy_full=dedy_full,
        accum_tiles=accum_tiles, mask_rows=mask_rows, spill=tuple(spill))

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    at = accum_tiles
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec((bunch, sizes[0]), lambda i, j: (i * at + j, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((bunch, sizes[-1]), lambda i, j: (i * at + j, 0),
                        memory_space=pltpu.VMEM)]
        + [any_spec] * (4 * L)
    )
    out_specs = tuple([any_spec] * (4 * L))
    out_shape = tuple(
        jax.ShapeDtypeStruct(a.shape, a.dtype) for a in ws + ds + bs + dbs
    )
    spill_set = frozenset(spill)
    scratch = (
        [pltpu.VMEM(a.shape, a.dtype)
         for l, a in enumerate(ws) if l not in spill_set]
        + [pltpu.VMEM(a.shape, a.dtype)
           for l, a in enumerate(ds) if l not in spill_set]
        + [pltpu.VMEM(a.shape, a.dtype) for a in bs + dbs]
        + [pltpu.SemaphoreType.DMA]
    )
    if spill_set:
        stg = (2,) + _spill_stage_shape(list(sizes), spill_set)
        scratch += [pltpu.VMEM(stg, jnp.float32),       # Wstg (2 slots)
                    pltpu.VMEM(stg, jnp.float32),       # Dstg (2 slots)
                    pltpu.SemaphoreType.DMA((8,))]      # load/store W/D x slot
    if n_dev > 1:
        rb_max = max(max(rb for _, rb in _row_blocks(s)) for s in sizes[:-1])
        n_max = max(sizes[1:])
        n_steps = n_dev.bit_length() - 1
        if dropout[0] > 0.0 or dropout[1] > 0.0:
            # global-mask staging buffer (mosaic can't dynamic_slice values;
            # the kernel row-slices this ref with a dynamic pl.ds instead)
            scratch += [pltpu.VMEM((mask_rows or bunch, max(sizes[:-1])),
                                   jnp.float32)]
        scratch += [
            pltpu.VMEM((2, rb_max, n_max), jnp.float32),  # comm slots
            pltpu.SemaphoreType.REGULAR((n_steps,)),      # per-step tokens
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
    if interpret and (n_dev > 1 or sr_state or sr_delta):
        # the HLO interpreter has no prng_seed/stochastic_round lowering on
        # CPU; the mosaic interpreter does (degenerate PRNG bits)
        interpret_param = pltpu.InterpretParams()
    else:
        interpret_param = interpret
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=128 * 1024 * 1024,
        collective_id=0 if n_dev > 1 else None,
        has_side_effects=n_dev > 1,
    )
    outs = pl.pallas_call(
        kern,
        grid=(n_mega, accum_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=compiler_params,
        interpret=interpret_param,
    )(scal, seed, x, t, *ws, *ds, *bs, *dbs)
    return outs[:L], outs[L:2 * L], outs[2 * L:3 * L], outs[3 * L:]


def _scal_coefs(rule: str, grad_n: int, out_dim: int, lrate, momentum, weightcost):
    """[m, A, B] for the generalized update delta' = m*delta - (A*g + B*w),
    where g is the kernel's gradient of (1/grad_n)*sum((out-t)^2).

    parity: A = (1-m)*lr/grad_n, B = (1-m)*lr*wc — the reference's double-1/n
    and (1-m) quirks (DevFunc.cu:313-318).
    clean: the kernel's g carries 2/grad_n; clean_train_step's loss is the
    mean over ALL B*n_out elements, so scale by 1/out_dim too.
    """
    m = jnp.float32(momentum)
    lr = jnp.float32(lrate)
    wc = jnp.float32(weightcost)
    if rule == "parity":
        a_coef = (1.0 - m) * lr * jnp.float32(1.0 / grad_n)
        b_coef = (1.0 - m) * lr * wc
    else:
        a_coef = lr * jnp.float32(1.0 / out_dim)
        b_coef = lr * wc
    return jnp.stack([m, a_coef, b_coef])


def make_resident_train_chunk(cfg: ModelConfig, opt: OptConfig,
                              interpret: bool = False, bf16: bool = True,
                              rule: str = "parity", sr_state: bool = False,
                              dedy_full: bool = False,
                              tile_rows: int | None = None,
                              sr_delta: bool = False,
                              hbm_spill: int = 0):
    """jit chunk trainer: whole chunk, VMEM-resident state, one pallas_call.

    Same contract as train.step.make_jit_train_chunk / make_pallas_train_chunk
    (partial bunch dropped; unaligned layer sizes zero-padded exactly), but
    takes an int32 `seed` for the in-kernel hardware-PRNG dropout instead of a
    jax PRNG key.  lrate/momentum/weightcost are dynamic (no recompile across
    the recipe's momentum ramp).

    rule: "parity" = the reference's quirk-exact update (double 1/n, (1-m));
    "clean" = standard Polyak momentum on the mean-MSE gradient (matches
    train.step.clean_train_step).

    sr_delta: MOMENTUM-only bfloat16 storage (weights/biases and every
    computed value stay f32; the weight step applies the unrounded f32
    delta) with hardware-PRNG stochastic rounding on the stored recurrence.
    Shrinks the resident state enough to fit the 16 kHz full-band
    3084-2048x3-257 net in the mosaic budget (93.6 vs 123.5 MiB; VERDICT r3
    item 2) and is the FASTEST 16 kHz variant measured on v5e: 0.120
    ms/bunch vs sr_state 0.142 and the XLA fallback 0.207.  This is what
    engine="auto" degrades to when the f32 state misses VMEM.

    sr_state: weights AND momentum stored bfloat16 (biases f32) with SR on
    both stores — the maximum-VMEM-savings variant (63 MiB at 16 kHz),
    useful headroom for ~2x-bigger models; slightly slower than sr_delta
    (2x the SR words) and quantizes the stored weights to bf16.

    Both sr modes are allowed with BOTH rules: the update FORMULA is
    unchanged, but bit-exactness vs the f32 kernel is necessarily lost
    (unbiased bf16-ulp rounding noise), so parity-fixture tests keep them
    off; training quality is gate-scored.  run() auto-casts incoming f32
    state to bf16 where needed (a no-op after the first call — NOTE for
    benchmarks: this changes the jit input signature after call one, so
    warm BOTH signatures before timing).

    tile_rows: stream each opt.bunchsize-row update batch through the kernel
    in row tiles of this size (grid dim 1), accumulating the gradient into
    the momentum buffer and applying the weight step on the last tile — big
    update batches (clean mode) with a bounded activation footprint.  None =
    the whole bunch is one tile (the original per-bunch behavior).

    hbm_spill: f32 HYBRID residency (VERDICT r4 item 3) — spill this many
    layers' W+Delta to HBM (smallest padded W first, spill_layer_order),
    streaming them through two shared VMEM staging blocks per bunch while
    every other layer stays pinned.  Keeps the full f32 update rule (no SR
    quantization) for models whose all-resident f32 state misses the mosaic
    budget — the 16 kHz 3084-2048x3-257 net fits at hbm_spill=1 (119.0 vs
    123.5 MiB) at the cost of ~12 MiB of spilled-state HBM traffic per
    bunch.  Mutually exclusive with the sr modes (it's the f32 alternative)
    and with row-tiled accumulation.
    """
    sizes = tuple(cfg.layersizes)
    padded = tuple(_round_up(s) for s in sizes)
    needs_pad = padded != sizes
    bunch = opt.bunchsize
    if bunch % 8:
        raise ValueError(f"bunchsize {bunch} must be a multiple of 8")
    if rule not in ("parity", "clean"):
        raise ValueError(f"unknown rule {rule!r}")
    if sr_state and sr_delta:
        raise ValueError("sr_state (bf16 weights+momentum) already implies "
                         "bf16 momentum; sr_delta is mutually exclusive")
    if not 0 <= hbm_spill <= len(sizes) - 1:
        raise ValueError(f"hbm_spill {hbm_spill} out of range [0, {len(sizes)-1}]")
    if hbm_spill and (sr_state or sr_delta):
        raise ValueError("hbm_spill is the f32 hybrid-residency mode; the "
                         "bf16 sr modes shrink the state instead — combine "
                         "neither (they solve the same VMEM problem)")
    spill = _spill_set(padded, hbm_spill)
    tile = tile_rows if tile_rows is not None else bunch
    if bunch % tile or tile % 8:
        raise ValueError(f"tile_rows {tile} must divide bunchsize {bunch} "
                         "and be a multiple of 8")
    accum = bunch // tile
    if accum > 1 and (rule != "clean" or sr_state or sr_delta):
        raise ValueError("row-tiled gradient accumulation (tile_rows < "
                        "bunchsize) is a clean-rule, fp32/bf16-state option; "
                        "it accumulates INTO the momentum buffer, which must "
                        "stay f32 (no sr_state/sr_delta)")
    if accum > 1 and spill:
        raise ValueError("hbm_spill with row-tiled accumulation would stream "
                         "the spilled momentum from HBM once per TILE; "
                         "unsupported — use one or the other")

    @jax.jit
    def run(state: TrainState, in_chunk, targ_chunk, seed,
            lrate=opt.lrate, momentum=opt.momentum, weightcost=opt.weightcost,
            n_real=None):
        """n_real: optional dynamic count of REAL bunches when `in_chunk` is
        padded to a fixed capacity (one mosaic compile serves every chunk
        size); grid steps beyond it are no-ops.  None = all bunches real."""
        n_bunches = in_chunk.shape[0] // bunch
        if n_bunches == 0:
            return state
        if needs_pad:
            state = _pad_state(state, sizes, padded)
            in_chunk = jnp.pad(in_chunk, ((0, 0), (0, padded[0] - sizes[0])))
            targ_chunk = jnp.pad(targ_chunk, ((0, 0), (0, padded[-1] - sizes[-1])))
        x = in_chunk[: n_bunches * bunch]
        t = targ_chunk[: n_bunches * bunch]
        scal = _scal_coefs(rule, bunch, sizes[-1], lrate, momentum, weightcost)
        nr = n_bunches if n_real is None else n_real
        seed_arr = jnp.stack([jnp.asarray(seed, jnp.int32),
                              jnp.asarray(nr, jnp.int32)])
        bs2 = [b.reshape(1, -1) for b in state.params["b"]]
        dbs2 = [d.reshape(1, -1) for d in state.deltas["b"]]
        dropout = (cfg.dropout_vis, cfg.dropout_hid) if cfg.use_dropout else (0.0, 0.0)
        ws_in = list(state.params["w"])
        ds_w = list(state.deltas["w"])
        if sr_state:
            # bf16 state storage: cast on entry (no-op after the first call —
            # the returned TrainState carries bf16 weights/deltas thereafter)
            ws_in = [w.astype(jnp.bfloat16) for w in ws_in]
            ds_w = [d.astype(jnp.bfloat16) for d in ds_w]
        elif sr_delta:
            ds_w = [d.astype(jnp.bfloat16) for d in ds_w]
        ws, ds, bs, dbs = _resident_call(
            x, t, ws_in, ds_w, bs2, dbs2,
            scal, seed_arr, sizes=padded, bunch=tile, hidden=cfg.hidden,
            output=cfg.output, dropout=dropout, dropout_mode=cfg.dropout_mode,
            valid_sizes=sizes, bf16=bf16, sr_state=sr_state, interpret=interpret,
            sr_delta=sr_delta, dedy_full=dedy_full, accum_tiles=accum,
            grad_n=bunch if accum > 1 else None, spill=spill)
        new = TrainState(
            params={"w": tuple(ws), "b": tuple(b.reshape(-1) for b in bs)},
            deltas={"w": tuple(ds), "b": tuple(d.reshape(-1) for d in dbs)},
            step=state.step + jnp.asarray(nr, jnp.int32),
        )
        if needs_pad:
            new = _unpad_state(new, sizes)
        return new

    return run


def make_dp_resident_train_chunk(cfg: ModelConfig, opt: OptConfig, mesh,
                                 interpret: bool = False, bf16: bool = True,
                                 rule: str = "parity", dedy_full: bool = False,
                                 pre_grouped: bool = False,
                                 tile_rows: int | None = None,
                                 sr_delta: bool = False,
                                 hbm_spill: int = 0):
    """Data-parallel VMEM-resident chunk trainer: the headline megakernel
    scaled over a 1-D ("data",) mesh WITHOUT giving up residency.

    Design (the reference's DP semantics x the resident engine):
    * every device pins a full replica of weights+momentum in VMEM for the
      whole chunk (grid over bunches, state DMA in/out at the chunk edges);
    * each global bunch of opt.bunchsize rows is split bunch_part-style
      across devices (BP_GPU.cu:29-37): device d takes rows
      [d*bs_local, (d+1)*bs_local) of every bunch;
    * per row-block gradients are summed across devices INSIDE the kernel by
      a recursive-doubling butterfly over async remote DMAs (log2(n) steps,
      bitwise-identical sums on every device, per-step token semaphores for
      flow control), then the update is applied in place on every replica —
      replicas never diverge;
    * communication per bunch is one full model-gradient all-reduce riding
      ICI and it gates the next bunch's forward (true SGD dependency), so at
      the reference's global bunch of 128 this path is ICI-bound BY THE
      REFERENCE'S OWN DESIGN (sum grads every 128 samples; the reference
      shipped it disabled, BP_GPU.cu:312-313).  It exists for semantics-exact
      DP; for throughput scaling grow the global bunch (clean mode), which
      amortizes the butterfly linearly.

    Exactness: with dropout off this matches the single-chip resident kernel
    to fp reduction order (tested in interpret mode on the 8-device CPU
    mesh).  With dropout on, every device draws the GLOBAL bunch's hw-PRNG
    mask from the shared (seed, bunch, layer) stream and slices its own
    bunch_part rows — device-count-INVARIANT, the same contract as the XLA
    DP path (parallel/mesh.py:95) and identical to the single-chip resident
    mask streams.
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    sizes = tuple(cfg.layersizes)
    padded = tuple(_round_up(s) for s in sizes)
    needs_pad = padded != sizes
    bunch = opt.bunchsize
    n_dev = mesh.shape["data"]
    if n_dev & (n_dev - 1):
        raise ValueError(f"data mesh size {n_dev} must be a power of two")
    if bunch % n_dev:
        raise ValueError(f"bunchsize {bunch} not divisible by mesh data={n_dev}")
    bs_local = bunch // n_dev
    if bs_local % 8:
        raise ValueError(f"local bunch {bs_local} must be a multiple of 8")
    if rule not in ("parity", "clean"):
        raise ValueError(f"unknown rule {rule!r}")
    # tile_rows: GLOBAL rows per streamed tile.  Big update batches (clean
    # rule) are processed in tiles with in-kernel gradient accumulation —
    # the per-update model-gradient butterfly amortizes bunch/tile_rows x.
    tile_g = tile_rows if tile_rows is not None else bunch
    if bunch % tile_g or tile_g % n_dev:
        raise ValueError(f"tile_rows {tile_g} must divide bunchsize {bunch} "
                         f"and be divisible by mesh data={n_dev}")
    tile_local = tile_g // n_dev
    if tile_local % 8:
        raise ValueError(f"local tile {tile_local} must be a multiple of 8")
    accum = bunch // tile_g
    if accum > 1 and rule != "clean":
        raise ValueError("row-tiled gradient accumulation is a clean-rule "
                         "option (parity is per-128 sequential semantics)")
    if accum > 1 and pre_grouped:
        raise ValueError("pre_grouped input regroups at bunch granularity; "
                         "tile_rows < bunchsize needs the in-jit regroup")
    if accum > 1 and sr_delta:
        raise ValueError("row-tiled accumulation rides in the momentum "
                         "buffer, which must stay f32 (no sr_delta)")
    if hbm_spill and (sr_delta or accum > 1):
        raise ValueError("hbm_spill is the f32 hybrid mode; no sr_delta or "
                         "row-tiled accumulation (same constraint as the "
                         "single-chip factory)")
    spill = _spill_set(padded, hbm_spill)

    def shard_fn(ws, ds, bs2, dbs2, x_local, t_local, scal, seed_arr):
        return _resident_call(
            x_local, t_local, list(ws), list(ds), list(bs2), list(dbs2),
            scal, seed_arr, sizes=padded, bunch=tile_local, hidden=cfg.hidden,
            output=cfg.output,
            dropout=(cfg.dropout_vis, cfg.dropout_hid) if cfg.use_dropout else (0.0, 0.0),
            dropout_mode=cfg.dropout_mode, valid_sizes=sizes, bf16=bf16,
            sr_state=False, interpret=interpret, sr_delta=sr_delta,
            axis_name="data", n_dev=n_dev, grad_n=bunch, dedy_full=dedy_full,
            mask_rows=tile_g, accum_tiles=accum, spill=spill)

    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("data"), P("data"), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def run(state: TrainState, in_chunk, targ_chunk, seed,
            lrate=opt.lrate, momentum=opt.momentum, weightcost=opt.weightcost,
            n_real=None):
        """n_real: optional dynamic count of REAL bunches when `in_chunk` is
        padded to a fixed capacity (same contract as the single-chip resident
        runner); grid steps beyond it are no-ops on every device."""
        n_bunches = in_chunk.shape[0] // bunch
        if n_bunches == 0:
            return state
        if needs_pad:
            state = _pad_state(state, sizes, padded)
            in_chunk = jnp.pad(in_chunk, ((0, 0), (0, padded[0] - sizes[0])))
            targ_chunk = jnp.pad(targ_chunk, ((0, 0), (0, padded[-1] - sizes[-1])))

        def regroup(a):
            # bunch_part row split (BP_GPU.cu:29-37) at TILE granularity:
            # device d's k-th local tile = rows [k*tile_g + d*tile_local, ...)
            # of the chunk — for accum == 1 (tile_g == bunch) this is exactly
            # the reference's bunch split, so global bunches match the
            # single-chip order.
            # pre_grouped: the caller (multi-process input pipeline) already
            # regrouped on the host and built a P("data")-sharded global
            # array — just pin the sharding.
            if pre_grouped:
                return jax.lax.with_sharding_constraint(
                    a[: n_bunches * bunch], NamedSharding(mesh, P("data")))
            d = a.shape[1]
            a = a[: n_bunches * bunch]
            n_tiles = n_bunches * accum
            a = a.reshape(n_tiles, n_dev, tile_local, d)
            a = a.transpose(1, 0, 2, 3).reshape(n_dev * n_tiles * tile_local, d)
            return jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, P("data")))

        scal = _scal_coefs(rule, bunch, sizes[-1], lrate, momentum, weightcost)
        nr = n_bunches if n_real is None else n_real
        seed_arr = jnp.stack([jnp.asarray(seed, jnp.int32),
                              jnp.asarray(nr, jnp.int32)])
        bs2 = [b.reshape(1, -1) for b in state.params["b"]]
        dbs2 = [d.reshape(1, -1) for d in state.deltas["b"]]
        ds_w = list(state.deltas["w"])
        if sr_delta:  # bf16 momentum storage (no-op cast after the 1st call)
            ds_w = [d.astype(jnp.bfloat16) for d in ds_w]
        ws, ds, bs_o, dbs_o = sharded(
            list(state.params["w"]), ds_w, bs2, dbs2,
            regroup(in_chunk), regroup(targ_chunk), scal, seed_arr)
        new = TrainState(
            params={"w": tuple(ws), "b": tuple(b.reshape(-1) for b in bs_o)},
            deltas={"w": tuple(ds), "b": tuple(d.reshape(-1) for d in dbs_o)},
            step=state.step + jnp.asarray(nr, jnp.int32),
        )
        if needs_pad:
            new = _unpad_state(new, sizes)
        return new

    return run


def sample_resident_masks(seed: int, bunch_idx: int, layer_idx: int,
                          shape, omit: float, device_idx: int = 0,
                          n_dev: int = 1, interpret: bool = False):
    """The exact dropout mask the resident kernel draws for (seed, bunch,
    layer) — same prng_seed formula, threshold, and DP row-slicing — exposed
    as a standalone pallas_call so bench.py can validate mask statistics
    (zero-rate, stream collisions, DP slice identity) on real TPU hardware.

    `shape` is the GLOBAL bunch mask shape; with n_dev > 1 the returned mask
    is device `device_idx`'s rows [d*bs_local, (d+1)*bs_local) of it — the
    device-count-invariant contract shared with parallel/mesh.py:95.
    """
    g_rows, width = int(shape[0]), int(shape[1])
    if g_rows % n_dev:
        raise ValueError(f"global rows {g_rows} not divisible by n_dev {n_dev}")
    bs_local = g_rows // n_dev
    kseed = jnp.asarray(
        [seed + bunch_idx * _BUNCH_STRIDE + layer_idx * _LAYER_STRIDE,
         device_idx], jnp.int32)

    def kern(seed_ref, o_ref, buf):
        pltpu.prng_seed(seed_ref[0])
        bits = pltpu.bitcast(pltpu.prng_random_bits((g_rows, width)), jnp.uint32)
        mask = (bits >= jnp.uint32(_mask_threshold(omit))).astype(jnp.float32)
        if n_dev > 1:
            # same staging-scratch row slice as the DP kernel (mosaic has no
            # dynamic_slice on values); the start is TRACED (seed_ref[1]) so
            # this validates the exact dynamic-pl.ds load the DP kernel does
            buf[0:g_rows, 0:width] = mask
            mask = buf[pl.ds(seed_ref[1] * bs_local, bs_local), 0:width]
        o_ref[:] = mask

    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs_local, width), jnp.float32),
        scratch_shapes=[pltpu.VMEM((g_rows, width), jnp.float32)],
        # mosaic interpret (not the HLO interpreter): prng_seed needs it
        interpret=pltpu.InterpretParams() if interpret else False,
    )(kseed)
