"""Epoch-level training driver — the in-process equivalent of `BPtrain main`
(/root/reference/BPtrain.cc:16-97) plus the Perl epoch loop
(finetune_DNN_speech_enhancement_dropout_NAT.pl).

Unlike the reference (one process per epoch, state on disk between epochs),
this keeps params + momentum on device across epochs and streams chunks
through a single jitted chunk-trainer.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_sednn.data.pipeline import ChunkPlan, plan_chunks, read_chunk_parity
from tpu_sednn.data.rand48 import Rand48
from tpu_sednn.io.norm import load_norm
from tpu_sednn.io.pfile import read_pfile_info
from tpu_sednn.io.wts import load_wts, save_wts
from tpu_sednn.model.mlp import ModelConfig, params_from_wts, params_to_wts
from tpu_sednn.train.step import (
    OptConfig,
    TrainState,
    cv_squared_error,
    init_train_state,
    make_jit_train_chunk,
)
from tpu_sednn.utils.logging import Logger


_RUNNER_MEMO: Dict = {}


def _auto_engine(cfg: ModelConfig, opt: OptConfig,
                 engine_kwargs: Optional[Dict] = None) -> Tuple[str, Dict]:
    """engine="auto" resolution -> (engine, extra_engine_kwargs).

    The VMEM-resident megakernel on a TPU backend IF its pinned state +
    input windows fit the mosaic VMEM budget (the canonical 8 kHz net uses
    ~99 MB of the 128 MB).  When the f32 state misses the budget — the
    16 kHz full-band 3084-2048x3-257 net at ~129 MiB, a real on-chip compile
    failure — auto degrades in order (round-5 on-chip shoot-out,
    artifacts/kernel_bench_r5.json):

    1. sr_delta (bf16 MOMENTUM storage with hardware-PRNG stochastic
       rounding, weights stay f32): 93.6 MiB; measured 0.122 ms/bunch —
       fastest, and quality-certified against an XLA-f32 control at
       flagship scale (CV within 0.08 %, round 4).
    2. hbm_spill=1 (f32 HYBRID residency): the smallest layer's W+Delta
       stays in HBM, block-staged per bunch; the exact f32 update rule, no
       SR quantization.  16 kHz: 119.0 MiB, fits; measured 0.138 ms/bunch
       warm — 13 % behind sr_delta (the ~20 serialized staging-DMA
       latencies per bunch) but 1.44x the XLA fallback, so it is the rung
       for callers who need f32-exact state over peak speed.
    3. the XLA lax.scan fallback (0.198 ms/bunch).

    The extra kwargs returned must be merged into engine_kwargs by the
    caller.  TPU_SEDNN_NO_SR_FALLBACK=1 skips step 1;
    TPU_SEDNN_NO_SPILL_FALLBACK=1 skips step 2."""
    if jax.default_backend() != "tpu":
        return "xla", {}
    from tpu_sednn.ops.resident_chunk import resident_fits_vmem

    kw = engine_kwargs or {}
    opts = dict(sr_state=kw.get("sr_state", False),
                sr_delta=kw.get("sr_delta", False),
                tile_rows=kw.get("tile_rows"),
                hbm_spill=kw.get("hbm_spill", 0))
    if resident_fits_vmem(cfg, opt, **opts):
        return "resident", {}
    import os

    plain = (not opts["sr_state"] and not opts["sr_delta"]
             and not opts["hbm_spill"])
    # a caller-pinned tile_rows < bunchsize means row-tiled ACCUMULATION,
    # which the resident factory rejects combined with either degrade rung
    # (sr_delta rides in the f32 momentum buffer; hbm_spill would stream
    # the spilled momentum per tile) — degrade to XLA instead of proposing
    # a combination make_resident_train_chunk raises on
    no_accum = opts["tile_rows"] in (None, opt.bunchsize)
    if (plain and no_accum
            and not os.environ.get("TPU_SEDNN_NO_SR_FALLBACK")
            and resident_fits_vmem(cfg, opt, **{**opts, "sr_delta": True})):
        return "resident", {"sr_delta": True}
    if (plain and no_accum
            and not os.environ.get("TPU_SEDNN_NO_SPILL_FALLBACK")
            and resident_fits_vmem(cfg, opt, **{**opts, "hbm_spill": 1})):
        return "resident", {"hbm_spill": 1}
    return "xla", {}


def make_chunk_runner(cfg: ModelConfig, opt: OptConfig, engine: str = "xla",
                      n_data_shards: int = 1, pre_grouped: bool = False,
                      **engine_kwargs):
    """Chunk-trainer factory shared by the epoch drivers.

    Memoized on (cfg, opt.bunchsize, engine, shards, kwargs): repeated calls
    (one per epoch in the recipe driver) return the SAME jitted runner, so
    nothing recompiles across epochs — essential on this backend, where the
    persistent compilation cache is unsupported and each mosaic compile costs
    ~minutes over the remote-compile relay (lrate/momentum stay dynamic args).

    engine:
      * "xla"      — the jitted lax.scan parity chunk (make_jit_train_chunk);
      * "resident" — the VMEM-resident whole-chunk megakernel
        (ops/resident_chunk.py; ~1.5x on v5e-class chips, TPU only);
      * "auto"     — "resident" on a TPU backend, "xla" elsewhere.
    n_data_shards > 1 takes the data-parallel variant of the engine over a
    1-D ("data",) mesh: the DP resident megakernel with its in-kernel
    butterfly all-reduce, or the shard_map+psum XLA path.  pre_grouped marks
    chunk rows as already bunch_part-regrouped and sharded by the caller
    (the multi-process input pipeline).
    engine_kwargs are forwarded to the resident factory (interpret/bf16).
    All runners share the signature
      run(state, x, t, rng, lrate, momentum, weightcost[, n_real]) -> state
    with the hyperparameters REQUIRED (the memo ignores opt's dynamic fields,
    so defaults would silently come from whichever opt created the runner
    first — callers must always pass them explicitly).
    """
    if engine == "auto":
        engine, extra = _auto_engine(cfg, opt, engine_kwargs)
        engine_kwargs = {**engine_kwargs, **extra}
    memo_key = (cfg, opt.bunchsize, engine, n_data_shards, pre_grouped,
                tuple(sorted(engine_kwargs.items())))
    if memo_key in _RUNNER_MEMO:
        return _RUNNER_MEMO[memo_key]
    if n_data_shards > 1:
        from tpu_sednn.parallel import make_mesh

        mesh = make_mesh(n_data=n_data_shards, n_model=1)
        if engine == "resident":
            from tpu_sednn.ops.resident_chunk import make_dp_resident_train_chunk

            run_dp = make_dp_resident_train_chunk(
                cfg, opt, mesh, pre_grouped=pre_grouped, **engine_kwargs)

            def run(state, x, t, rng, lrate, momentum, weightcost, n_real=None):
                seed = jax.random.randint(rng, (), 0, 2**31 - 1, jnp.int32)
                return run_dp(state, x, t, seed, lrate, momentum, weightcost,
                              n_real=n_real)
        else:
            from tpu_sednn.parallel import make_dp_train_chunk

            run_xla = make_dp_train_chunk(cfg, opt, mesh,
                                          pre_grouped=pre_grouped)

            def run(state, x, t, rng, lrate, momentum, weightcost, n_real=None):
                if n_real is not None:
                    raise ValueError("XLA DP path takes trimmed chunks, not "
                                     "n_real-padded ones")
                return run_xla(state, x, t, rng, lrate, momentum, weightcost)
    elif engine == "resident":
        from tpu_sednn.ops.resident_chunk import make_resident_train_chunk

        run_res = make_resident_train_chunk(cfg, opt, **engine_kwargs)

        def run(state, x, t, rng, lrate, momentum, weightcost, n_real=None):
            # the in-kernel hardware PRNG takes an int32 seed, not a key
            seed = jax.random.randint(rng, (), 0, 2**31 - 1, jnp.int32)
            return run_res(state, x, t, seed, lrate, momentum, weightcost,
                           n_real=n_real)

    elif engine == "xla":
        run_j = make_jit_train_chunk(cfg, opt)

        def run(state, x, t, rng, lrate, momentum, weightcost):
            return run_j(state, x, t, rng, lrate, momentum, weightcost)
    else:
        raise ValueError(f"unknown engine {engine!r}")
    _RUNNER_MEMO[memo_key] = run
    return run


@dataclass
class EpochResult:
    epoch: int
    cv_mse: float
    train_samples: int
    seconds: float
    samples_per_sec: float


def train_epoch_pfile(
    state: TrainState,
    cfg: ModelConfig,
    opt: OptConfig,
    fea_file: str,
    targ_file: str,
    norm_file: str,
    fea_dim: int,
    fea_context: int,
    targ_offset: int,
    train_sent_range: Tuple[int, int],
    cv_sent_range: Tuple[int, int],
    traincache: int,
    seed: int,
    nat: bool = True,
    logger: Optional[Logger] = None,
    rand: Optional[Rand48] = None,
    n_data_shards: int = 1,
    engine: str = "xla",
    cv_dump_path: Optional[str] = None,
    device_splice: Optional[bool] = None,
    engine_kwargs: Optional[Dict] = None,
) -> Tuple[TrainState, EpochResult]:
    """One epoch over pfiles with reference semantics (shuffled chunk order,
    lrand48 scatter, quirk-exact update), then the CV pass.

    This is `BPtrain` run once, as a function: same arguments, same logging
    shape, state returned instead of written to disk.

    cv_dump_path: write every CV output frame as a "%f "-separated line —
    the CV_out.txt golden-output channel of BP_GPU::CrossValid
    (BP_GPU.cu:443-473; the reference ships the fprintf commented out and
    leaves an empty file, so here it is opt-in and actually writes).

    device_splice: ship RAW normalized frames + int32 gather tables per chunk
    and run splice/NAT/scatter on device (data.device_chunk) — ~1/12th the
    host->device transfer — with every chunk padded to fixed capacities so
    the resident megakernel compiles ONCE for the whole epoch (its dynamic
    n_real skips the padded bunches).  Same math as read_chunk_parity.
    None = auto: on for the single-shard resident engine on a TPU backend.
    """
    log = logger or Logger()
    t0 = time.time()
    fea_info = read_pfile_info(fea_file, fea_dim)
    out_dim = len(np.asarray(state.params["b"][-1]))
    targ_info = read_pfile_info(targ_file, out_dim)
    if fea_info.num_frames != targ_info.num_frames or fea_info.num_sentences != targ_info.num_sentences:
        raise ValueError("feature/target pfiles inconsistent")
    if not np.array_equal(fea_info.frames_before_sent, targ_info.frames_before_sent):
        raise ValueError("feature/target pfile tails inconsistent")
    mean, inv_std = load_norm(norm_file, fea_dim)

    # single srand48 stream per run: parity init consumed it first, so accept
    # the caller's instance to continue the exact sequence (Interface.cc:337)
    rand = rand if rand is not None else Rand48(seed)
    plan = plan_chunks(fea_info.frames_before_sent, train_sent_range, fea_context, traincache)
    log.info(
        f"Training sentences have {plan.total_chunks} chunks, {plan.total_samples} samples."
    )
    chunk_order = rand.shuffle_indices(plan.total_chunks)

    # the reference's gpu_used flag maps to data-parallel mesh shards here
    # (the multi-GPU bunch-split of BP_GPU.cu:29-37, actually enabled)
    resolved_engine = engine
    if resolved_engine == "auto":
        resolved_engine, _extra = _auto_engine(cfg, opt, engine_kwargs)
        engine_kwargs = {**(engine_kwargs or {}), **_extra}
    n_proc = jax.process_count()
    multi_process = n_proc > 1 and n_data_shards > 1
    if device_splice is None:
        # DP resident keeps device_splice: fixed-capacity chunks + dynamic
        # n_real mean ONE mosaic compile serves the whole epoch per shard
        device_splice = (resolved_engine == "resident" and not multi_process
                         and jax.default_backend() == "tpu" and nat)
    mesh = None
    if n_data_shards > 1:
        from tpu_sednn.parallel import make_mesh, replicate

        mesh = make_mesh(n_data=n_data_shards, n_model=1)
        state = TrainState(
            params=replicate(state.params, mesh),
            deltas=replicate(state.deltas, mesh),
            step=state.step,
        )
        # resident engine -> DP megakernel (in-kernel butterfly all-reduce);
        # xla -> shard_map+psum.  Multi-process runs pre-regroup chunks on
        # the host and ship only each process's rows (per-host sharding).
        run_chunk = make_chunk_runner(cfg, opt, resolved_engine,
                                      n_data_shards=n_data_shards,
                                      pre_grouped=multi_process,
                                      **(engine_kwargs or {}))
        if resolved_engine != "resident":
            device_splice = False
    else:
        run_chunk = make_chunk_runner(cfg, opt, resolved_engine,
                                      **(engine_kwargs or {}))
    rng = jax.random.key(seed)

    # host chunk prep runs one step ahead of device compute (single worker, so
    # the parity lrand48 stream is still consumed strictly in chunk order)
    from tpu_sednn.data.prefetch import Prefetcher

    if device_splice:
        from tpu_sednn.data.device_chunk import (
            build_chunk_on_device, chunk_capacities, read_chunk_indexed,
        )

        frames_cap, samples_cap, seg_cap = chunk_capacities(fea_info, plan, fea_context)
        samples_cap = ((samples_cap + opt.bunchsize - 1)
                       // opt.bunchsize) * opt.bunchsize

        def read_idx(ci):
            item = read_chunk_indexed(
                fea_info, targ_info, plan, int(ci), fea_context, mean, inv_std,
                rand, frames_cap=frames_cap, samples_cap=samples_cap,
                seg_cap=seg_cap,
            )
            # start the host->device copy from the prefetch worker so chunk
            # k+1's transfer rides under chunk k's dispatch/compute — on the
            # bandwidth-limited relay the epoch is transfer-bound
            return tuple(jax.device_put(a) for a in item[:6]) + (item[6],)

        for i, item in enumerate(Prefetcher(chunk_order, read_idx, depth=2)):
            fea, targ, win_start, seg_id, seg_off, seg_len, n_samples = item
            x, t = build_chunk_on_device(
                fea, targ, win_start, seg_id, seg_off, seg_len,
                fea_context, targ_offset, nat)
            rng, sub = jax.random.split(rng)
            n_real = n_samples // opt.bunchsize
            if resolved_engine == "resident":
                state = run_chunk(state, x, t, sub, opt.lrate, opt.momentum,
                                  opt.weightcost, n_real=n_real)
            else:  # xla engine: trim to real bunches (shape varies per chunk)
                keep = n_real * opt.bunchsize
                state = run_chunk(state, x[:keep], t[:keep], sub,
                                  opt.lrate, opt.momentum, opt.weightcost)
            log.info(f"Starting chunk {i + 1} of {plan.total_chunks} "
                     f"containing {n_samples} samples.")
    else:
        def read(ci):
            return read_chunk_parity(
                fea_info, targ_info, plan, int(ci), fea_context, targ_offset,
                mean, inv_std, rand, nat=nat,
            )

        if multi_process:
            # per-host sharded input: every process reads the full chunk (the
            # parity lrand48 stream must be consumed identically everywhere)
            # but regroups bunch_part rows on the host and TRANSFERS only the
            # rows its own devices shard (make_global_chunk)
            from tpu_sednn.parallel import bunch_part_regroup_host, make_global_chunk

            def to_dev(a):
                return make_global_chunk(
                    bunch_part_regroup_host(np.asarray(a), opt.bunchsize,
                                            n_data_shards), mesh)
        else:
            to_dev = jnp.asarray

        for i, (indata, targ) in enumerate(Prefetcher(chunk_order, read, depth=2)):
            rng, sub = jax.random.split(rng)
            state = run_chunk(state, to_dev(indata), to_dev(targ), sub,
                              opt.lrate, opt.momentum, opt.weightcost)
            log.info(f"Starting chunk {i + 1} of {plan.total_chunks} containing {len(indata)} samples.")

    # CV phase (BPtrain.cc:61-87): unshuffled chunks, partial bunches included
    cv_plan = plan_chunks(fea_info.frames_before_sent, cv_sent_range, fea_context, traincache)
    sq_err = 0.0
    cv_params = state.params
    if multi_process:
        # params are replicated: every process computes the identical CV on
        # its own devices from a host copy of any addressable replica
        cv_params = jax.tree.map(
            lambda a: np.asarray(a.addressable_data(0)), state.params)
    dump_f = open(cv_dump_path, "w") if cv_dump_path else None
    if device_splice and dump_f is None and cv_plan.total_chunks > 0:
        # CV over the same on-device splice path: raw 129-dim frames over the
        # link instead of 1548-dim spliced samples (12x fewer bytes), padded
        # to fixed capacities, garbage rows masked out of the error sum
        from tpu_sednn.data.device_chunk import (
            build_chunk_on_device, chunk_capacities, read_chunk_indexed,
        )
        from tpu_sednn.train.step import cv_squared_error_masked

        cv_caps = chunk_capacities(fea_info, cv_plan, fea_context)

        def read_cv(ci):
            return read_chunk_indexed(
                fea_info, targ_info, cv_plan, int(ci), fea_context, mean,
                inv_std, None, frames_cap=cv_caps[0], samples_cap=cv_caps[1],
                seg_cap=cv_caps[2],
            )

        for item in Prefetcher(range(cv_plan.total_chunks), read_cv, depth=2):
            fea, targ, win_start, seg_id, seg_off, seg_len, n_samples = item
            x, tt = build_chunk_on_device(
                jnp.asarray(fea), jnp.asarray(targ), jnp.asarray(win_start),
                jnp.asarray(seg_id), jnp.asarray(seg_off), jnp.asarray(seg_len),
                fea_context, targ_offset, nat)
            sq_err += float(cv_squared_error_masked(
                cv_params, x, tt, jnp.int32(n_samples), cfg))
        cv_mse = sq_err / max(cv_plan.total_samples, 1)
        dt = time.time() - t0
        log.info(f"CV over. squared error: {cv_mse:f}")
        log.info(f"Total cost time: {dt:.1f} s.")
        return state, EpochResult(
            epoch=-1, cv_mse=cv_mse, train_samples=plan.total_samples,
            seconds=dt, samples_per_sec=plan.total_samples / max(dt, 1e-9),
        )
    for ci in range(cv_plan.total_chunks):
        indata, targ = read_chunk_parity(
            fea_info, targ_info, cv_plan, ci, fea_context, targ_offset,
            mean, inv_std, None, nat=nat,
        )
        if dump_f is not None:
            from tpu_sednn.train.step import cv_forward_and_sqerr

            out, se = cv_forward_and_sqerr(
                cv_params, jnp.asarray(indata), jnp.asarray(targ), cfg)
            np.savetxt(dump_f, np.asarray(out), fmt="%f", delimiter=" ")
            sq_err += float(se)
            continue
        sq_err += float(cv_squared_error(cv_params, jnp.asarray(indata), jnp.asarray(targ), cfg))
    if dump_f is not None:
        dump_f.close()
    cv_mse = sq_err / max(cv_plan.total_samples, 1)
    dt = time.time() - t0
    log.info(f"CV over. squared error: {cv_mse:f}")
    log.info(f"Total cost time: {dt:.1f} s.")
    return state, EpochResult(
        epoch=-1, cv_mse=cv_mse, train_samples=plan.total_samples,
        seconds=dt, samples_per_sec=plan.total_samples / max(dt, 1e-9),
    )


def train_epochs_arrays(
    state: TrainState,
    cfg: ModelConfig,
    opt_schedule: Callable[[int], OptConfig],
    x: np.ndarray,
    t: np.ndarray,
    x_cv: np.ndarray,
    t_cv: np.ndarray,
    n_epochs: int,
    seed: int = 0,
    traincache: int = 102400,
    logger: Optional[Logger] = None,
    on_epoch: Optional[Callable[[int, TrainState, EpochResult], None]] = None,
    profile_dir: Optional[str] = None,
    engine: str = "xla",
    engine_kwargs: Optional[Dict] = None,
    ckpt_dir: Optional[str] = None,
    ckpt_every: int = 1,
) -> Tuple[TrainState, List[EpochResult]]:
    """In-memory epoch loop over prebuilt sample matrices (TPU-first path).

    opt_schedule(epoch) supplies per-epoch lr/momentum (the Perl recipe's
    momentum ramp 0.5 -> 0.9, finetune_...NAT.pl:36,138,221).
    profile_dir: capture a jax.profiler trace of the run (TensorBoard format).

    Crash recovery (improves on the reference's per-epoch `.wts`-only story,
    BPtrain.cc:56-59, which loses momentum state): when `ckpt_dir` is given,
    an Orbax checkpoint carrying params+momentum+cv history is written every
    `ckpt_every` epochs and the call RESUMES from the newest one if present.
    Per-epoch RNG keys are derived as fold_in(seed, epoch), so a resumed run
    continues the exact key stream — kill-and-resume reproduces the
    uninterrupted final state bit-for-tolerance (tests/test_checkpoint.py).
    A non-finite CV error aborts immediately (NaN guard / failure detection)
    rather than burning epochs on a diverged model.
    """
    from tpu_sednn.utils.profiling import trace

    log = logger or Logger()
    results: List[EpochResult] = []
    start_epoch = 0
    if ckpt_dir is not None:
        from tpu_sednn.utils.checkpoint import latest_step, restore_checkpoint

        s = latest_step(ckpt_dir)
        if s is not None:
            state, extra, _ = restore_checkpoint(ckpt_dir, s)
            start_epoch = int(extra.get("epoch", s - 1)) + 1
            for e, cv in enumerate(extra.get("cv_hist", [])):
                results.append(EpochResult(e, float(cv), x.shape[0], 0.0, 0.0))
            log.info(f"resumed from checkpoint {ckpt_dir} at epoch {start_epoch}")
    n = x.shape[0]
    base_key = jax.random.key(seed)
    run_chunk = make_chunk_runner(cfg, opt_schedule(0), engine,
                                  **(engine_kwargs or {}))  # one compile; lr/m dynamic
    with trace(profile_dir):
        for epoch in range(start_epoch, n_epochs):
            t0 = time.time()
            opt = opt_schedule(epoch)
            # epoch-indexed key stream (resume-invariant, see docstring)
            key = jax.random.fold_in(base_key, epoch)
            key, kperm = jax.random.split(key)
            perm = np.asarray(jax.random.permutation(kperm, n))
            for st in range(0, n, traincache):
                idx = perm[st : st + traincache]
                key, sub = jax.random.split(key)
                state = run_chunk(
                    state, jnp.asarray(x[idx]), jnp.asarray(t[idx]), sub,
                    opt.lrate, opt.momentum, opt.weightcost,
                )
            cv_mse = float(
                cv_squared_error(state.params, jnp.asarray(x_cv), jnp.asarray(t_cv), cfg)
            ) / len(x_cv)
            if not np.isfinite(cv_mse):
                raise FloatingPointError(
                    f"non-finite CV error at epoch {epoch} (diverged); "
                    f"last checkpoint: {ckpt_dir or 'none'}"
                )
            dt = time.time() - t0
            res = EpochResult(epoch, cv_mse, n, dt, n / max(dt, 1e-9))
            results.append(res)
            log.info(
                f"epoch {epoch}: cv_mse={cv_mse:.6f} lr={opt.lrate} m={opt.momentum} "
                f"({res.samples_per_sec:.0f} samples/s)"
            )
            if ckpt_dir is not None and (
                (epoch + 1) % ckpt_every == 0 or epoch == n_epochs - 1
            ):
                from tpu_sednn.utils.checkpoint import save_checkpoint

                save_checkpoint(
                    ckpt_dir, epoch + 1, state,
                    extra={"epoch": epoch,
                           "cv_hist": [float(r.cv_mse) for r in results]},
                )
            if on_epoch is not None:
                on_epoch(epoch, state, res)
    return state, results
