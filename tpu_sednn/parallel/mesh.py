"""Device mesh + sharding — the TPU-native replacement for the reference's
(disabled) multi-GPU path.

The reference's parallelism story (SURVEY.md §2.3): split each bunch across
GPUs, sum weight/bias gradients onto GPU 0 over CUDA P2P cublasSaxpy, update
there, broadcast weights back (BP_GPU.cu:775-908, call disabled at :312-313).

Here the same semantics — sum grads over the global bunch, one update,
replicated params — are expressed two ways:

* `make_dp_train_chunk`: explicit `shard_map` over a 1-D "data" mesh axis with
  `lax.psum` for the gradient reduction.  Collectives ride ICI; everything
  else is local.  This is the production DP path and preserves parity math
  (gradient normalization by the GLOBAL bunch size).
* `make_auto_sharded_train_chunk`: jit + NamedSharding annotations over a 2-D
  ("data", "model") mesh; XLA's SPMD partitioner inserts the collectives.
  The model axis shards the hidden dimension (useful only for mega-batch
  demos — the MLP fits on one chip — but it exercises TP-style sharding).

Multi-host: `initialize_distributed` wraps jax.distributed.initialize; with
jax.make_mesh over all devices, data shards per-host land on local chips and
gradient psums cross hosts over DCN automatically.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpu_sednn.model.mlp import ModelConfig
from tpu_sednn.train.step import OptConfig, TrainState, reference_train_chunk


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devices = devices[: n_data * n_model]
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def shard_batch(x: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    return jax.device_put(x, NamedSharding(mesh, P("data")))


def replicate(tree, mesh: Mesh):
    """Fully-replicated device_put; multi-process safe (every process must
    hold the same host values — true for seed-deterministic init/restore)."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    import jax.numpy as jnp

    def rep(a):
        h = np.asarray(a)
        return jax.make_array_from_callback(h.shape, sharding,
                                            lambda idx: jnp.asarray(h[idx]))

    return jax.tree.map(rep, tree)


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (jax.distributed).  No-op if already initialized
    or single-process."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process launch


def bunch_part_regroup_host(a: np.ndarray, bunchsize: int, n_dev: int) -> np.ndarray:
    """Host (NumPy) twin of the in-jit bunch_part regroup: device d's b-th
    local slice = rows [b*bunchsize + d*bs_local, ...) of the chunk
    (BP_GPU.cu:29-37), so global bunches match single-chip order exactly.
    Used by the multi-process input pipeline, which must regroup BEFORE
    sharding rows across processes."""
    n_bunches = len(a) // bunchsize
    bs_local = bunchsize // n_dev
    a = np.ascontiguousarray(a[: n_bunches * bunchsize])
    return (a.reshape(n_bunches, n_dev, bs_local, a.shape[1])
             .transpose(1, 0, 2, 3)
             .reshape(n_dev * n_bunches * bs_local, a.shape[1]))


def make_global_chunk(a: np.ndarray, mesh: Mesh) -> jax.Array:
    """Build the global P("data")-sharded chunk array, materializing ONLY the
    shards owned by this process's devices (each host transfers 1/n_proc of
    the rows — the per-host sharded input pipeline for multi-host DP).
    Single-process: a plain sharded device_put."""
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.device_put(a, sharding)
    import jax.numpy as jnp

    return jax.make_array_from_callback(
        a.shape, sharding, lambda idx: jnp.asarray(a[idx]))


# ---------------------------------------------------------------------------
# explicit-DP chunk trainer (shard_map + psum)
# ---------------------------------------------------------------------------

def make_dp_train_chunk(cfg: ModelConfig, opt: OptConfig, mesh: Mesh,
                        pre_grouped: bool = False):
    """DP chunk trainer: each device scans its local bunch slices; per-bunch
    gradients are psum'd over the "data" axis before the (replicated) update.

    Parity semantics: each device computes its local loss normalized by the
    GLOBAL bunch size, so the psum of local gradients equals the single-chip
    gradient exactly (sum grads, one update, identical replicas — the
    reference's multi-GPU design, BP_GPU.cu:863-884).

    pre_grouped: chunk rows arrive already bunch_part-regrouped and
    P("data")-sharded (the multi-process input pipeline regroups on the
    host); skip the in-jit regroup.
    """
    n_dev = mesh.shape["data"]
    if opt.bunchsize % n_dev != 0:
        raise ValueError(f"bunchsize {opt.bunchsize} not divisible by mesh data={n_dev}")
    bs_local = opt.bunchsize // n_dev

    from tpu_sednn.model.mlp import _dropout_mask, forward

    n_weight_layers = len(cfg.layersizes) - 1

    def local_masks(rng):
        """Device-count-invariant dropout masks: generate the GLOBAL bunch's
        masks with the exact key schedule of the single-chip forward()
        (split(rng, n_layers), one mask per layer input), then slice this
        device's rows.  With the bunch_part row regrouping below, DP dropout
        training is therefore bit-identical to gpu_used=1 — the reference's
        identical-replica DP contract (BP_GPU.cu:863-884)."""
        d_idx = jax.lax.axis_index("data")
        keys = jax.random.split(rng, n_weight_layers)
        masks = []
        for l in range(n_weight_layers):
            omit = cfg.dropout_vis if l == 0 else cfg.dropout_hid
            if omit > 0.0:
                full = _dropout_mask(keys[l], (opt.bunchsize, cfg.layersizes[l]),
                                     omit, cfg.dropout_rng)
                masks.append(jax.lax.dynamic_slice_in_dim(full, d_idx * bs_local,
                                                          bs_local, 0))
            else:
                masks.append(None)
        return masks

    def local_step(state: TrainState, x, t, rng, lrate, momentum, weightcost):
        n_global = opt.bunchsize
        masks = local_masks(rng) if cfg.use_dropout else None

        def loss_fn(p):
            out = forward(p, x, cfg, train=True, rng=rng, dropout_masks=masks)
            return jnp.sum((out - t) ** 2) / n_global  # global normalization

        grads = jax.grad(loss_fn)(state.params)
        grads = jax.lax.psum(grads, "data")  # == single-chip gradient, exactly

        def upd(delta, p, g, wc):
            nd = momentum * delta - (1.0 - momentum) * lrate * (g / n_global + wc * p)
            return nd, p + nd

        new_w = [upd(d, w, g, weightcost) for d, w, g in
                 zip(state.deltas["w"], state.params["w"], grads["w"])]
        new_b = [upd(d, b, g, 0.0) for d, b, g in
                 zip(state.deltas["b"], state.params["b"], grads["b"])]
        dw, w = zip(*new_w)
        db, b = zip(*new_b)
        return TrainState(params={"w": w, "b": b}, deltas={"w": dw, "b": db},
                          step=state.step + 1)

    def chunk_shard(state: TrainState, x_local, t_local, rng, lrate, momentum, weightcost):
        n_local = x_local.shape[0]
        n_bunches = n_local // bs_local
        xb = x_local[: n_bunches * bs_local].reshape(n_bunches, bs_local, x_local.shape[1])
        tb = t_local[: n_bunches * bs_local].reshape(n_bunches, bs_local, t_local.shape[1])
        rngs = jax.random.split(rng, n_bunches)

        def body(st, inp):
            x, t, r = inp
            return local_step(st, x, t, r, lrate, momentum, weightcost), None

        state, _ = jax.lax.scan(body, state, (xb, tb, rngs))
        return state

    sharded = shard_map(
        chunk_shard,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def run(state: TrainState, in_chunk, targ_chunk, rng,
            lrate=opt.lrate, momentum=opt.momentum, weightcost=opt.weightcost):
        # Regroup rows so global bunch b = concat over devices of each
        # device's b-th local slice — the reference's bunch_part split
        # (BP_GPU.cu:29-37).  Without this, contiguous sharding would form
        # different bunches than a single chip and break step-for-step parity.
        n = in_chunk.shape[0]
        n_bunches = n // opt.bunchsize
        if n_bunches == 0:  # chunk smaller than one bunch: all samples dropped
            return state

        def regroup(a):
            if pre_grouped:
                return jax.lax.with_sharding_constraint(
                    a[: n_bunches * opt.bunchsize], NamedSharding(mesh, P("data")))
            d = a.shape[1]
            a = a[: n_bunches * opt.bunchsize]
            a = a.reshape(n_bunches, n_dev, bs_local, d)
            a = a.transpose(1, 0, 2, 3).reshape(n_dev * n_bunches * bs_local, d)
            return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, P("data")))

        return sharded(state, regroup(in_chunk), regroup(targ_chunk), rng,
                       jnp.float32(lrate), jnp.float32(momentum), jnp.float32(weightcost))

    return run


# ---------------------------------------------------------------------------
# auto-SPMD (jit + sharding annotations, 2-D mesh)
# ---------------------------------------------------------------------------

def state_shardings(state: TrainState, mesh: Mesh, shard_model_axis: bool) -> TrainState:
    """NamedShardings for a TrainState: params/deltas replicated over "data";
    optionally hidden (non-IO) weight dims sharded over "model"."""

    def spec_for_w(w: jnp.ndarray) -> NamedSharding:
        if shard_model_axis:
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    def spec_for_b(b: jnp.ndarray) -> NamedSharding:
        if shard_model_axis:
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return TrainState(
        params={"w": tuple(spec_for_w(w) for w in state.params["w"]),
                "b": tuple(spec_for_b(b) for b in state.params["b"])},
        deltas={"w": tuple(spec_for_w(w) for w in state.deltas["w"]),
                "b": tuple(spec_for_b(b) for b in state.deltas["b"])},
        step=NamedSharding(mesh, P()),
    )


def make_auto_sharded_train_chunk(cfg: ModelConfig, opt: OptConfig, mesh: Mesh,
                                  shard_model_axis: bool = True):
    """jit-auto-partitioned chunk trainer over a ("data", "model") mesh.

    Batch rows shard over "data"; weight columns (hidden units) over "model".
    XLA inserts the all-reduces.  Dropout must be off for this path to keep
    mask shapes unsharded-agnostic (use the shard_map path for dropout runs).
    """
    data_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    cache = {}  # one compiled fn per state structure (jit keys on identity)

    def run(state: TrainState, in_chunk, targ_chunk, rng,
            lrate=opt.lrate, momentum=opt.momentum, weightcost=opt.weightcost):
        key = (len(state.params["w"]),)
        if key not in cache:
            st_sh = state_shardings(state, mesh, shard_model_axis)
            cache[key] = jax.jit(
                lambda s, x, t, r, lr, m, wc: reference_train_chunk(
                    s, x, t, cfg,
                    OptConfig(lrate=lr, momentum=m, weightcost=wc, bunchsize=opt.bunchsize),
                    r,
                ),
                in_shardings=(st_sh, data_sh, data_sh, rep, rep, rep, rep),
                out_shardings=st_sh,
            )
        return cache[key](state, in_chunk, targ_chunk, rng,
                          jnp.float32(lrate), jnp.float32(momentum), jnp.float32(weightcost))

    return run
