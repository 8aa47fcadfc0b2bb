"""Worker process for the two-process multi-host DP test.

Launched by tests/test_multihost.py as

    python tests/_multihost_worker.py <process_id> <num_processes> <port> <outdir>

Each process owns 2 virtual CPU devices; jax.distributed (gloo collectives)
joins them into one 2*num_processes-device world — the CPU-backend analog of
multiple TPU hosts joined over DCN.  The reference has no multi-node story at
all (SURVEY.md §2.3); this exercises the tpu_sednn production path:
`initialize_distributed` + `make_dp_train_chunk` (shard_map + psum) over a
mesh spanning process boundaries, with the same parity math as one chip.
"""

import os
import sys


def main() -> None:
    pid, nproc, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "arrays"

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from tpu_sednn.parallel import initialize_distributed

    initialize_distributed(coordinator=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()

    if mode == "pfile":
        _pfile_epoch(pid, nproc, outdir, sys.argv[6])
        return

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu_sednn.model import ModelConfig, init_params
    from tpu_sednn.parallel import make_dp_train_chunk, make_mesh
    from tpu_sednn.train import init_train_state
    from tpu_sednn.train.step import OptConfig

    sizes = (40, 64, 64, 16)
    cfg = ModelConfig(layersizes=sizes)
    opt = OptConfig(lrate=0.5, momentum=0.7, weightcost=1e-4, bunchsize=16)

    mesh = make_mesh(n_data=jax.device_count(), n_model=1)

    def to_global(arr: np.ndarray, spec: P) -> jax.Array:
        # every process holds the identical full array; build the global
        # jax.Array shard-by-shard so no process needs remote devices
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(arr.shape, sharding,
                                            lambda idx: jnp.asarray(arr[idx]))

    params = init_params(jax.random.key(0), cfg, scheme="glorot")
    params = jax.tree.map(
        lambda a: to_global(np.asarray(a), P()), params)
    state = init_train_state(params)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((96, sizes[0])).astype(np.float32)
    t = rng.standard_normal((96, sizes[-1])).astype(np.float32)

    run = make_dp_train_chunk(cfg, opt, mesh)
    for chunk_rng in (1, 2):
        state = run(state, to_global(x, P("data")), to_global(t, P("data")),
                    jax.random.key(chunk_rng))
    jax.block_until_ready(state.params)

    if pid == 0:
        # params are fully replicated: any addressable shard holds the value
        out = {f"w{l}": np.asarray(w.addressable_data(0))
               for l, w in enumerate(state.params["w"])}
        out.update({f"b{l}": np.asarray(b.addressable_data(0))
                    for l, b in enumerate(state.params["b"])})
        out.update({f"dw{l}": np.asarray(d.addressable_data(0))
                    for l, d in enumerate(state.deltas["w"])})
        out["step"] = np.asarray(state.step.addressable_data(0))
        np.savez(os.path.join(outdir, "multihost_params.npz"), **out)
    print(f"[worker {pid}] OK step={int(state.step.addressable_data(0))}",
          flush=True)



def _pfile_epoch(pid: int, nproc: int, outdir: str, datadir: str) -> None:
    """Multi-host pfile epoch (SURVEY §2.3 / §7 step 6): the PRODUCTION
    `train_epoch_pfile` runs under jax.distributed with the per-host sharded
    input pipeline — every process reads the pfiles (the parity lrand48
    stream must advance identically), bunch_part-regroups on the host, and
    transfers only the rows its own devices shard (make_global_chunk)."""
    import numpy as np
    import jax

    from tpu_sednn.data.rand48 import Rand48
    from tpu_sednn.model import ModelConfig, init_params
    from tpu_sednn.train import init_train_state
    from tpu_sednn.train.loop import train_epoch_pfile
    from tpu_sednn.train.step import OptConfig

    D, CONTEXT, TO = 5, 3, 1
    sizes = (D * CONTEXT + D, 64, D)
    cfg = ModelConfig(layersizes=sizes)
    opt = OptConfig(lrate=0.3, momentum=0.5, weightcost=1e-4, bunchsize=16)
    params = init_params(jax.random.key(0), cfg, scheme="glorot")
    state = init_train_state(params)

    state, res = train_epoch_pfile(
        state, cfg, opt,
        fea_file=os.path.join(datadir, "f.pfile"),
        targ_file=os.path.join(datadir, "t.pfile"),
        norm_file=os.path.join(datadir, "a.norm"),
        fea_dim=D, fea_context=CONTEXT, targ_offset=TO,
        train_sent_range=(0, 5), cv_sent_range=(6, 7),
        traincache=96, seed=3, rand=Rand48(3),
        n_data_shards=jax.device_count(), engine="xla",
    )
    if pid == 0:
        out = {f"w{l}": np.asarray(w.addressable_data(0))
               for l, w in enumerate(state.params["w"])}
        out["cv_mse"] = np.float64(res.cv_mse)
        np.savez(os.path.join(outdir, "multihost_pfile.npz"), **out)
    print(f"[worker {pid}] OK cv={res.cv_mse:.6f}", flush=True)


if __name__ == "__main__":
    main()
