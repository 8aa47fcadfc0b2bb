"""Data-parallel + model-sharded training on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_sednn.model import ModelConfig, init_params
from tpu_sednn.parallel import (
    make_auto_sharded_train_chunk,
    make_dp_train_chunk,
    make_mesh,
    replicate,
    shard_batch,
)
from tpu_sednn.train import init_train_state, make_jit_train_chunk
from tpu_sednn.train.step import OptConfig, cv_squared_error

SIZES = (40, 64, 64, 16)


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((n, SIZES[0])).astype(np.float32),
            rng.standard_normal((n, SIZES[-1])).astype(np.float32))


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] * mesh.shape["model"] == len(jax.devices())
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_dp_matches_single_device():
    """shard_map DP with global-n normalization must reproduce single-chip
    math (modulo fp reduction order)."""
    cfg = ModelConfig(layersizes=SIZES)
    opt = OptConfig(lrate=0.5, momentum=0.7, weightcost=1e-4, bunchsize=32)
    params = init_params(jax.random.key(0), cfg, scheme="glorot")
    x, t = _data(96)

    st1 = init_train_state(params)
    run1 = make_jit_train_chunk(cfg, opt)
    st1 = run1(st1, jnp.asarray(x), jnp.asarray(t), jax.random.key(1))

    mesh = make_mesh(n_data=4, n_model=1)
    st2 = init_train_state(replicate(params, mesh))
    run2 = make_dp_train_chunk(cfg, opt, mesh)
    st2 = run2(st2, shard_batch(jnp.asarray(x), mesh), shard_batch(jnp.asarray(t), mesh),
               jax.random.key(1))

    assert int(st1.step) == int(st2.step) == 3
    for l in range(len(SIZES) - 1):
        np.testing.assert_allclose(
            np.asarray(st1.params["w"][l]), np.asarray(st2.params["w"][l]),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(st1.deltas["b"][l]), np.asarray(st2.deltas["b"][l]),
            rtol=1e-5, atol=1e-6,
        )


def test_dp_dropout_matches_single_device():
    """Dropout masks are built for the GLOBAL bunch and sliced per device, so
    DP training with dropout is device-count-invariant: exact same masks (and
    trained weights) as gpu_used=1, for any shard count."""
    cfg = ModelConfig(layersizes=SIZES, dropout_vis=0.1, dropout_hid=0.2)
    opt = OptConfig(lrate=0.5, momentum=0.5, weightcost=0.0, bunchsize=32)
    params = init_params(jax.random.key(0), cfg, scheme="glorot")
    x, t = _data(96)

    st1 = init_train_state(params)
    run1 = make_jit_train_chunk(cfg, opt)
    st1 = run1(st1, jnp.asarray(x), jnp.asarray(t), jax.random.key(1))

    for n_dev in (2, 4):
        mesh = make_mesh(n_data=n_dev, n_model=1)
        st2 = init_train_state(replicate(params, mesh))
        run2 = make_dp_train_chunk(cfg, opt, mesh)
        st2 = run2(st2, shard_batch(jnp.asarray(x), mesh),
                   shard_batch(jnp.asarray(t), mesh), jax.random.key(1))
        assert int(st2.step) == int(st1.step) == 3
        for l in range(len(SIZES) - 1):
            np.testing.assert_allclose(
                np.asarray(st1.params["w"][l]), np.asarray(st2.params["w"][l]),
                rtol=1e-5, atol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(st1.deltas["b"][l]), np.asarray(st2.deltas["b"][l]),
                rtol=1e-5, atol=1e-6,
            )


def test_dp_with_dropout_runs_and_learns():
    cfg = ModelConfig(layersizes=SIZES, dropout_vis=0.1, dropout_hid=0.2)
    opt = OptConfig(lrate=1.0, momentum=0.5, weightcost=0.0, bunchsize=64)
    mesh = make_mesh(n_data=8, n_model=1)
    params = replicate(init_params(jax.random.key(0), cfg, scheme="glorot"), mesh)
    st = init_train_state(params)
    run = make_dp_train_chunk(cfg, opt, mesh)

    rng = np.random.default_rng(3)
    proj = rng.standard_normal((SIZES[0], SIZES[-1])).astype(np.float32) * 0.3
    x = rng.standard_normal((1024, SIZES[0])).astype(np.float32)
    t = np.tanh(x @ proj)
    xj, tj = shard_batch(jnp.asarray(x), mesh), shard_batch(jnp.asarray(t), mesh)
    e0 = float(cv_squared_error(st.params, xj, tj, cfg)) / len(x)
    for i in range(10):
        st = run(st, xj, tj, jax.random.key(i))
    e1 = float(cv_squared_error(st.params, xj, tj, cfg)) / len(x)
    assert e1 < 0.8 * e0, (e0, e1)


def test_auto_sharded_2d_mesh():
    """jit-auto path over ("data","model"): weights sharded on hidden dim."""
    cfg = ModelConfig(layersizes=SIZES)
    opt = OptConfig(lrate=0.5, momentum=0.7, weightcost=0.0, bunchsize=32)
    mesh = make_mesh(n_data=4, n_model=2)
    params = init_params(jax.random.key(0), cfg, scheme="glorot")
    x, t = _data(64)

    st1 = init_train_state(params)
    run1 = make_jit_train_chunk(cfg, opt)
    st1 = run1(st1, jnp.asarray(x), jnp.asarray(t), jax.random.key(1))

    st2 = init_train_state(params)
    run2 = make_auto_sharded_train_chunk(cfg, opt, mesh, shard_model_axis=True)
    st2 = run2(st2, jnp.asarray(x), jnp.asarray(t), jax.random.key(1))

    for l in range(len(SIZES) - 1):
        np.testing.assert_allclose(
            np.asarray(st1.params["w"][l]), np.asarray(st2.params["w"][l]),
            rtol=1e-5, atol=1e-6,
        )


def test_bunch_part_regroup_host_matches_jit_regroup():
    """The multi-process input pipeline's host regroup must equal the in-jit
    regroup: device d's b-th local slice = rows [b*bunch + d*bs_local, ...)."""
    import numpy as np

    from tpu_sednn.parallel import bunch_part_regroup_host

    bunch, n_dev = 16, 4
    a = np.arange(5 * bunch * 3, dtype=np.float32).reshape(-1, 3)  # 5 bunches + 0 partial
    out = bunch_part_regroup_host(a, bunch, n_dev)
    bs_local = bunch // n_dev
    n_bunches = len(a) // bunch
    assert out.shape == a.shape
    for d in range(n_dev):
        for b in range(n_bunches):
            got = out[(d * n_bunches + b) * bs_local:(d * n_bunches + b + 1) * bs_local]
            want = a[b * bunch + d * bs_local: b * bunch + (d + 1) * bs_local]
            np.testing.assert_array_equal(got, want)
    # partial bunch rows are trimmed
    a2 = np.arange((5 * bunch + 7) * 3, dtype=np.float32).reshape(-1, 3)
    assert bunch_part_regroup_host(a2, bunch, n_dev).shape[0] == 5 * bunch
