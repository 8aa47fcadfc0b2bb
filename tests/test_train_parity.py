"""Single/multi-step numerical parity of the JAX train step vs the NumPy
transcription of the reference's fused bunch (SURVEY.md §3.2 quirks a-d)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_sednn.model import ModelConfig, init_params, forward, forward_eval
from tpu_sednn.train import (
    TrainState,
    cv_squared_error,
    init_train_state,
    make_jit_train_chunk,
    reference_train_step,
)
from tpu_sednn.train.step import OptConfig

import ref_numpy


def _rand_net(seed, sizes):
    rng = np.random.default_rng(seed)
    ws = [rng.uniform(-0.05, 0.05, (sizes[i], sizes[i + 1])).astype(np.float32)
          for i in range(len(sizes) - 1)]
    bs = [rng.uniform(-0.01, 0.01, sizes[i + 1]).astype(np.float32)
          for i in range(len(sizes) - 1)]
    return ws, bs


def _to_params(ws, bs):
    return {"w": tuple(jnp.asarray(w) for w in ws), "b": tuple(jnp.asarray(b) for b in bs)}


SIZES = [39, 64, 64, 13]  # small but multi-layer


@pytest.mark.parametrize("hidden", ["relu", "sigmoid"])
def test_single_step_parity(hidden):
    ws, bs = _rand_net(0, SIZES)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((16, SIZES[0])).astype(np.float32)
    t = rng.standard_normal((16, SIZES[-1])).astype(np.float32)

    lr, m, wc = 0.7, 0.5, 1e-4
    dws = [np.zeros_like(w) for w in ws]
    dbs = [np.zeros_like(b) for b in bs]
    ws2, bs2, dws2, dbs2 = ref_numpy.train_bunch(ws, bs, dws, dbs, x, t, lr, m, wc, hidden)

    cfg = ModelConfig(layersizes=tuple(SIZES), hidden=hidden)
    opt = OptConfig(lrate=lr, momentum=m, weightcost=wc, bunchsize=16)
    st = init_train_state(_to_params(ws, bs))
    st = reference_train_step(st, jnp.asarray(x), jnp.asarray(t), cfg, opt)

    for l in range(len(ws)):
        np.testing.assert_allclose(np.asarray(st.params["w"][l]), ws2[l], rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(st.params["b"][l]), bs2[l], rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(st.deltas["w"][l]), dws2[l], rtol=2e-5, atol=2e-6)


def test_multi_step_momentum_parity():
    """Momentum buffers must accumulate identically over several bunches."""
    ws, bs = _rand_net(3, SIZES)
    rng = np.random.default_rng(4)
    lr, m, wc = 0.5, 0.9, 0.0
    dws = [np.zeros_like(w) for w in ws]
    dbs = [np.zeros_like(b) for b in bs]
    cfg = ModelConfig(layersizes=tuple(SIZES))
    opt = OptConfig(lrate=lr, momentum=m, weightcost=wc, bunchsize=8)
    st = init_train_state(_to_params(ws, bs))

    for _ in range(5):
        x = rng.standard_normal((8, SIZES[0])).astype(np.float32)
        t = rng.standard_normal((8, SIZES[-1])).astype(np.float32)
        ws, bs, dws, dbs = ref_numpy.train_bunch(ws, bs, dws, dbs, x, t, lr, m, wc)
        st = reference_train_step(st, jnp.asarray(x), jnp.asarray(t), cfg, opt)

    for l in range(len(ws)):
        np.testing.assert_allclose(np.asarray(st.params["w"][l]), ws[l], rtol=5e-5, atol=5e-6)
        np.testing.assert_allclose(np.asarray(st.deltas["b"][l]), dbs[l], rtol=5e-5, atol=5e-6)


def test_dropout_parity_with_explicit_masks():
    """Parity dropout: same 0/1 masks -> same update as the numpy oracle."""
    ws, bs = _rand_net(5, SIZES)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((12, SIZES[0])).astype(np.float32)
    t = rng.standard_normal((12, SIZES[-1])).astype(np.float32)
    masks = [
        (rng.uniform(size=(12, SIZES[0])) >= 0.1).astype(np.float32),
        (rng.uniform(size=(12, SIZES[1])) >= 0.2).astype(np.float32),
        (rng.uniform(size=(12, SIZES[2])) >= 0.2).astype(np.float32),
    ]
    lr, m = 0.3, 0.5
    dws = [np.zeros_like(w) for w in ws]
    dbs = [np.zeros_like(b) for b in bs]
    ws2, bs2, _, _ = ref_numpy.train_bunch(ws, bs, dws, dbs, x, t, lr, m, 0.0, "relu", masks)

    cfg = ModelConfig(layersizes=tuple(SIZES), dropout_vis=0.1, dropout_hid=0.2)
    opt = OptConfig(lrate=lr, momentum=m, weightcost=0.0, bunchsize=12)
    st = init_train_state(_to_params(ws, bs))
    st = reference_train_step(
        st, jnp.asarray(x), jnp.asarray(t), cfg, opt,
        dropout_masks=[jnp.asarray(mk) for mk in masks],
    )
    for l in range(len(ws)):
        np.testing.assert_allclose(np.asarray(st.params["w"][l]), ws2[l], rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(st.params["b"][l]), bs2[l], rtol=2e-5, atol=2e-6)


def test_cv_weight_scaling_parity():
    ws, bs = _rand_net(7, SIZES)
    rng = np.random.default_rng(8)
    x = rng.standard_normal((20, SIZES[0])).astype(np.float32)
    ref = ref_numpy.cv_forward(ws, bs, x, "relu", dropout=(0.1, 0.2))
    cfg = ModelConfig(layersizes=tuple(SIZES), dropout_vis=0.1, dropout_hid=0.2)
    out = forward_eval(_to_params(ws, bs), jnp.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-6)


def test_chunk_scan_drops_partial_bunch():
    """Chunk trainer must consume exactly floor(n/bunch) bunches (quirk c)."""
    ws, bs = _rand_net(9, SIZES)
    rng = np.random.default_rng(10)
    n, bunch = 50, 16  # 3 full bunches, 2 dropped samples
    x = rng.standard_normal((n, SIZES[0])).astype(np.float32)
    t = rng.standard_normal((n, SIZES[-1])).astype(np.float32)

    lr, m = 0.4, 0.5
    dws = [np.zeros_like(w) for w in ws]
    dbs = [np.zeros_like(b) for b in bs]
    for i in range(3):
        ws, bs, dws, dbs = ref_numpy.train_bunch(
            ws, bs, dws, dbs, x[i * 16 : (i + 1) * 16], t[i * 16 : (i + 1) * 16], lr, m, 0.0
        )

    cfg = ModelConfig(layersizes=tuple(SIZES))
    opt = OptConfig(lrate=lr, momentum=m, weightcost=0.0, bunchsize=bunch)
    run = make_jit_train_chunk(cfg, opt)
    st = init_train_state(_to_params(*_rand_net(9, SIZES)))
    st = run(st, jnp.asarray(x), jnp.asarray(t), jax.random.key(0))
    assert int(st.step) == 3
    for l in range(len(ws)):
        np.testing.assert_allclose(np.asarray(st.params["w"][l]), ws[l], rtol=5e-5, atol=5e-6)


def test_training_reduces_cv_error():
    """End-to-end sanity: a few hundred steps on a learnable mapping."""
    sizes = (20, 64, 10)
    cfg = ModelConfig(layersizes=sizes)
    # note the reference update divides the summed gradient by n twice, so
    # lrate must be large (the recipe uses lrate=1 at bunch 128)
    opt = OptConfig(lrate=1.0, momentum=0.9, weightcost=0.0, bunchsize=32)
    key = jax.random.key(0)
    params = init_params(key, cfg, scheme="glorot")
    st = init_train_state(params)

    proj = jax.random.normal(jax.random.key(1), (20, 10)) * 0.5
    x = jax.random.normal(jax.random.key(2), (2048, 20))
    t = jnp.tanh(x @ proj)

    err0 = float(cv_squared_error(st.params, x, t, cfg)) / x.shape[0]
    run = make_jit_train_chunk(cfg, opt)
    for e in range(6):
        st = run(st, x, t, jax.random.key(3 + e))
    err1 = float(cv_squared_error(st.params, x, t, cfg)) / x.shape[0]
    assert err1 < 0.25 * err0, (err0, err1)


def test_softmax_head_trains():
    """Softmax output head + cross-entropy (the working analog of the
    reference's dead kernSoftmax/kernBinary, DevFunc.cu:100/:4): loss
    decreases on a separable toy problem and probabilities normalize."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_sednn.model import ModelConfig, forward_eval, init_params
    from tpu_sednn.train import init_train_state
    from tpu_sednn.train.step import OptConfig, softmax_xent_train_step

    sizes = (16, 32, 4)
    cfg = ModelConfig(layersizes=sizes, output="softmax")
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((4, sizes[0])).astype(np.float32) * 2
    labels = rng.integers(0, 4, 256).astype(np.int32)
    x = jnp.asarray(centers[labels] + rng.standard_normal((256, sizes[0])) * 0.3,
                    jnp.float32)
    y = jnp.asarray(labels)

    state = init_train_state(init_params(jax.random.key(0), cfg, "glorot"))
    opt = OptConfig(lrate=0.5, momentum=0.5, weightcost=0.0, bunchsize=256)
    losses = []
    for i in range(30):
        state, loss = softmax_xent_train_step(state, x, y, cfg, opt,
                                              compute_dtype=None)
        losses.append(float(loss))
    assert losses[-1] < 0.3 * losses[0], losses[::10]
    probs = forward_eval(state.params, x, cfg)
    np.testing.assert_allclose(np.asarray(probs.sum(axis=-1)), 1.0, rtol=1e-5)
    acc = float((jnp.argmax(probs, -1) == y).mean())
    assert acc > 0.9, acc
