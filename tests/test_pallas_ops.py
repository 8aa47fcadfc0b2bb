"""Pallas kernels vs the XLA reference implementations (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_sednn.model import ModelConfig, init_params
from tpu_sednn.ops.fused_mlp import fused_bwd_update, fused_linear_act
from tpu_sednn.ops.train_step import make_pallas_train_chunk, pallas_train_step
from tpu_sednn.train import init_train_state, make_jit_train_chunk
from tpu_sednn.train.step import OptConfig, reference_train_step


def test_fused_linear_act_matches_xla():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 384)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(384) * 0.1, jnp.float32)
    for act, ref in [
        ("linear", lambda z: z),
        ("relu", lambda z: jnp.maximum(z, 0)),
        ("sigmoid", jax.nn.sigmoid),
    ]:
        got = fused_linear_act(x, w, b, act=act, block_n=128, interpret=True, bf16=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref(x @ w + b)),
                                   rtol=1e-5, atol=1e-5)


def test_fused_linear_act_unaligned_fallback():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((16, 100)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((100, 37)) * 0.1, jnp.float32)
    b = jnp.zeros(37, jnp.float32)
    got = fused_linear_act(x, w, b, act="relu", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(jnp.maximum(x @ w + b, 0)),
                               rtol=1e-5, atol=1e-5)


def test_fused_bwd_update_matches_reference_math():
    rng = np.random.default_rng(2)
    B, K, N = 16, 256, 384
    dedx = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    yprev = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.float32)
    delta = jnp.asarray(rng.standard_normal((K, N)) * 0.01, jnp.float32)
    b = jnp.asarray(rng.standard_normal(N) * 0.1, jnp.float32)
    db = jnp.asarray(rng.standard_normal(N) * 0.01, jnp.float32)
    m, lr, inv_n, wc = 0.7, 0.4, 1.0 / B, 1e-3

    w_, d_, dedy, b_, db_ = fused_bwd_update(
        dedx, yprev, w, delta, b, db,
        jnp.float32(m), jnp.float32(lr), jnp.float32(inv_n), jnp.float32(wc),
        block_k=128, block_n=128, interpret=True, bf16=False,
    )
    g = np.asarray(yprev).T @ np.asarray(dedx)
    exp_delta = m * np.asarray(delta) - (1 - m) * lr * (g * inv_n + wc * np.asarray(w))
    np.testing.assert_allclose(np.asarray(d_), exp_delta, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_), np.asarray(w) + exp_delta, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dedy), np.asarray(dedx) @ np.asarray(w).T,
                               rtol=1e-4, atol=1e-5)
    g_b = np.asarray(dedx).sum(0)
    exp_db = m * np.asarray(db) - (1 - m) * lr * (g_b * inv_n)
    np.testing.assert_allclose(np.asarray(db_), exp_db, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b_), np.asarray(b) + exp_db, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("hidden,output", [("relu", "linear"), ("sigmoid", "sigmoid")])
def test_pallas_step_matches_reference_step(hidden, output):
    sizes = (128, 256, 256, 128)
    cfg = ModelConfig(layersizes=sizes, hidden=hidden, output=output)
    opt = OptConfig(lrate=0.5, momentum=0.6, weightcost=1e-4, bunchsize=16)
    params = init_params(jax.random.key(0), cfg, "glorot")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((16, sizes[0])), jnp.float32)
    t = jnp.asarray(rng.standard_normal((16, sizes[-1])), jnp.float32)

    st_ref = reference_train_step(init_train_state(params), x, t, cfg, opt)
    st_pal = pallas_train_step(init_train_state(params), x, t, cfg, opt, interpret=True, bf16=False)
    for l in range(len(sizes) - 1):
        np.testing.assert_allclose(np.asarray(st_pal.params["w"][l]),
                                   np.asarray(st_ref.params["w"][l]), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(st_pal.deltas["b"][l]),
                                   np.asarray(st_ref.deltas["b"][l]), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("hidden,output", [
    ("relu", "linear"),
    ("sigmoid", "linear"),
    ("relu", "sigmoid"),  # mask head: padded output cols must not leak grads
])
def test_pallas_chunk_padded_canonical_sizes(hidden, output):
    """Unaligned canonical-like sizes (e.g. 132 in / 60 out) train identically
    through the zero-padded Pallas chunk path."""
    sizes = (132, 256, 60)  # not 128-aligned on either end
    cfg = ModelConfig(layersizes=sizes, hidden=hidden, output=output)
    opt = OptConfig(lrate=0.5, momentum=0.5, weightcost=0.0, bunchsize=16)
    params = init_params(jax.random.key(0), cfg, "glorot")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((48, sizes[0])), jnp.float32)
    t = jnp.asarray(rng.standard_normal((48, sizes[-1])), jnp.float32)

    run_ref = make_jit_train_chunk(cfg, opt)
    st_ref = run_ref(init_train_state(params), x, t, jax.random.key(1))

    run_pal = make_pallas_train_chunk(cfg, opt, interpret=True, bf16=False)
    st_pal = run_pal(init_train_state(params), x, t, jax.random.key(1))

    assert int(st_pal.step) == int(st_ref.step) == 3
    for l in range(len(sizes) - 1):
        assert st_pal.params["w"][l].shape == st_ref.params["w"][l].shape
        np.testing.assert_allclose(np.asarray(st_pal.params["w"][l]),
                                   np.asarray(st_ref.params["w"][l]), rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(st_pal.params["b"][l]),
                                   np.asarray(st_ref.params["b"][l]), rtol=2e-5, atol=2e-6)
