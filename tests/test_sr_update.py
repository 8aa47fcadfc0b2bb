"""bf16 + stochastic-rounding trainer (CPU fallback path; TPU kernel is
exercised in the benchmark drives)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_sednn.model import ModelConfig, init_params
from tpu_sednn.ops.sr_update import sr_momentum_update, sr_train_step
from tpu_sednn.train import init_train_state
from tpu_sednn.train.step import OptConfig, TrainState, cv_squared_error


def test_fallback_update_math():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 128)) * 0.1, jnp.bfloat16)
    d = jnp.zeros((64, 128), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((64, 128)) * 0.01, jnp.float32)
    w2, d2 = sr_momentum_update(w, d, g, jnp.int32(0), jnp.float32(0.9),
                                jnp.float32(0.1), jnp.float32(0.0))
    assert w2.dtype == jnp.bfloat16 and d2.dtype == jnp.bfloat16
    expect = np.asarray(w, np.float32) - 0.1 * np.asarray(g)
    np.testing.assert_allclose(np.asarray(w2, dtype=np.float32), expect,
                               rtol=2e-2, atol=2e-3)  # bf16 resolution


def test_bf16_sr_training_learns():
    sizes = (24, 128, 8)
    cfg = ModelConfig(layersizes=sizes, dropout_mode="inverted")
    opt = OptConfig(lrate=0.02, momentum=0.9, weightcost=0.0, bunchsize=64)
    params = init_params(jax.random.key(0), cfg, "glorot")
    st = init_train_state(params)
    st = TrainState(
        params=jax.tree.map(lambda a: a.astype(jnp.bfloat16), st.params),
        deltas=jax.tree.map(lambda a: a.astype(jnp.bfloat16), st.deltas),
        step=st.step,
    )
    rng = np.random.default_rng(1)
    proj = rng.standard_normal((sizes[0], sizes[-1])).astype(np.float32) * 0.4
    x = jnp.asarray(rng.standard_normal((1024, sizes[0])), jnp.float32)
    t = jnp.tanh(x @ jnp.asarray(proj))

    @jax.jit
    def epoch(st, key, seed):
        perm = jax.random.permutation(key, 1024).reshape(-1, 64)
        def body(carry, idx):
            st, s = carry
            st, loss = sr_train_step(st, x[idx], t[idx], cfg, opt,
                                     jax.random.fold_in(key, s), s)
            return (st, s + 100), loss
        (st, _), losses = jax.lax.scan(body, (st, seed), perm)
        return st, losses.mean()

    st, l0 = epoch(st, jax.random.key(2), jnp.int32(0))
    for e in range(12):
        st, l1 = epoch(st, jax.random.key(3 + e), jnp.int32(1000 * e))
    assert float(l1) < 0.5 * float(l0), (float(l0), float(l1))

    # eval via f32 view of the bf16 params
    p32 = jax.tree.map(lambda a: a.astype(jnp.float32), st.params)
    err = float(cv_squared_error(p32, x, t, cfg)) / 1024
    assert err < 1.0
