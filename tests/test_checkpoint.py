"""Checkpoint round-trip with optimizer state + auto-resume."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_sednn.model import ModelConfig, init_params
from tpu_sednn.train import init_train_state, make_jit_train_chunk
from tpu_sednn.train.step import OptConfig
from tpu_sednn.utils.checkpoint import (
    latest_step,
    restore_checkpoint,
    restore_or_init,
    save_checkpoint,
)

SIZES = (12, 16, 4)


def _trained_state(n_chunks=2):
    cfg = ModelConfig(layersizes=SIZES)
    opt = OptConfig(lrate=0.3, momentum=0.6, weightcost=0.0, bunchsize=8)
    st = init_train_state(init_params(jax.random.key(0), cfg, "glorot"))
    run = make_jit_train_chunk(cfg, opt)
    rng = np.random.default_rng(0)
    for i in range(n_chunks):
        x = jnp.asarray(rng.standard_normal((32, SIZES[0])), jnp.float32)
        t = jnp.asarray(rng.standard_normal((32, SIZES[-1])), jnp.float32)
        st = run(st, x, t, jax.random.key(i))
    return st, cfg, opt


def test_roundtrip_with_momentum(tmp_path):
    st, _, _ = _trained_state()
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 5, st, extra={"epoch": 5, "lrate": 0.15})
    assert latest_step(d) == 5
    st2, extra, step = restore_checkpoint(d)
    assert step == 5 and extra["epoch"] == 5 and extra["lrate"] == 0.15
    assert int(st2.step) == int(st.step)
    for a, b in zip(jax.tree.leaves(st.params), jax.tree.leaves(st2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # momentum deltas survive (the reference loses them every epoch)
    for a, b in zip(jax.tree.leaves(st.deltas), jax.tree.leaves(st2.deltas)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.abs(np.asarray(a)).max() > 0


def test_resume_continues_identically(tmp_path):
    """ckpt at chunk1 + 1 more chunk == 2 chunks straight through."""
    cfg = ModelConfig(layersizes=SIZES)
    opt = OptConfig(lrate=0.3, momentum=0.6, weightcost=0.0, bunchsize=8)
    run = make_jit_train_chunk(cfg, opt)
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((32, SIZES[0])), jnp.float32) for _ in range(2)]
    ts = [jnp.asarray(rng.standard_normal((32, SIZES[-1])), jnp.float32) for _ in range(2)]

    st = init_train_state(init_params(jax.random.key(0), cfg, "glorot"))
    st = run(st, xs[0], ts[0], jax.random.key(0))
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 1, st)

    st_resumed, _, _ = restore_checkpoint(d)
    st_resumed = run(st_resumed, xs[1], ts[1], jax.random.key(1))

    st_straight = init_train_state(init_params(jax.random.key(0), cfg, "glorot"))
    for i in range(2):
        st_straight = run(st_straight, xs[i], ts[i], jax.random.key(i))

    for a, b in zip(jax.tree.leaves(st_straight.params), jax.tree.leaves(st_resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_restore_or_init(tmp_path):
    d = str(tmp_path / "ckpt")
    cfg = ModelConfig(layersizes=SIZES)
    st, extra, step = restore_or_init(d, lambda: init_params(jax.random.key(0), cfg, "glorot"))
    assert step == 0 and int(st.step) == 0
    save_checkpoint(d, 3, st, extra={"epoch": 3})
    st2, extra2, step2 = restore_or_init(d, lambda: init_params(jax.random.key(1), cfg, "glorot"))
    assert step2 == 3 and extra2["epoch"] == 3


def test_kill_and_resume_identical_final_state(tmp_path):
    """Crash recovery: train N epochs straight vs train, "die" mid-run, and
    resume from the periodic checkpoint — final states must match exactly
    (dropout off; the epoch key stream is fold_in(seed, epoch) so a resumed
    run replays the identical shuffles/keys)."""
    import jax
    import numpy as np

    from tpu_sednn.model import ModelConfig, init_params
    from tpu_sednn.train import init_train_state
    from tpu_sednn.train.loop import train_epochs_arrays
    from tpu_sednn.train.step import OptConfig

    sizes = (24, 32, 8)
    cfg = ModelConfig(layersizes=sizes)
    sched = lambda e: OptConfig(lrate=0.3, momentum=0.5, bunchsize=16)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((160, sizes[0])).astype(np.float32)
    t = rng.standard_normal((160, sizes[-1])).astype(np.float32)
    xc, tc = x[:32], t[:32]
    params = init_params(jax.random.key(3), cfg, scheme="glorot")

    # uninterrupted run, no checkpointing
    st_full, res_full = train_epochs_arrays(
        init_train_state(params), cfg, sched, x, t, xc, tc,
        n_epochs=4, seed=11, traincache=64)

    # interrupted run: 2 epochs with checkpointing, then a fresh call
    # (simulating a new process after a crash) resumes and finishes
    ck = str(tmp_path / "ck")
    train_epochs_arrays(init_train_state(params), cfg, sched, x, t, xc, tc,
                        n_epochs=2, seed=11, traincache=64, ckpt_dir=ck)
    st_res, res_res = train_epochs_arrays(
        init_train_state(params), cfg, sched, x, t, xc, tc,
        n_epochs=4, seed=11, traincache=64, ckpt_dir=ck)

    assert len(res_res) == 4
    assert res_res[-1].cv_mse == res_full[-1].cv_mse
    for a, b in zip(jax.tree.leaves(st_full.params), jax.tree.leaves(st_res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(st_full.deltas), jax.tree.leaves(st_res.deltas)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
