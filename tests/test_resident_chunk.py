"""VMEM-resident whole-chunk megakernel vs the XLA parity path.

Interpret mode on CPU validates the dropout-free math exactly (the mosaic
interpreter's PRNG is degenerate, so dropout numerics are validated on real
TPU by the benchmark drive: 1-bunch rel err ~6e-6 vs XLA parity, v5 lite).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_sednn.model import ModelConfig, init_params
from tpu_sednn.ops.resident_chunk import make_resident_train_chunk
from tpu_sednn.train import init_train_state, make_jit_train_chunk
from tpu_sednn.train.step import OptConfig


def _compare(cfg, opt, n_samples, seed=7, rtol=2e-5, atol=2e-6):
    params = init_params(jax.random.key(0), cfg, "glorot")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((n_samples, cfg.layersizes[0])), jnp.float32)
    t = jnp.asarray(rng.standard_normal((n_samples, cfg.layersizes[-1])), jnp.float32)

    st_ref = make_jit_train_chunk(cfg, opt)(init_train_state(params), x, t,
                                            jax.random.key(1))
    st_res = make_resident_train_chunk(cfg, opt, interpret=True, bf16=False)(
        init_train_state(params), x, t, jnp.int32(seed))

    assert int(st_res.step) == int(st_ref.step)
    for l in range(len(st_ref.params["w"])):
        np.testing.assert_allclose(np.asarray(st_res.params["w"][l]),
                                   np.asarray(st_ref.params["w"][l]), rtol=rtol, atol=atol)
        np.testing.assert_allclose(np.asarray(st_res.params["b"][l]),
                                   np.asarray(st_ref.params["b"][l]), rtol=rtol, atol=atol)
        np.testing.assert_allclose(np.asarray(st_res.deltas["w"][l]),
                                   np.asarray(st_ref.deltas["w"][l]), rtol=rtol, atol=atol)
        np.testing.assert_allclose(np.asarray(st_res.deltas["b"][l]),
                                   np.asarray(st_ref.deltas["b"][l]), rtol=rtol, atol=atol)
    return st_res


@pytest.mark.parametrize("hidden,output", [("relu", "linear"), ("sigmoid", "sigmoid")])
def test_resident_matches_parity_chunk(hidden, output):
    sizes = (128, 256, 256, 128)
    cfg = ModelConfig(layersizes=sizes, hidden=hidden, output=output)
    opt = OptConfig(lrate=0.5, momentum=0.6, weightcost=1e-4, bunchsize=16)
    _compare(cfg, opt, 48)


@pytest.mark.parametrize("hidden,output", [
    ("relu", "linear"),
    ("sigmoid", "linear"),
    ("relu", "sigmoid"),  # mask head: padded output cols must not leak grads
])
def test_resident_padded_unaligned_sizes(hidden, output):
    """Canonical-like unaligned sizes train identically through zero-padding."""
    sizes = (132, 256, 60)
    cfg = ModelConfig(layersizes=sizes, hidden=hidden, output=output)
    opt = OptConfig(lrate=0.5, momentum=0.5, weightcost=0.0, bunchsize=16)
    st = _compare(cfg, opt, 48)
    for l in range(2):
        assert st.params["w"][l].shape == (sizes[l], sizes[l + 1])


def test_resident_drops_partial_bunch():
    sizes = (128, 128, 128)
    cfg = ModelConfig(layersizes=sizes)
    opt = OptConfig(lrate=0.3, momentum=0.5, weightcost=0.0, bunchsize=16)
    params = init_params(jax.random.key(0), cfg, "glorot")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((40, sizes[0])), jnp.float32)
    t = jnp.asarray(rng.standard_normal((40, sizes[-1])), jnp.float32)
    run = make_resident_train_chunk(cfg, opt, interpret=True, bf16=False)
    st40 = run(init_train_state(params), x, t, jnp.int32(1))
    st32 = run(init_train_state(params), x[:32], t[:32], jnp.int32(1))
    assert int(st40.step) == int(st32.step) == 2  # trailing 8 samples dropped
    np.testing.assert_array_equal(np.asarray(st40.params["w"][0]),
                                  np.asarray(st32.params["w"][0]))


def test_resident_clean_rule_matches_clean_step():
    """rule="clean" reproduces clean_train_step's standard momentum update."""
    from tpu_sednn.train.step import clean_train_step

    sizes = (128, 128, 128)
    cfg = ModelConfig(layersizes=sizes)
    opt = OptConfig(lrate=0.2, momentum=0.7, weightcost=1e-3, bunchsize=16)
    params = init_params(jax.random.key(0), cfg, "glorot")
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((32, sizes[0])), jnp.float32)
    t = jnp.asarray(rng.standard_normal((32, sizes[-1])), jnp.float32)

    st_ref = init_train_state(params)
    for i in range(2):
        st_ref, _ = clean_train_step(st_ref, x[16 * i:16 * (i + 1)],
                                     t[16 * i:16 * (i + 1)], cfg, opt,
                                     compute_dtype=None)
    run = make_resident_train_chunk(cfg, opt, interpret=True, bf16=False,
                                    rule="clean")
    st_res = run(init_train_state(params), x, t, jnp.int32(0))
    for l in range(2):
        np.testing.assert_allclose(np.asarray(st_res.params["w"][l]),
                                   np.asarray(st_ref.params["w"][l]),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(st_res.deltas["b"][l]),
                                   np.asarray(st_ref.deltas["b"][l]),
                                   rtol=2e-5, atol=2e-6)


def test_resident_sr_state_guards():
    cfg = ModelConfig(layersizes=(128, 128, 128))
    opt = OptConfig(bunchsize=16)
    with pytest.raises(ValueError):
        make_resident_train_chunk(cfg, opt, rule="parity", sr_state=True)
    with pytest.raises(ValueError):
        make_resident_train_chunk(cfg, opt, rule="nope")


def test_epoch_driver_resident_engine():
    """train_epochs_arrays(engine="resident") trains identically to the XLA
    engine when dropout is off (interpret mode, fp32)."""
    from tpu_sednn.train.loop import train_epochs_arrays

    sizes = (32, 64, 16)
    cfg = ModelConfig(layersizes=sizes)
    opt = OptConfig(lrate=0.1, momentum=0.5, weightcost=0.0, bunchsize=16)
    params = init_params(jax.random.key(0), cfg, "glorot")
    rng = np.random.default_rng(8)
    x = rng.standard_normal((96, sizes[0])).astype(np.float32)
    t = rng.standard_normal((96, sizes[-1])).astype(np.float32)

    st_x, res_x = train_epochs_arrays(
        init_train_state(params), cfg, lambda e: opt, x, t, x[:32], t[:32],
        n_epochs=2, seed=3, traincache=48, engine="xla")
    st_r, res_r = train_epochs_arrays(
        init_train_state(params), cfg, lambda e: opt, x, t, x[:32], t[:32],
        n_epochs=2, seed=3, traincache=48, engine="resident",
        engine_kwargs={"interpret": True, "bf16": False})
    np.testing.assert_allclose(np.asarray(st_r.params["w"][0]),
                               np.asarray(st_x.params["w"][0]), rtol=2e-5, atol=2e-6)
    assert res_r[-1].cv_mse == pytest.approx(res_x[-1].cv_mse, rel=1e-4)
    # "auto" falls back to XLA on the CPU backend
    from tpu_sednn.train.loop import make_chunk_runner
    assert jax.default_backend() == "cpu"
    run = make_chunk_runner(cfg, opt, "auto")
    st = run(init_train_state(params), jnp.asarray(x[:32]), jnp.asarray(t[:32]),
             jax.random.key(0))
    assert int(st.step) == 2


def test_resident_dynamic_hyperparams_no_retrace():
    """lrate/momentum are dynamic args: the momentum ramp must not recompile,
    and must change the result consistently with the XLA path."""
    sizes = (128, 128, 128)
    cfg = ModelConfig(layersizes=sizes)
    params = init_params(jax.random.key(0), cfg, "glorot")
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((32, sizes[0])), jnp.float32)
    t = jnp.asarray(rng.standard_normal((32, sizes[-1])), jnp.float32)
    opt = OptConfig(lrate=0.5, momentum=0.5, weightcost=0.0, bunchsize=16)
    run = make_resident_train_chunk(cfg, opt, interpret=True, bf16=False)
    ref = make_jit_train_chunk(cfg, opt)
    for mom in (0.5, 0.9):
        a = run(init_train_state(params), x, t, jnp.int32(1), momentum=mom)
        b = ref(init_train_state(params), x, t, jax.random.key(1), momentum=mom)
        np.testing.assert_allclose(np.asarray(a.params["w"][1]),
                                   np.asarray(b.params["w"][1]), rtol=2e-5, atol=2e-6)


def test_dp_resident_matches_single_chip():
    """The DP resident megakernel (replicated VMEM state, bunch_part row
    slices, in-kernel recursive-doubling gradient all-reduce over remote
    DMAs) must reproduce the single-chip resident result (dropout off)."""
    from tpu_sednn.ops.resident_chunk import make_dp_resident_train_chunk
    from tpu_sednn.parallel import make_mesh, replicate

    sizes = (128, 256, 128)
    cfg = ModelConfig(layersizes=sizes)
    opt = OptConfig(lrate=0.5, momentum=0.6, weightcost=1e-4, bunchsize=32)
    params = init_params(jax.random.key(0), cfg, "glorot")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((96, sizes[0])), jnp.float32)
    t = jnp.asarray(rng.standard_normal((96, sizes[-1])), jnp.float32)

    st1 = make_resident_train_chunk(cfg, opt, interpret=True, bf16=False)(
        init_train_state(params), x, t, jnp.int32(7))

    for n_dev in (2, 4):
        mesh = make_mesh(n_data=n_dev, n_model=1)
        st0 = init_train_state(replicate(params, mesh))
        run = make_dp_resident_train_chunk(cfg, opt, mesh, interpret=True,
                                           bf16=False)
        st2 = run(st0, x, t, jnp.int32(7))
        assert int(st2.step) == int(st1.step) == 3
        for l in range(len(sizes) - 1):
            np.testing.assert_allclose(np.asarray(st2.params["w"][l]),
                                       np.asarray(st1.params["w"][l]),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(st2.deltas["b"][l]),
                                       np.asarray(st1.deltas["b"][l]),
                                       rtol=1e-5, atol=1e-6)


def test_dp_resident_validates_mesh():
    from tpu_sednn.ops.resident_chunk import make_dp_resident_train_chunk
    from tpu_sednn.parallel import make_mesh

    cfg = ModelConfig(layersizes=(128, 128))
    mesh = make_mesh(n_data=3, n_model=1)
    with pytest.raises(ValueError, match="power of two"):
        make_dp_resident_train_chunk(cfg, OptConfig(bunchsize=48), mesh)
