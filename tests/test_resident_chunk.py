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
    # sr_state is allowed with the parity RULE since round 4 (same update
    # formula, bf16 storage — the auto-engine degrade for over-VMEM models);
    # bit-exact parity fixtures simply keep sr_state=False
    assert make_resident_train_chunk(cfg, opt, rule="parity", sr_state=True)
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
    # hyperparameters are REQUIRED (the runner memo ignores opt's dynamic
    # fields, so signature defaults would silently come from the first
    # creator — ADVICE r2: default-reliant calls must fail loudly)
    with pytest.raises(TypeError):
        run(init_train_state(params), jnp.asarray(x[:32]), jnp.asarray(t[:32]),
            jax.random.key(0))
    st = run(init_train_state(params), jnp.asarray(x[:32]), jnp.asarray(t[:32]),
             jax.random.key(0), opt.lrate, opt.momentum, opt.weightcost)
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


def test_dp_resident_8way_butterfly_matches_single_chip():
    """All THREE butterfly steps (incl. the cross-quad exchange k=2, the
    analog of BP_GPU.cu:863-874's farthest hop) actually execute: 8 simulated
    devices, each parking a blocking interpret thread in the CPU client pool
    (sized via NPROC in conftest — a default pool deadlocks this test)."""
    from tpu_sednn.ops.resident_chunk import make_dp_resident_train_chunk
    from tpu_sednn.parallel import make_mesh, replicate

    sizes = (128, 128)
    cfg = ModelConfig(layersizes=sizes)
    opt = OptConfig(lrate=0.5, momentum=0.6, weightcost=1e-4, bunchsize=64)
    params = init_params(jax.random.key(0), cfg, "glorot")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((128, sizes[0])), jnp.float32)
    t = jnp.asarray(rng.standard_normal((128, sizes[-1])), jnp.float32)

    st1 = make_resident_train_chunk(cfg, opt, interpret=True, bf16=False)(
        init_train_state(params), x, t, jnp.int32(7))
    mesh = make_mesh(n_data=8, n_model=1)
    st0 = init_train_state(replicate(params, mesh))
    run = make_dp_resident_train_chunk(cfg, opt, mesh, interpret=True,
                                       bf16=False)
    st2 = run(st0, x, t, jnp.int32(7))
    assert int(st2.step) == int(st1.step) == 2
    np.testing.assert_allclose(np.asarray(st2.params["w"][0]),
                               np.asarray(st1.params["w"][0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st2.deltas["b"][0]),
                               np.asarray(st1.deltas["b"][0]),
                               rtol=1e-5, atol=1e-6)


def test_dp_resident_dropout_device_count_invariant():
    """Dropout-on DP resident: every device draws the GLOBAL bunch's mask
    from the shared (seed, bunch, layer) stream and slices its own rows, so
    results are identical across device counts.  (The interpret PRNG is
    degenerate — real-bit slice identity is validated on TPU by bench.py's
    dp_dropout check — but this exercises the full dropout-on DP lowering
    incl. the in-kernel row slice.)"""
    from tpu_sednn.ops.resident_chunk import make_dp_resident_train_chunk
    from tpu_sednn.parallel import make_mesh, replicate

    sizes = (128, 128, 128)
    cfg = ModelConfig(layersizes=sizes, dropout_vis=0.1, dropout_hid=0.2,
                      dropout_mode="parity")
    opt = OptConfig(lrate=0.5, momentum=0.5, weightcost=0.0, bunchsize=32)
    params = init_params(jax.random.key(0), cfg, "glorot")
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((64, sizes[0])), jnp.float32)
    t = jnp.asarray(rng.standard_normal((64, sizes[-1])), jnp.float32)

    states = {}
    for n_dev in (2, 4):
        mesh = make_mesh(n_data=n_dev, n_model=1)
        run = make_dp_resident_train_chunk(cfg, opt, mesh, interpret=True,
                                           bf16=False)
        st = run(init_train_state(replicate(params, mesh)), x, t, jnp.int32(5))
        states[n_dev] = st
        assert int(st.step) == 2
    for l in range(len(sizes) - 1):
        np.testing.assert_allclose(np.asarray(states[2].params["w"][l]),
                                   np.asarray(states[4].params["w"][l]),
                                   rtol=1e-6, atol=1e-7)


def test_dp_resident_n_real_padding():
    """The DP runner honors a dynamic n_real on capacity-padded chunks (the
    device-splice contract): padded garbage bunches must not touch state."""
    from tpu_sednn.ops.resident_chunk import make_dp_resident_train_chunk
    from tpu_sednn.parallel import make_mesh, replicate

    sizes = (128, 128)
    cfg = ModelConfig(layersizes=sizes)
    opt = OptConfig(lrate=0.4, momentum=0.5, weightcost=0.0, bunchsize=32)
    params = init_params(jax.random.key(0), cfg, "glorot")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((96, sizes[0])), jnp.float32)
    t = jnp.asarray(rng.standard_normal((96, sizes[-1])), jnp.float32)
    mesh = make_mesh(n_data=2, n_model=1)
    run = make_dp_resident_train_chunk(cfg, opt, mesh, interpret=True,
                                       bf16=False)
    # pad with NaN garbage beyond 2 real bunches; n_real must fence it off
    x_pad = jnp.concatenate([x[:64], jnp.full((32, sizes[0]), jnp.nan)])
    t_pad = jnp.concatenate([t[:64], jnp.full((32, sizes[-1]), jnp.nan)])
    st_pad = run(init_train_state(replicate(params, mesh)), x_pad, t_pad,
                 jnp.int32(9), n_real=2)
    st_ref = run(init_train_state(replicate(params, mesh)), x[:64], t[:64],
                 jnp.int32(9))
    assert int(st_pad.step) == int(st_ref.step) == 2
    np.testing.assert_array_equal(np.asarray(st_pad.params["w"][0]),
                                  np.asarray(st_ref.params["w"][0]))


def test_pfile_epoch_dp_resident_production_path():
    """VERDICT r2 item 1(a): the production pfile driver routes
    n_data_shards>1 + engine=resident through the DP resident megakernel and
    matches the single-shard XLA engine exactly (dropout off, fp32)."""
    import os as _os

    from tpu_sednn.data.rand48 import Rand48
    from tpu_sednn.io import compute_norm, save_norm, write_pfile
    from tpu_sednn.train.loop import train_epoch_pfile

    import tempfile

    D, CONTEXT, TO = 5, 3, 1
    sizes = (D * CONTEXT + D, 128, D)
    rng = np.random.default_rng(0)
    utts = [rng.standard_normal((int(rng.integers(30, 60)), D)).astype(np.float32)
            for _ in range(8)]
    targs = [np.tanh(u @ rng.standard_normal((D, D)).astype(np.float32) * 0.4)
             for u in utts]
    with tempfile.TemporaryDirectory() as tmp:
        fp, tp, npth = (_os.path.join(tmp, n)
                        for n in ("f.pfile", "t.pfile", "a.norm"))
        write_pfile(fp, utts)
        write_pfile(tp, targs)
        mean, istd = compute_norm(np.concatenate(utts))
        save_norm(npth, mean, istd)

        cfg = ModelConfig(layersizes=sizes)
        opt = OptConfig(lrate=0.3, momentum=0.5, weightcost=0.0, bunchsize=32)
        params = init_params(jax.random.key(0), cfg, "glorot")
        kw = dict(
            fea_file=fp, targ_file=tp, norm_file=npth, fea_dim=D,
            fea_context=CONTEXT, targ_offset=TO, train_sent_range=(0, 5),
            cv_sent_range=(6, 7), traincache=128, seed=3,
        )
        st_ref, res_ref = train_epoch_pfile(
            init_train_state(params), cfg, opt, rand=Rand48(3),
            engine="xla", **kw)
        st_dp, res_dp = train_epoch_pfile(
            init_train_state(params), cfg, opt, rand=Rand48(3),
            n_data_shards=2, engine="resident",
            engine_kwargs={"interpret": True, "bf16": False}, **kw)
        assert res_dp.cv_mse == pytest.approx(res_ref.cv_mse, rel=1e-5)
        np.testing.assert_allclose(np.asarray(st_dp.params["w"][0]),
                                   np.asarray(st_ref.params["w"][0]),
                                   rtol=2e-5, atol=2e-6)


def test_sample_resident_masks_dp_slices():
    """sample_resident_masks returns device d's rows of the GLOBAL mask —
    shape contract for the bench-side TPU validation (real-bit identity is
    asserted there; interpret bits are degenerate)."""
    from tpu_sednn.ops.resident_chunk import sample_resident_masks

    full = np.asarray(sample_resident_masks(99, 2, 1, (32, 256), 0.2,
                                            interpret=True))
    assert full.shape == (32, 256)
    for d in range(2):
        part = np.asarray(sample_resident_masks(99, 2, 1, (32, 256), 0.2,
                                                device_idx=d, n_dev=2,
                                                interpret=True))
        assert part.shape == (16, 256)
        np.testing.assert_array_equal(part, full[d * 16:(d + 1) * 16])


def test_resident_dedy_full_variant_matches():
    """dedy_full=True (one full-width backprop dot instead of per-row-block
    parts + concat) is mathematically identical."""
    sizes = (128, 256, 256, 128)
    cfg = ModelConfig(layersizes=sizes)
    opt = OptConfig(lrate=0.5, momentum=0.6, weightcost=1e-4, bunchsize=16)
    params = init_params(jax.random.key(0), cfg, "glorot")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((48, sizes[0])), jnp.float32)
    t = jnp.asarray(rng.standard_normal((48, sizes[-1])), jnp.float32)
    st_a = make_resident_train_chunk(cfg, opt, interpret=True, bf16=False)(
        init_train_state(params), x, t, jnp.int32(7))
    st_b = make_resident_train_chunk(cfg, opt, interpret=True, bf16=False,
                                     dedy_full=True)(
        init_train_state(params), x, t, jnp.int32(7))
    for l in range(len(sizes) - 1):
        np.testing.assert_allclose(np.asarray(st_b.params["w"][l]),
                                   np.asarray(st_a.params["w"][l]),
                                   rtol=1e-6, atol=1e-7)


def test_resident_row_tiled_big_bunch_matches_clean_step():
    """tile_rows < bunchsize: the kernel streams each update batch in row
    tiles, accumulating the gradient into the momentum buffer and applying
    the weight step on the last tile — must equal clean_train_step at the
    full bunch size (one update per big bunch)."""
    from tpu_sednn.train.step import clean_train_step

    sizes = (128, 128, 128)
    cfg = ModelConfig(layersizes=sizes)
    opt = OptConfig(lrate=0.2, momentum=0.7, weightcost=1e-3, bunchsize=64)
    params = init_params(jax.random.key(0), cfg, "glorot")
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((128, sizes[0])), jnp.float32)
    t = jnp.asarray(rng.standard_normal((128, sizes[-1])), jnp.float32)

    st_ref = init_train_state(params)
    for i in range(2):
        st_ref, _ = clean_train_step(st_ref, x[64 * i:64 * (i + 1)],
                                     t[64 * i:64 * (i + 1)], cfg, opt,
                                     compute_dtype=None)
    for tile in (16, 32):
        run = make_resident_train_chunk(cfg, opt, interpret=True, bf16=False,
                                        rule="clean", tile_rows=tile)
        st_res = run(init_train_state(params), x, t, jnp.int32(0))
        assert int(st_res.step) == 2  # 2 updates of 64 rows each
        for l in range(2):
            np.testing.assert_allclose(np.asarray(st_res.params["w"][l]),
                                       np.asarray(st_ref.params["w"][l]),
                                       rtol=2e-5, atol=2e-6)
            np.testing.assert_allclose(np.asarray(st_res.deltas["b"][l]),
                                       np.asarray(st_ref.deltas["b"][l]),
                                       rtol=2e-5, atol=2e-6)


def test_resident_tile_rows_guards():
    cfg = ModelConfig(layersizes=(128, 128))
    with pytest.raises(ValueError, match="clean-rule"):
        make_resident_train_chunk(cfg, OptConfig(bunchsize=64),
                                  rule="parity", tile_rows=16)
    with pytest.raises(ValueError, match="divide"):
        make_resident_train_chunk(cfg, OptConfig(bunchsize=64),
                                  rule="clean", tile_rows=24)


@pytest.mark.parametrize("n_dev,tile_rows", [(2, 32), (4, 32), (2, 16)])
def test_dp_resident_row_tiled_matches_single_chip(n_dev, tile_rows):
    """DP x row-tiled accumulation (big update batches amortizing the
    in-kernel butterfly; accum_tiles = bunch/tile_rows > 1): tile-granular
    bunch_part split, gradients all-reduced per tile, accumulated into the
    momentum buffer, one update per global batch — must match the
    single-chip row-tiled kernel for every device count."""
    from tpu_sednn.ops.resident_chunk import make_dp_resident_train_chunk
    from tpu_sednn.parallel import make_mesh, replicate

    sizes = (128, 128, 128)
    cfg = ModelConfig(layersizes=sizes)
    opt = OptConfig(lrate=0.2, momentum=0.7, weightcost=1e-3, bunchsize=64)
    params = init_params(jax.random.key(0), cfg, "glorot")
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((128, sizes[0])), jnp.float32)
    t = jnp.asarray(rng.standard_normal((128, sizes[-1])), jnp.float32)

    st1 = make_resident_train_chunk(cfg, opt, interpret=True, bf16=False,
                                    rule="clean", tile_rows=tile_rows)(
        init_train_state(params), x, t, jnp.int32(0))
    mesh = make_mesh(n_data=n_dev, n_model=1)
    run = make_dp_resident_train_chunk(cfg, opt, mesh, interpret=True,
                                       bf16=False, rule="clean",
                                       tile_rows=tile_rows)
    st2 = run(init_train_state(replicate(params, mesh)), x, t, jnp.int32(0))
    assert int(st2.step) == int(st1.step) == 2
    for l in range(2):
        np.testing.assert_allclose(np.asarray(st2.params["w"][l]),
                                   np.asarray(st1.params["w"][l]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(st2.deltas["b"][l]),
                                   np.asarray(st1.deltas["b"][l]),
                                   rtol=1e-5, atol=1e-6)


def test_resident_vmem_estimator_and_auto_fallback():
    """The 16 kHz full-band net must NOT select the f32 resident engine (its
    pinned state + windows exceed the 128 MiB mosaic VMEM budget — a real
    on-chip compile failure, 129.02/128.00 MiB); the canonical 8 kHz net,
    the bf16 sr_state variant, and the bf16-momentum sr_delta variant must
    fit."""
    from tpu_sednn.ops.resident_chunk import (
        VMEM_BUDGET_BYTES, resident_fits_vmem, resident_vmem_bytes,
    )

    opt = OptConfig(lrate=1.0, momentum=0.5, weightcost=0.0, bunchsize=128)
    cfg_8k = ModelConfig(layersizes=(1548, 2048, 2048, 2048, 129))
    cfg_16k = ModelConfig(layersizes=(3084, 2048, 2048, 2048, 257))
    assert resident_fits_vmem(cfg_8k, opt)
    assert not resident_fits_vmem(cfg_16k, opt)
    assert resident_fits_vmem(cfg_16k, opt, sr_state=True)
    assert resident_fits_vmem(cfg_16k, opt, sr_delta=True)
    # sr_delta sits between sr_state (all-bf16) and f32
    assert (resident_vmem_bytes(cfg_16k, opt, sr_state=True)
            < resident_vmem_bytes(cfg_16k, opt, sr_delta=True)
            < resident_vmem_bytes(cfg_16k, opt))
    # the estimator tracks the compiler's report for the failing case
    assert resident_vmem_bytes(cfg_16k, opt) > 120 * 2**20
    assert VMEM_BUDGET_BYTES == 128 * 2**20


def test_auto_engine_degrade_order_for_16k(monkeypatch):
    """engine="auto" on a TPU backend: f32-fitting models get the plain
    resident kernel; the over-budget 16 kHz net degrades first to sr_delta
    (bf16 momentum — fastest on chip, 0.122 ms/bunch), then to the f32
    HYBRID (hbm_spill=1 — exact f32 numerics, 0.138 ms), then XLA (0.198).
    TPU_SEDNN_NO_SR_FALLBACK / TPU_SEDNN_NO_SPILL_FALLBACK skip rungs."""
    import tpu_sednn.train.loop as loop_mod
    from tpu_sednn.train.loop import _auto_engine

    monkeypatch.setattr(loop_mod.jax, "default_backend", lambda: "tpu")
    opt = OptConfig(lrate=1.0, momentum=0.5, weightcost=0.0, bunchsize=128)
    cfg_8k = ModelConfig(layersizes=(1548, 2048, 2048, 2048, 129))
    cfg_16k = ModelConfig(layersizes=(3084, 2048, 2048, 2048, 257))
    assert _auto_engine(cfg_8k, opt) == ("resident", {})
    assert _auto_engine(cfg_16k, opt) == ("resident", {"sr_delta": True})
    # caller pinned a state mode already -> no silent switch
    assert _auto_engine(cfg_16k, opt, {"sr_state": True}) == ("resident", {})
    assert _auto_engine(cfg_16k, opt, {"sr_delta": True}) == ("resident", {})
    assert _auto_engine(cfg_16k, opt, {"hbm_spill": 1}) == ("resident", {})
    # skip the sr rung -> the f32 hybrid
    monkeypatch.setenv("TPU_SEDNN_NO_SR_FALLBACK", "1")
    assert _auto_engine(cfg_16k, opt) == ("resident", {"hbm_spill": 1})
    # skip both rungs -> XLA
    monkeypatch.setenv("TPU_SEDNN_NO_SPILL_FALLBACK", "1")
    assert _auto_engine(cfg_16k, opt) == ("xla", {})
    monkeypatch.delenv("TPU_SEDNN_NO_SR_FALLBACK")
    monkeypatch.delenv("TPU_SEDNN_NO_SPILL_FALLBACK")
    # tile_rows == bunchsize is accum=1, valid with either rung;
    # tile_rows < bunchsize means row-tiled ACCUMULATION, which neither
    # degrade rung supports — auto must fall to XLA, never propose a
    # combination the factory raises on (code-review r5 finding)
    assert _auto_engine(cfg_16k, opt, {"tile_rows": 128}) == (
        "resident", {"sr_delta": True})
    assert _auto_engine(cfg_16k, opt, {"tile_rows": 64}) == ("xla", {})
    # something absurdly large still falls back to XLA
    cfg_huge = ModelConfig(layersizes=(8192, 8192, 8192, 8192))
    assert _auto_engine(cfg_huge, opt) == ("xla", {})
    # on the real (CPU) backend auto stays XLA
    monkeypatch.undo()
    assert _auto_engine(cfg_8k, opt) == ("xla", {})


def test_resident_sr_delta_guards():
    cfg = ModelConfig(layersizes=(128, 128, 128))
    with pytest.raises(ValueError, match="mutually exclusive"):
        make_resident_train_chunk(cfg, OptConfig(bunchsize=16), rule="clean",
                                  sr_state=True, sr_delta=True)
    with pytest.raises(ValueError, match="momentum buffer"):
        make_resident_train_chunk(cfg, OptConfig(bunchsize=64), rule="clean",
                                  tile_rows=16, sr_delta=True)


@pytest.mark.parametrize("rule", ["parity", "clean"])
def test_resident_sr_state_interpret_close_to_f32(rule):
    """sr_state (bf16 weights+momentum, the auto-engine degrade for
    over-VMEM models) tracks the f32 kernel within bf16 rounding noise;
    run() auto-casts an f32 TrainState on entry and returns bf16 state."""
    sizes = (128, 128, 128)
    cfg = ModelConfig(layersizes=sizes)
    opt = OptConfig(lrate=0.3, momentum=0.6, weightcost=1e-4, bunchsize=16)
    params = init_params(jax.random.key(0), cfg, "glorot")
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((48, sizes[0])), jnp.float32)
    t = jnp.asarray(rng.standard_normal((48, sizes[-1])), jnp.float32)

    st_f32 = make_resident_train_chunk(cfg, opt, interpret=True, bf16=False,
                                       rule=rule)(
        init_train_state(params), x, t, jnp.int32(3))
    run = make_resident_train_chunk(cfg, opt, interpret=True, bf16=False,
                                    rule=rule, sr_state=True)
    st_sr = run(init_train_state(params), x, t, jnp.int32(3))
    assert int(st_sr.step) == int(st_f32.step) == 3
    for l in range(2):
        assert st_sr.params["w"][l].dtype == jnp.bfloat16
        assert st_sr.deltas["w"][l].dtype == jnp.bfloat16
        assert st_sr.params["b"][l].dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(st_sr.params["w"][l], np.float32),
            np.asarray(st_f32.params["w"][l]), rtol=3e-2, atol=3e-3)
    st_sr2 = run(st_sr, x, t, jnp.int32(4))  # bf16 state round-trips
    assert int(st_sr2.step) == 6


@pytest.mark.parametrize("rule", ["parity", "clean"])
def test_resident_sr_delta_interpret_close_to_f32(rule):
    """sr_delta (bf16 momentum storage, f32 weights + unrounded weight step)
    tracks the f32 kernel within bf16 rounding noise; returned momentum is
    bf16.  Interpret mode: the mosaic interpreter's PRNG is degenerate, so
    this validates the data path / dtype plumbing; unbiasedness of the SR
    bits is a hardware property benched on the real chip."""
    sizes = (128, 128, 128)
    cfg = ModelConfig(layersizes=sizes)
    opt = OptConfig(lrate=0.3, momentum=0.6, weightcost=1e-4, bunchsize=16)
    params = init_params(jax.random.key(0), cfg, "glorot")
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((48, sizes[0])), jnp.float32)
    t = jnp.asarray(rng.standard_normal((48, sizes[-1])), jnp.float32)

    st_f32 = make_resident_train_chunk(cfg, opt, interpret=True, bf16=False,
                                       rule=rule)(
        init_train_state(params), x, t, jnp.int32(3))
    run = make_resident_train_chunk(cfg, opt, interpret=True, bf16=False,
                                    rule=rule, sr_delta=True)
    st_sr = run(init_train_state(params), x, t, jnp.int32(3))
    assert int(st_sr.step) == int(st_f32.step) == 3
    for l in range(2):
        assert st_sr.deltas["w"][l].dtype == jnp.bfloat16
        assert st_sr.params["w"][l].dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(st_sr.params["w"][l]),
                                   np.asarray(st_f32.params["w"][l]),
                                   rtol=2e-2, atol=2e-4)
        # biases stay exactly f32 state (no SR on the bias path)
        assert st_sr.deltas["b"][l].dtype == jnp.float32
    # a second call consumes the bf16 deltas without re-cast issues
    st_sr2 = run(st_sr, x, t, jnp.int32(4))
    assert int(st_sr2.step) == 6


def test_dp_resident_sr_delta_matches_single_chip():
    """DP x sr_delta (bf16 momentum + SR): every device rounds with the SAME
    per-(bunch,layer) PRNG stream, so replicas stay identical; vs the
    single-chip kernel the DP gradient is summed in a different order
    (per-device partial dots + butterfly), and the bf16 rounding amplifies
    those ulp-level differences to bf16 ulps — so the comparison carries
    bf16 tolerance, unlike the exact f32 DP tests."""
    from tpu_sednn.ops.resident_chunk import make_dp_resident_train_chunk
    from tpu_sednn.parallel import make_mesh, replicate

    sizes = (128, 128, 128)
    cfg = ModelConfig(layersizes=sizes)
    opt = OptConfig(lrate=0.2, momentum=0.7, weightcost=1e-3, bunchsize=32)
    params = init_params(jax.random.key(0), cfg, "glorot")
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal((64, sizes[0])), jnp.float32)
    t = jnp.asarray(rng.standard_normal((64, sizes[-1])), jnp.float32)

    st1 = make_resident_train_chunk(cfg, opt, interpret=True, bf16=False,
                                    sr_delta=True)(
        init_train_state(params), x, t, jnp.int32(5))
    mesh = make_mesh(n_data=2, n_model=1)
    run = make_dp_resident_train_chunk(cfg, opt, mesh, interpret=True,
                                       bf16=False, sr_delta=True)
    st2 = run(init_train_state(replicate(params, mesh)), x, t, jnp.int32(5))
    assert int(st2.step) == int(st1.step) == 2
    for l in range(2):
        assert st2.deltas["w"][l].dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(st2.params["w"][l]),
                                   np.asarray(st1.params["w"][l]),
                                   rtol=2e-2, atol=2e-4)


# ---------------- f32 hybrid residency (hbm_spill, VERDICT r4 item 3) ----------------


def _train_pair(cfg, opt, n, seed=3, **kw):
    params = init_params(jax.random.key(0), cfg, "glorot")
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((n, cfg.layersizes[0])), jnp.float32)
    t = jnp.asarray(rng.standard_normal((n, cfg.layersizes[-1])), jnp.float32)
    st_full = make_resident_train_chunk(cfg, opt, interpret=True, bf16=False)(
        init_train_state(params), x, t, jnp.int32(seed))
    st_sp = make_resident_train_chunk(cfg, opt, interpret=True, bf16=False,
                                      **kw)(
        init_train_state(params), x, t, jnp.int32(seed))
    return st_full, st_sp, (params, x, t)


def _assert_state_close(st_a, st_b, rtol=1e-5, atol=1e-7):
    assert int(st_a.step) == int(st_b.step)
    for a, b in zip(jax.tree.leaves(st_a.params) + jax.tree.leaves(st_a.deltas),
                    jax.tree.leaves(st_b.params) + jax.tree.leaves(st_b.deltas)):
        assert a.dtype == b.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol)


def test_hybrid_spill_matches_full_resident():
    """hbm_spill=1 (output layer W+Delta in HBM, block-staged) must reproduce
    the full-resident f32 kernel: the update rule is identical; only the
    spilled layer's forward accumulation order can differ by fp rounding."""
    cfg = ModelConfig(layersizes=(128, 128, 72))
    opt = OptConfig(lrate=0.2, momentum=0.7, weightcost=1e-3, bunchsize=32)
    st_full, st_sp, _ = _train_pair(cfg, opt, 96, hbm_spill=1)
    _assert_state_close(st_full, st_sp)


def test_hybrid_spill_multiblock_layer():
    """A spilled layer wider than one row block (640 rows -> 512+128 blocks)
    exercises the blockwise forward accumulation and per-block staged
    updates."""
    from tpu_sednn.ops.resident_chunk import spill_layer_order

    cfg = ModelConfig(layersizes=(96, 640, 64))
    opt = OptConfig(lrate=0.3, momentum=0.5, weightcost=0.0, bunchsize=16)
    # padded sizes (128, 640, 128): layer 1 (640x128) is the smallest W?
    # 128*640=81920 vs 640*128=81920 — tie, later layer preferred -> spill 1
    assert spill_layer_order([128, 640, 128])[0] == 1
    st_full, st_sp, _ = _train_pair(cfg, opt, 64, hbm_spill=1)
    _assert_state_close(st_full, st_sp)


def test_hybrid_spill_two_layers_sigmoid():
    cfg = ModelConfig(layersizes=(128, 256, 128, 64), hidden="sigmoid",
                      output="sigmoid")
    opt = OptConfig(lrate=0.5, momentum=0.5, weightcost=0.0, bunchsize=32)
    st_full, st_sp, _ = _train_pair(cfg, opt, 96, hbm_spill=2)
    _assert_state_close(st_full, st_sp)


def test_hybrid_spill_clean_rule_and_padded_capacity():
    """clean rule + fixed-capacity padding (dynamic n_real): padded grid
    steps must leave the HBM-resident spilled state untouched too."""
    cfg = ModelConfig(layersizes=(128, 128, 64))
    opt = OptConfig(lrate=0.2, momentum=0.5, weightcost=0.0, bunchsize=32)
    params = init_params(jax.random.key(0), cfg, "glorot")
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((96, 128)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((96, 64)), jnp.float32)
    run = make_resident_train_chunk(cfg, opt, interpret=True, bf16=False,
                                    rule="clean", hbm_spill=1)
    st_a = run(init_train_state(params), x, t, jnp.int32(5))
    # same 3 real bunches inside a 5-bunch padded capacity
    xp = jnp.concatenate([x, jnp.zeros((64, 128), jnp.float32)])
    tp = jnp.concatenate([t, jnp.zeros((64, 64), jnp.float32)])
    st_b = run(init_train_state(params), xp, tp, jnp.int32(5), n_real=3)
    _assert_state_close(st_a, st_b, rtol=0, atol=0)


def test_hybrid_spill_dp_matches_single_chip():
    """DP x hbm_spill: per-device HBM spilled state + butterfly-allreduced
    block gradients must match the single-chip hybrid kernel exactly (f32,
    dropout off)."""
    from tpu_sednn.ops.resident_chunk import make_dp_resident_train_chunk
    from tpu_sednn.parallel import make_mesh, replicate

    cfg = ModelConfig(layersizes=(128, 128, 64))
    opt = OptConfig(lrate=0.2, momentum=0.7, weightcost=1e-3, bunchsize=32)
    params = init_params(jax.random.key(0), cfg, "glorot")
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
    st1 = make_resident_train_chunk(cfg, opt, interpret=True, bf16=False,
                                    hbm_spill=1)(
        init_train_state(params), x, t, jnp.int32(5))
    mesh = make_mesh(n_data=2, n_model=1)
    st2 = make_dp_resident_train_chunk(cfg, opt, mesh, interpret=True,
                                       bf16=False, hbm_spill=1)(
        init_train_state(replicate(params, mesh)), x, t, jnp.int32(5))
    _assert_state_close(st1, st2, rtol=1e-5, atol=1e-6)


def test_hybrid_spill_validations():
    cfg = ModelConfig(layersizes=(128, 128, 64))
    opt = OptConfig(lrate=0.2, momentum=0.5, weightcost=0.0, bunchsize=32)
    with pytest.raises(ValueError, match="f32 hybrid"):
        make_resident_train_chunk(cfg, opt, interpret=True, hbm_spill=1,
                                  sr_delta=True)
    with pytest.raises(ValueError, match="f32 hybrid"):
        make_resident_train_chunk(cfg, opt, interpret=True, hbm_spill=1,
                                  sr_state=True)
    with pytest.raises(ValueError, match="row-tiled"):
        make_resident_train_chunk(cfg, opt, interpret=True, hbm_spill=1,
                                  rule="clean", tile_rows=16)
    with pytest.raises(ValueError, match="out of range"):
        make_resident_train_chunk(cfg, opt, interpret=True, hbm_spill=3)


def test_hybrid_vmem_estimate_16k():
    """The production decision the hybrid mode exists for: 16 kHz f32 misses
    the budget all-resident, FITS at hbm_spill=1 (spilling the output
    layer), and the estimator accounts the staging buffers."""
    from tpu_sednn.ops.resident_chunk import (
        _spill_set, resident_fits_vmem, resident_vmem_bytes)

    cfg16 = ModelConfig(layersizes=(3084, 2048, 2048, 2048, 257))
    opt = OptConfig(lrate=1.0, momentum=0.5, weightcost=0.0, bunchsize=128)
    assert not resident_fits_vmem(cfg16, opt)
    assert resident_fits_vmem(cfg16, opt, hbm_spill=1)
    assert _spill_set([3200, 2048, 2048, 2048, 384], 1) == (3,)
    # spilling saves the spilled W+Delta minus the two staging blocks
    full = resident_vmem_bytes(cfg16, opt)
    sp1 = resident_vmem_bytes(cfg16, opt, hbm_spill=1)
    assert full - sp1 == 2 * 2048 * 384 * 4 - 2 * 512 * 384 * 4
