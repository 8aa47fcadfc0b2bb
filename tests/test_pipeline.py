"""Chunk planner / parity chunk reader tests against a literal loop oracle."""

import numpy as np
import pytest

from tpu_sednn.data import (
    Rand48,
    build_training_arrays,
    mix_at_snr,
    nat_estimate,
    plan_chunks,
    read_chunk_parity,
    splice,
    synth_noise,
    synth_speech,
)
from tpu_sednn.io.norm import compute_norm
from tpu_sednn.io.pfile import read_pfile_info, write_pfile


def _oracle_readchunk(utts, targs, fbs, chunk_start, frames_need, samples_in_chunk,
                      context, targ_offset, mean, inv_std, perm):
    """Literal nested-loop transcription of Interface::Readchunk (689-861)."""
    d = utts[0].shape[1]
    d_out = targs[0].shape[1]
    all_f = (np.concatenate(utts) - mean) * inv_std
    all_t = np.concatenate(targs)
    data = all_f[chunk_start : chunk_start + frames_need]
    tdata = all_t[chunk_start : chunk_start + frames_need]
    in_dim = d * context + d
    indata = np.zeros((samples_in_chunk, in_dim), np.float32)
    targ = np.zeros((samples_in_chunk, d_out), np.float32)

    bounds = np.concatenate([[0], fbs])
    cur_sample = 0
    frames_processed = 0
    cur_sent = int(np.searchsorted(fbs, chunk_start, side="right"))
    cur_frame_id = chunk_start
    while frames_processed != frames_need:
        if fbs[cur_sent] > frames_need + chunk_start:
            cur_frame_of_sent = frames_need - frames_processed
        else:
            cur_frame_of_sent = int(fbs[cur_sent]) - cur_frame_id
        for j in range(cur_frame_of_sent - context + 1):
            row = perm[cur_sample]
            for i in range(context):
                indata[row, i * d : (i + 1) * d] = data[frames_processed + j + i]
            # NAT: mean of first 6 frames of the segment
            indata[row, context * d :] = data[frames_processed : frames_processed + 6].sum(0) / 6.0
            targ[row] = tdata[frames_processed + j + targ_offset]
            cur_sample += 1
        cur_frame_id = int(fbs[cur_sent])
        cur_sent += 1
        frames_processed += cur_frame_of_sent
    return indata, targ


def _mk_pfiles(tmp_path, seed=0, n_utts=7, d=5, d_out=3):
    rng = np.random.default_rng(seed)
    lens = rng.integers(12, 60, n_utts)
    utts = [rng.standard_normal((n, d)).astype(np.float32) for n in lens]
    targs = [rng.standard_normal((n, d_out)).astype(np.float32) for n in lens]
    fp, tp = str(tmp_path / "f.pfile"), str(tmp_path / "t.pfile")
    write_pfile(fp, utts)
    write_pfile(tp, targs)
    return utts, targs, fp, tp


def test_plan_chunks_invariants():
    lens = [50, 8, 120, 30, 11, 200]
    fbs = np.cumsum(lens)
    # large traincache: one chunk, nothing split -> every sentence yields
    # max(0, len - context + 1) samples
    plan1 = plan_chunks(fbs, (0, 5), fea_context=11, traincache=100_000)
    assert plan1.total_chunks == 1
    assert plan1.total_samples == sum(max(0, L - 10) for L in lens)

    # small traincache: each mid-sentence chunk split re-reads the tail as a
    # fresh segment and therefore LOSES context-1 boundary windows — a
    # documented reference quirk (get_chunk_info, Interface.cc:599-614)
    plan2 = plan_chunks(fbs, (0, 5), fea_context=11, traincache=100)
    assert plan2.chunk_frame_st[0] == 0
    assert plan2.total_chunks == len(plan2.chunk_frame_st)
    n_splits = plan2.total_chunks - 1
    assert plan2.total_samples == plan1.total_samples - 10 * n_splits


def test_plan_chunks_subrange():
    fbs = np.cumsum([40, 40, 40, 40])
    plan = plan_chunks(fbs, (1, 2), fea_context=11, traincache=1000)
    assert plan.chunk_frame_st[0] == 40
    assert plan.total_samples == 2 * 30


def test_splice_and_nat():
    x = np.arange(24, dtype=np.float32).reshape(8, 3)
    s = splice(x, 3)
    assert s.shape == (6, 9)
    np.testing.assert_array_equal(s[0], x[0:3].ravel())
    np.testing.assert_array_equal(s[5], x[5:8].ravel())
    est = nat_estimate(x)
    np.testing.assert_allclose(est, x[:6].mean(axis=0), rtol=1e-6)
    assert splice(np.zeros((2, 3), np.float32), 3).shape == (0, 9)


@pytest.mark.parametrize("traincache", [64, 97, 1000])
def test_read_chunk_parity_vs_oracle(tmp_path, traincache):
    utts, targs, fp, tp = _mk_pfiles(tmp_path)
    d, d_out, context, targ_offset = 5, 3, 4, 1
    fea_info = read_pfile_info(fp, d)
    targ_info = read_pfile_info(tp, d_out)
    feats = np.concatenate(utts)
    mean, inv_std = compute_norm(feats)
    plan = plan_chunks(fea_info.frames_before_sent, (0, len(utts) - 1), context, traincache)

    rand_a, rand_b = Rand48(42), Rand48(42)
    for ci in range(plan.total_chunks):
        ind, tgt = read_chunk_parity(
            fea_info, targ_info, plan, ci, context, targ_offset, mean, inv_std, rand_a
        )
        n = len(ind)
        perm = rand_b.shuffle_indices(n)
        if ci == plan.total_chunks - 1:
            frames_need = int(fea_info.frames_before_sent[plan.sent_en]) - int(plan.chunk_frame_st[ci])
        else:
            frames_need = int(plan.chunk_frame_st[ci + 1]) - int(plan.chunk_frame_st[ci])
        ind2, tgt2 = _oracle_readchunk(
            utts, targs, fea_info.frames_before_sent, int(plan.chunk_frame_st[ci]),
            frames_need, n, context, targ_offset, mean, inv_std, perm,
        )
        np.testing.assert_allclose(ind, ind2, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(tgt, tgt2, rtol=1e-5, atol=1e-6)


def test_read_chunk_cv_unshuffled(tmp_path):
    utts, targs, fp, tp = _mk_pfiles(tmp_path, seed=3)
    fea_info = read_pfile_info(fp, 5)
    targ_info = read_pfile_info(tp, 3)
    mean, inv_std = compute_norm(np.concatenate(utts))
    plan = plan_chunks(fea_info.frames_before_sent, (0, 6), 4, 10_000)
    ind, tgt = read_chunk_parity(fea_info, targ_info, plan, 0, 4, 1, mean, inv_std, None)
    # first sample must be the first spliced window of utterance 0
    first = ((utts[0][:4] - mean) * inv_std).ravel()
    np.testing.assert_allclose(ind[0, :20], first, rtol=1e-5)
    np.testing.assert_allclose(tgt[0], targs[0][1], rtol=1e-6)


def test_build_training_arrays_matches_parity_layout(tmp_path):
    """The TPU-first array builder must produce the same samples as the
    parity reader modulo ordering (CV reader order == utterance order)."""
    utts, targs, fp, tp = _mk_pfiles(tmp_path, seed=9)
    fea_info = read_pfile_info(fp, 5)
    targ_info = read_pfile_info(tp, 3)
    mean, inv_std = compute_norm(np.concatenate(utts))
    plan = plan_chunks(fea_info.frames_before_sent, (0, 6), 4, 10_000)
    ind, tgt = read_chunk_parity(fea_info, targ_info, plan, 0, 4, 1, mean, inv_std, None)

    x, t = build_training_arrays(utts, targs, fea_context=4, targ_offset=1,
                                 nat=True, mean=mean, inv_std=inv_std)
    assert x.shape == ind.shape
    np.testing.assert_allclose(x, ind, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(t, tgt, rtol=1e-5, atol=1e-6)


def test_mixing_snr():
    rng = np.random.default_rng(0)
    c = synth_speech(rng, 16000)
    n = synth_noise(rng, 16000, "white")
    for snr in (-5.0, 0.0, 10.0):
        y = mix_at_snr(c, n, snr)
        added = y - c
        got = 10 * np.log10(np.mean(c**2) / np.mean(added**2))
        assert abs(got - snr) < 0.5, (snr, got)


def test_device_chunk_matches_parity_reader(tmp_path):
    """build_chunk_on_device + read_chunk_indexed must reproduce
    read_chunk_parity exactly (splice, NAT, shuffled scatter) — including
    identical lrand48 stream consumption — with padded capacities."""
    import jax.numpy as jnp

    from tpu_sednn.data.device_chunk import (
        build_chunk_on_device, chunk_capacities, read_chunk_indexed,
    )
    from tpu_sednn.io import compute_norm, write_pfile
    from tpu_sednn.io.pfile import read_pfile_info

    rng = np.random.default_rng(5)
    d, context, to = 5, 3, 1
    utts = [rng.standard_normal((n, d)).astype(np.float32)
            for n in (30, 2, 41, 25, 33)]  # incl. a too-short sentence
    targs = [0.3 * u + 0.1 for u in utts]
    fp, tp = str(tmp_path / "f.pfile"), str(tmp_path / "t.pfile")
    write_pfile(fp, utts)
    write_pfile(tp, targs)
    mean, istd = compute_norm(np.concatenate(utts))
    fea_info = read_pfile_info(fp, d)
    targ_info = read_pfile_info(tp, d)
    plan = plan_chunks(fea_info.frames_before_sent, (0, 4), context, 60)
    frames_cap, samples_cap, seg_cap = chunk_capacities(fea_info, plan, context)

    for ci in range(plan.total_chunks):
        r1, r2 = Rand48(9), Rand48(9)
        # advance both streams identically through earlier chunks
        for cj in range(ci):
            read_chunk_parity(fea_info, targ_info, plan, cj, context, to,
                              mean, istd, r1)
            read_chunk_indexed(fea_info, targ_info, plan, cj, context,
                               mean, istd, r2)
        want_x, want_t = read_chunk_parity(
            fea_info, targ_info, plan, ci, context, to, mean, istd, r1)
        fea, targ, ws, sid, soff, slen, n_s = read_chunk_indexed(
            fea_info, targ_info, plan, ci, context, mean, istd, r2,
            frames_cap=frames_cap, samples_cap=samples_cap, seg_cap=seg_cap)
        assert r1.x == r2.x  # identical stream consumption
        x, t = build_chunk_on_device(
            jnp.asarray(fea), jnp.asarray(targ), jnp.asarray(ws),
            jnp.asarray(sid), jnp.asarray(soff), jnp.asarray(slen),
            context, to, True)
        assert n_s == len(want_x)
        np.testing.assert_allclose(np.asarray(x)[:n_s], want_x, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t)[:n_s], want_t, rtol=0, atol=0)


def test_epoch_device_splice_matches_host_path(tmp_path):
    """A full CLI epoch with device_splice=1 (xla engine on CPU) must train
    to the same weights as the host parity pipeline."""
    from tpu_sednn.cli import run_epoch
    from tpu_sednn.config import TrainFlags
    from tpu_sednn.io import compute_norm, save_norm, write_pfile
    from tpu_sednn.io.wts import load_wts

    rng = np.random.default_rng(0)
    d, context, to = 4, 3, 1
    utts = [rng.standard_normal((n, d)).astype(np.float32) for n in (40, 35, 50, 22)]
    targs = [np.tanh(u) for u in utts]
    fp, tp = str(tmp_path / "f.pfile"), str(tmp_path / "t.pfile")
    write_pfile(fp, utts)
    write_pfile(tp, targs)
    mean, istd = compute_norm(np.concatenate(utts))
    npth = str(tmp_path / "a.norm")
    save_norm(npth, mean, istd)
    base = [
        f"fea_file={fp}", f"targ_file={tp}", f"norm_file={npth}",
        "train_sent_range=0-2", "cv_sent_range=3-3",
        f"fea_dim={d}", f"fea_context={context}", f"targ_offset={to}",
        "traincache=48", "bunchsize=8", "init_randem_seed=11",
        "momentum=0.5", "lrate=0.2", "engine=xla",
        f"layersizes={d*context+d},16,{d}",
    ]
    cv_a = run_epoch(TrainFlags.from_argv(
        base + [f"outwts_file={tmp_path}/a.wts", "device_splice=0"]))
    cv_b = run_epoch(TrainFlags.from_argv(
        base + [f"outwts_file={tmp_path}/b.wts", "device_splice=1"]))
    assert abs(cv_a - cv_b) / max(cv_a, 1e-12) < 1e-4
    wa, _ = load_wts(f"{tmp_path}/a.wts")
    wb, _ = load_wts(f"{tmp_path}/b.wts")
    for a, b in zip(wa, wb):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
