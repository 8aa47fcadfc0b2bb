"""CLI entry points for the offline tools (netgen / make_pfile)."""

import numpy as np

from tpu_sednn.io import load_norm, read_pfile_info, write_wav
from tpu_sednn.io.wts import load_wts
from tpu_sednn.tools.make_pfile import build_pfile
from tpu_sednn.tools.netgen import main as netgen_main


def test_netgen_cli(tmp_path):
    out = str(tmp_path / "g.wts")
    assert netgen_main(["4", "12", "24", "24", "6", out, "1", "0.5"]) == 0
    ws, bs = load_wts(out, layersizes=[12, 24, 24, 6])
    r = 0.5 * np.sqrt(6.0) / np.sqrt(36)
    assert np.abs(ws[0]).max() <= r
    assert all((b == 0).all() for b in bs)


def test_make_pfile_from_wavs(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        x = (0.3 * np.sin(2 * np.pi * 300 * np.arange(8000 * 2) / 8000)
             + 0.05 * rng.standard_normal(8000 * 2)).astype(np.float32)
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, x, 8000)
        paths.append(p)
    pf, nf = str(tmp_path / "a.pfile"), str(tmp_path / "a.norm")
    n = build_pfile(paths, pf, nf, shuffle_seed=1)
    info = read_pfile_info(pf, 129)
    assert info.num_sentences == 3 and info.num_frames == n
    mean, inv_std = load_norm(nf, 129)
    assert np.isfinite(mean).all() and (inv_std > 0).all()

    # --normalize (target-pfile mode): frames are (raw - mean) * inv_std of
    # the RAW build, and the emitted .norm records the raw statistics
    from tpu_sednn.io.pfile import read_pfile_frames

    pfn, nfn = str(tmp_path / "t.pfile"), str(tmp_path / "t.norm")
    build_pfile(paths, pfn, nfn, shuffle_seed=1, normalize=True)
    raw = read_pfile_frames(pf, 129, 0, n)
    normed = read_pfile_frames(pfn, 129, 0, n)
    mean_t, inv_std_t = load_norm(nfn, 129)
    np.testing.assert_array_equal(mean_t, mean)
    np.testing.assert_allclose(normed, (raw - mean) * inv_std, rtol=1e-5,
                               atol=1e-5)
    assert abs(float(normed.mean())) < 1e-3 and abs(float(normed.std()) - 1) < 0.05


def test_extend_net_cli(tmp_path):
    """python -m tpu_sednn.tools.netgen extend — the Extend_rand_net[_boost]
    executable equivalents (Extend_rand_net.cpp:262 positional convention)."""
    from tpu_sednn.io.wts import load_wts, save_wts
    from tpu_sednn.tools import gen_rand_net
    from tpu_sednn.tools.netgen import extend_main

    ori = [10, 8, 4]
    ws, bs = gen_rand_net(ori, seed=1)
    src = str(tmp_path / "a.wts")
    save_wts(src, ws, bs)

    out = str(tmp_path / "b.wts")
    rc = extend_main(["3", "1.0", "10", "8", "4", "0", "6", "0", src, out])
    assert rc == 0
    w2, b2 = load_wts(out, layersizes=[10, 14, 4])
    assert w2[0].shape == (10, 14) and w2[1].shape == (14, 4)
    np.testing.assert_array_equal(w2[0][:, :8], ws[0])  # old block preserved
    assert np.abs(w2[0][:, 8:]).max() > 0  # new columns random

    out_b = str(tmp_path / "c.wts")
    rc = extend_main(["3", "1.0", "10", "8", "4", "0", "6", "0", src, out_b,
                      "--boost"])
    assert rc == 0
    w3, _ = load_wts(out_b, layersizes=[10, 14, 4])
    # boost variant resamples new entries from the existing pool
    assert set(np.unique(w3[0][:, 8:])) <= set(np.unique(ws[0]))


def test_lenscp_cli(tmp_path):
    """python -m tpu_sednn.tools.lenscp — the GetLenScp.exe equivalent
    (how_to_get_pfile.txt:6: one frame count per line, scp order)."""
    import numpy as np

    from tpu_sednn.io.htk import write_htk
    from tpu_sednn.tools.lenscp import main as len_main

    rng = np.random.default_rng(0)
    paths, counts = [], [37, 11, 90]
    for i, n in enumerate(counts):
        p = str(tmp_path / f"u{i}.lsp")
        write_htk(p, rng.standard_normal((n, 5)).astype(np.float32),
                  big_endian=True)
        paths.append(p)
    scp = str(tmp_path / "in.scp")
    with open(scp, "w") as f:
        f.write("\n".join(paths) + "\n")
    out = str(tmp_path / "out.len")
    assert len_main([scp, out]) == 0
    assert [int(v) for v in open(out).read().split()] == counts


def test_cv_out_dump(tmp_path):
    """cv_out_file writes one "%f "-line per CV frame — the (intended)
    CV_out.txt format of BP_GPU.cu:445-473, actually functional here."""
    import numpy as np

    from tpu_sednn.config import TrainFlags
    from tpu_sednn.cli import run_epoch
    from tpu_sednn.io import compute_norm, save_norm, write_pfile

    rng = np.random.default_rng(2)
    d, context, to = 4, 3, 1
    utts = [rng.standard_normal((n, d)).astype(np.float32) for n in (20, 25, 30)]
    targs = [0.5 * u for u in utts]
    fp, tp = str(tmp_path / "f.pfile"), str(tmp_path / "t.pfile")
    write_pfile(fp, utts)
    write_pfile(tp, targs)
    mean, istd = compute_norm(np.concatenate(utts))
    npth = str(tmp_path / "a.norm")
    save_norm(npth, mean, istd)
    dump = str(tmp_path / "CV_out.txt")
    run_epoch(TrainFlags.from_argv([
        f"fea_file={fp}", f"targ_file={tp}", f"norm_file={npth}",
        f"outwts_file={tmp_path}/m.wts", "train_sent_range=0-1",
        "cv_sent_range=2-2", f"fea_dim={d}", f"fea_context={context}",
        f"targ_offset={to}", "traincache=64", "bunchsize=8",
        "init_randem_seed=3", f"layersizes={d*context+d},16,{d}",
        f"cv_out_file={dump}",
    ]))
    lines = open(dump).read().strip().splitlines()
    assert len(lines) == 30 - context + 1  # one line per CV sample
    assert all(len(l.split()) == d for l in lines)
    float(lines[0].split()[0])  # parseable "%f" fields
