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
