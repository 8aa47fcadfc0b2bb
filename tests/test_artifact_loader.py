"""recipes/artifact.py: run-dir loader round-trip."""

import json
import os

import jax
import numpy as np

from tpu_sednn.io import save_norm, save_wts
from tpu_sednn.model import ModelConfig, init_params, params_to_wts
from tpu_sednn.recipes.artifact import load_run_dir


def _write_run_dir(tmp_path, manifest: dict | None, gv: bool = False,
                   targ_norm: bool = False, sizes=(387, 64, 129)):
    mcfg = ModelConfig(layersizes=sizes)
    params = init_params(jax.random.key(0), mcfg, scheme="glorot")
    ws, bs = params_to_wts(params)
    save_wts(os.path.join(tmp_path, "mlp.final.wts"), ws, bs)
    d = sizes[-1]
    save_norm(os.path.join(tmp_path, "fea.norm"),
              np.zeros(d, np.float32), np.ones(d, np.float32))
    if targ_norm:
        save_norm(os.path.join(tmp_path, "targ.norm"),
                  np.full(d, 0.5, np.float32), np.full(d, 2.0, np.float32))
    if gv:
        np.savetxt(os.path.join(tmp_path, "gv.txt"),
                   np.ones(d, np.float32) * 3.0)
    if manifest is not None:
        with open(os.path.join(tmp_path, "run.json"), "w") as f:
            json.dump(manifest, f)
    return params


def test_load_run_dir_manifest(tmp_path):
    p0 = _write_run_dir(str(tmp_path), {
        "head": "psm", "sample_rate": 8000, "fea_context": 2,
        "targ_offset": 1, "dropout": [0.1, 0.2], "gv_mode": "off",
        "nat": True, "mask_floor": 0.03, "min_gain_db": None,
        "max_gain_db": None,
    }, targ_norm=True)
    params, mcfg, ecfg, mean, istd, tn, gv = load_run_dir(str(tmp_path))
    assert ecfg.head == "psm" and ecfg.mask_floor == 0.03
    assert ecfg.stft.sample_rate == 8000 and ecfg.fea_context == 2
    assert mcfg.output == "sigmoid"  # mask head
    assert tn is not None and float(tn[1][0]) == 2.0
    assert gv is None  # gv_mode off -> gv.txt ignored even if present
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_load_run_dir_gv_enabled(tmp_path):
    _write_run_dir(str(tmp_path), {
        "head": "lps", "sample_rate": 8000, "fea_context": 2,
        "targ_offset": 1, "dropout": [0.1, 0.2], "gv_mode": "global",
        "nat": True, "mask_floor": 0.0,
    }, gv=True)
    _, mcfg, ecfg, _, _, _, gv = load_run_dir(str(tmp_path))
    assert ecfg.gv_mode == "global" and gv is not None and gv[0] == 3.0
    assert mcfg.output == "linear"


def test_load_run_dir_legacy_no_manifest(tmp_path):
    """No run.json: canonical-lps defaults; gv.txt presence auto-enables
    global GV (preserved legacy behavior)."""
    _write_run_dir(str(tmp_path), None, gv=True)
    _, mcfg, ecfg, _, _, _, gv = load_run_dir(str(tmp_path), quiet=True)
    assert ecfg.head == "lps"
    assert ecfg.gv_mode == "global" and gv is not None
    # geometry inferred from the wts shapes: 387 = 2*129 + 129 -> ctx 2, NAT
    assert ecfg.fea_context == 2 and ecfg.nat


def test_synth_block_determinism_and_partition_invariance():
    """The scale corpus builder's worker: per-utterance rng means block
    partitioning cannot change the corpus."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "canonical_pfile_epoch_test",
        _os.path.join(_os.path.dirname(__file__), "..", "benchmarks",
                      "canonical_pfile_epoch.py"))
    cpe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cpe)
    from tpu_sednn.data.mixing import synth_noise

    rng = np.random.default_rng(0)
    noises = {k: synth_noise(rng, 8 * 24000, k) for k in ("white", "pink")}
    kinds = ("white", "pink")
    snrs = (0.0, 5.0)
    one = cpe._synth_block((0, 4, 7, 24000, noises, kinds, snrs))
    a = cpe._synth_block((0, 2, 7, 24000, noises, kinds, snrs))
    b = cpe._synth_block((2, 4, 7, 24000, noises, kinds, snrs))
    assert len(one) == 4
    for (c1, n1), (c2, n2) in zip(one, a + b):
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(n1, n2)
