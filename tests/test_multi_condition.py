"""Mini end-to-end run of the multi-condition pipeline (DP over 8 CPU devs)."""

import json
import os

import numpy as np

from tpu_sednn.recipes.multi_condition import MultiConditionConfig, run_multi_condition
from tpu_sednn.utils.logging import Logger


def test_multi_condition_mini(tmp_path):
    mc = MultiConditionConfig(
        out_dir=str(tmp_path / "mc"),
        n_utts=16,
        snrs=(0.0, 5.0),
        noise_kinds=("white",),
        fea_context=3,
        targ_offset=1,
        hidden=(128, 128),
        n_epochs=5,
        bunchsize=64,
        use_dp_mesh=True,
        head="lps",  # the regression head (the config default flagship is psm)
        reverb_prob=0.3,  # corpus realism rung rides through the pipeline
        eval_noise_kinds=("pink",),  # unseen-noise generalization protocol
    )
    res = run_multi_condition(mc, logger=Logger(stream=None))
    assert res["cv_hist"][-1] < res["cv_hist"][0]
    gen = res["eval"]["noise_generalization"]
    assert set(gen["per_kind"]) == {"white", "pink"}
    assert gen["per_kind"]["white"]["seen"] is True
    assert gen["per_kind"]["pink"]["seen"] is False
    for grp in ("seen", "unseen"):
        for k in ("stoi_gain", "segsnr_gain", "pesq_gain", "lsd_gain"):
            assert np.isfinite(gen[grp][k])
    assert set(gen["gap"]) == {"stoi_gain", "segsnr_gain", "pesq_gain",
                               "lsd_gain"}
    ev = res["eval"]["synthetic_0dB"]
    assert ev["snr_enh"] > ev["snr_noisy"]
    assert os.path.exists(str(tmp_path / "mc" / "mlp.final.wts"))
    assert os.path.exists(str(tmp_path / "mc" / "fea.norm"))
    demo = res["eval"]["demo_clips"]  # all three enh_wav_example pairs scored
    assert set(demo) >= {"test1", "test2", "test3"}
    for name in ("test1", "test2", "test3"):
        assert demo[name]["finite"]
        assert np.isfinite(demo[name]["lsd_gain"])
    assert os.path.exists(str(tmp_path / "mc" / "demo_gate.json"))
    assert os.path.exists(str(tmp_path / "mc" / "targ.norm"))
    with open(str(tmp_path / "mc" / "results.json")) as f:
        assert json.load(f)["cv_hist"] == res["cv_hist"]


def test_prefetcher_order_and_errors():
    from tpu_sednn.data.prefetch import Prefetcher

    out = list(Prefetcher(range(10), lambda i: i * i, depth=3))
    assert out == [i * i for i in range(10)]

    def boom(i):
        if i == 3:
            raise RuntimeError("boom")
        return i

    it = iter(Prefetcher(range(5), boom, depth=2))
    got = []
    try:
        for v in it:
            got.append(v)
        raise AssertionError("expected RuntimeError")
    except RuntimeError:
        pass
    assert got == [0, 1, 2]


def test_multi_condition_irm_head(tmp_path):
    """The Interspeech'15 mask-estimation variant trains end-to-end: sigmoid
    head on IRM targets, decode applies the estimated mask to the noisy
    spectrum, and enhancement beats the noisy input on held-out SNR."""
    mc = MultiConditionConfig(
        out_dir=str(tmp_path / "mc_irm"),
        n_utts=16,
        snrs=(0.0, 5.0),
        noise_kinds=("white",),
        fea_context=5,
        targ_offset=2,
        hidden=(128, 128),
        n_epochs=5,
        bunchsize=64,
        head="irm",
    )
    res = run_multi_condition(mc, logger=Logger(stream=None))
    assert res["cv_hist"][-1] < res["cv_hist"][0]
    ev = res["eval"]["synthetic_0dB"]
    assert ev["snr_enh"] > ev["snr_noisy"]
    assert ev["stoi_enh"] > ev["stoi_noisy"] - 0.02


def test_multi_condition_psm_head(tmp_path):
    """The phase-sensitive-mask variant (Erdogan'15) trains end-to-end via
    the recipe: waveform-STFT targets, same sigmoid head + mask decode."""
    mc = MultiConditionConfig(
        out_dir=str(tmp_path / "mc_psm"),
        n_utts=16,
        snrs=(0.0, 5.0),
        noise_kinds=("white",),
        fea_context=5,
        targ_offset=2,
        hidden=(128, 128),
        n_epochs=5,
        bunchsize=64,
        head="psm",
    )
    res = run_multi_condition(mc, logger=Logger(stream=None))
    assert res["cv_hist"][-1] < res["cv_hist"][0]
    ev = res["eval"]["synthetic_0dB"]
    assert ev["snr_enh"] > ev["snr_noisy"]
    assert json.load(open(str(tmp_path / "mc_psm" / "run.json")))["head"] == "psm"


def test_traincache_chunking_equivalent(tmp_path):
    """Chunked epochs (traincache < dataset) train to the same result as one
    whole-epoch call when traincache is a bunchsize multiple and dropout is
    off (update order is identical; only the permutation gather is split)."""
    base = dict(
        n_utts=12,
        snrs=(0.0,),
        noise_kinds=("white",),
        fea_context=3,
        targ_offset=1,
        hidden=(64,),
        n_epochs=2,
        bunchsize=32,
        use_dp_mesh=False,
        head="lps",
        dropout=(0.0, 0.0),
    )
    r_big = run_multi_condition(
        MultiConditionConfig(out_dir=str(tmp_path / "big"), traincache=10**9,
                             **base), logger=Logger(stream=None))
    r_small = run_multi_condition(
        MultiConditionConfig(out_dir=str(tmp_path / "small"), traincache=64,
                             **base), logger=Logger(stream=None))
    assert r_big["cv_hist"] == r_small["cv_hist"]


def test_resident_padded_chunks_match_xla(tmp_path):
    """Resident engine with fixed-capacity padded chunks (dynamic n_real —
    one compile serves every chunk incl. the remainder) trains to the same
    result as the XLA engine's trimmed chunks (dropout off)."""
    base = dict(
        n_utts=12,
        snrs=(0.0,),
        noise_kinds=("white",),
        fea_context=3,
        targ_offset=1,
        hidden=(64,),
        n_epochs=2,
        bunchsize=32,
        use_dp_mesh=False,
        head="lps",
        dropout=(0.0, 0.0),
        traincache=64,  # forces multiple chunks + a padded remainder
    )
    r_xla = run_multi_condition(
        MultiConditionConfig(out_dir=str(tmp_path / "xla"), engine="xla",
                             **base), logger=Logger(stream=None))
    r_res = run_multi_condition(
        MultiConditionConfig(out_dir=str(tmp_path / "res"), engine="resident",
                             engine_kwargs={"interpret": True, "bf16": False},
                             **base), logger=Logger(stream=None))
    for a, b in zip(r_xla["cv_hist"], r_res["cv_hist"]):
        assert abs(a - b) / max(abs(a), 1e-9) < 1e-4, (a, b)
