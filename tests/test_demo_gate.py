"""Quality gate on the reference's enh_wav_example fixtures.

Two tiers:
* a CPU-sized smoke: evaluate_demo_clips runs end-to-end on a tiny random
  model (no quality asserted — plumbing + metric sanity only);
* the TRACKED gate: artifacts/demo_gate.json — produced on TPU by
  `python -m tpu_sednn.recipes.multi_condition` (full config) and committed —
  must meet the thresholds below.  Retraining regressions show up here.
"""

import json
import os

import numpy as np
import pytest

ART = os.path.join(os.path.dirname(__file__), "..", "artifacts", "demo_gate.json")
ART_16K = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "demo_gate_16k.json")

# Tracked thresholds, set below the round-2 mc_full TPU run's measured gains
# (test1 +4.00 / test2 +5.02 / test3 +5.20 dB; see BASELINE.md) with margin
# for training jitter.  lsd_gain > 0 means our enhanced output is closer (in
# log-spectral distance) to the shipped SEDNN output than the raw noisy clip.
MIN_LSD_GAIN = {"test1": 2.5, "test2": 3.5, "test3": 3.5}
MIN_STOI_GAIN = -0.05  # enhancement must not wreck intelligibility vs shipped


def test_demo_clip_eval_runs_cpu(tmp_path):
    import jax

    from tpu_sednn.dsp import StftConfig
    from tpu_sednn.enhance.decode import EnhanceConfig
    from tpu_sednn.model import ModelConfig, init_params
    from tpu_sednn.recipes.demo_gate import evaluate_demo_clips

    if not os.path.isdir("/root/reference/enh_wav_example"):
        pytest.skip("reference demo clips unavailable")
    stft = StftConfig.for_rate(8000)
    d = stft.n_bins
    cfg = ModelConfig(layersizes=(d * 3 + d, 32, d))
    params = init_params(jax.random.key(0), cfg, scheme="glorot")
    ecfg = EnhanceConfig(stft=stft, fea_context=3, targ_offset=1, nat=True)
    res = evaluate_demo_clips(params, cfg, ecfg,
                              np.zeros(d, np.float32), np.ones(d, np.float32))
    assert set(res) >= {"test1", "test2", "test3", "pass"}
    for name in ("test1", "test2", "test3"):
        assert res[name]["finite"]
        assert np.isfinite(res[name]["lsd_gain"])


def test_demo_gate_tracked_thresholds():
    if not os.path.exists(ART):
        pytest.skip("artifacts/demo_gate.json not yet produced (TPU run)")
    res = json.load(open(ART))
    for name, min_gain in MIN_LSD_GAIN.items():
        m = res[name]
        assert m["finite"], name
        assert m["lsd_gain"] >= min_gain, (
            f"{name}: lsd_gain {m['lsd_gain']} < tracked {min_gain} — "
            "enhanced output regressed vs the shipped SEDNN reference")
        assert m["stoi_gain"] >= MIN_STOI_GAIN, (name, m["stoi_gain"])


# 16 kHz full-band variant (benchmarks/run_16k_full.py): gates the clips at
# their NATIVE rate.  Measured +3.41/+4.12/+6.45 dB; thresholds with margin.
MIN_LSD_GAIN_16K = {"test1": 2.0, "test2": 2.5, "test3": 4.0}


def test_demo_gate_16k_tracked_thresholds():
    if not os.path.exists(ART_16K):
        pytest.skip("artifacts/demo_gate_16k.json not yet produced (TPU run)")
    res = json.load(open(ART_16K))
    for name, min_gain in MIN_LSD_GAIN_16K.items():
        m = res[name]
        assert m["finite"], name
        assert m["lsd_gain"] >= min_gain, (name, m["lsd_gain"], min_gain)
        assert m["stoi_gain"] >= MIN_STOI_GAIN, (name, m["stoi_gain"])


# IRM mask-head variant (benchmarks/run_irm_full.py): measured positive on
# every metric (+3.06/+4.50/+3.22 LSD, stoi +0.015..0.023, segsnr >= +0.30).
ART_IRM = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "demo_gate_irm.json")
MIN_LSD_GAIN_IRM = {"test1": 1.5, "test2": 2.5, "test3": 1.5}


def test_demo_gate_irm_tracked_thresholds():
    if not os.path.exists(ART_IRM):
        pytest.skip("artifacts/demo_gate_irm.json not yet produced (TPU run)")
    res = json.load(open(ART_IRM))
    for name, min_gain in MIN_LSD_GAIN_IRM.items():
        m = res[name]
        assert m["finite"], name
        assert m["lsd_gain"] >= min_gain, (name, m["lsd_gain"], min_gain)
        assert m["stoi_gain"] >= 0.0, (name, m["stoi_gain"])  # mask head: positive
