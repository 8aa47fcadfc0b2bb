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

# Tracked thresholds, set below the round-3 re-scored gains (lps head,
# decode params FROZEN from the held-out validation sweep — never these
# clips; measured test1 +5.56 / test2 +6.80 / test3 +7.81 dB) with margin
# for training jitter.  lsd_gain > 0 means our enhanced output is closer (in
# log-spectral distance) to the shipped SEDNN output than the raw noisy clip.
MIN_LSD_GAIN = {"test1": 4.5, "test2": 5.5, "test3": 6.5}
# stoi_gain here is SIMILARITY-to-the-shipped-OUTPUT, not intelligibility vs
# clean (no clean truth exists for these recordings): the lps decode, chosen
# for POSITIVE held-out STOI vs clean (+0.069, artifacts/mc_full_r2/
# val_sweep.json), suppresses more than the shipped processing and so reads
# lower on this proxy.  The mask-head gates below (IRM + the PSM flagship)
# require >= 0.  This bound is a regression TRIPWIRE, not a quality bar: it
# sits just under the worst measured proxy value (-0.099) purely to catch a
# retraining collapse; quality claims ride on the >= 0 mask-head gates.
STOI_PROXY_TRIPWIRE = -0.15


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
        assert m["stoi_gain"] >= STOI_PROXY_TRIPWIRE, (name, m["stoi_gain"])


# 16 kHz tracked slot — since round 4 held by the FLAGSHIP-SCALE PSM mask
# head (artifacts/mc_full_psm_16k_xl: 2000x2 utts, 22 epochs, sr_delta
# resident engine).  It trades ~1 dB proxy-LSD against the old lps model
# (+2.47/+2.83/+7.70 vs +3.67/+3.02/+8.41) but dominates on the OTHER three
# metric families: proxy STOI -0.041 worst-case vs lps's -0.157, SegSNR
# +2.28/+3.41/-0.62 and PESQ(est) all positive — and its held-out sweep
# reads +11.0 dB LSD / +0.098 STOI vs clean truth.  The lps run stays
# available at artifacts/mc_full_16k.
MIN_LSD_GAIN_16K = {"test1": 2.0, "test2": 2.2, "test3": 7.0}
# proxy-vs-shipped regression TRIPWIRE (not a quality bar; worst measured
# -0.041) — see STOI_PROXY_TRIPWIRE above
STOI_PROXY_TRIPWIRE_16K = -0.08


def test_demo_gate_16k_tracked_thresholds():
    if not os.path.exists(ART_16K):
        pytest.skip("artifacts/demo_gate_16k.json not yet produced (TPU run)")
    res = json.load(open(ART_16K))
    for name, min_gain in MIN_LSD_GAIN_16K.items():
        m = res[name]
        assert m["finite"], name
        assert m["lsd_gain"] >= min_gain, (name, m["lsd_gain"], min_gain)
        assert m["stoi_gain"] >= STOI_PROXY_TRIPWIRE_16K, (name, m["stoi_gain"])


# IRM mask head (round-3 XL retrain: 2000 utts x 2 variants, 22 epochs,
# utterance-granular CV split, decode params frozen from the held-out sweep;
# benchmarks/run_irm_xl.py): positive on EVERY metric — +3.80/+6.57/+4.01 dB
# LSD, stoi +0.011..0.029, segsnr +0.43..+5.95 dB, pesq(est) +0.22..+0.45.
# Superseded as flagship by the PSM head (gate below).
ART_IRM = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "demo_gate_irm.json")
MIN_LSD_GAIN_IRM = {"test1": 3.0, "test2": 5.5, "test3": 3.0}


def test_demo_gate_irm_tracked_thresholds():
    if not os.path.exists(ART_IRM):
        pytest.skip("artifacts/demo_gate_irm.json not yet produced (TPU run)")
    res = json.load(open(ART_IRM))
    for name, min_gain in MIN_LSD_GAIN_IRM.items():
        m = res[name]
        assert m["finite"], name
        assert m["lsd_gain"] >= min_gain, (name, m["lsd_gain"], min_gain)
        assert m["stoi_gain"] >= 0.0, (name, m["stoi_gain"])  # mask head: positive


# PSM mask-head FLAGSHIP (round 3, benchmarks/run_psm_full.py): the
# phase-sensitive mask head at the same scale/schedule/sweep as the XL IRM
# run, dominating it on 8 of 9 gate metrics — +5.18/+7.62/+5.02 dB LSD,
# stoi +0.005..0.030, segsnr +0.43..+6.75 dB, pesq(est) +0.20..+0.51.
ART_PSM = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "demo_gate_psm.json")
MIN_LSD_GAIN_PSM = {"test1": 4.0, "test2": 6.5, "test3": 4.0}


def test_demo_gate_psm_flagship_tracked_thresholds():
    if not os.path.exists(ART_PSM):
        pytest.skip("artifacts/demo_gate_psm.json not yet produced (TPU run)")
    res = json.load(open(ART_PSM))
    for name, min_gain in MIN_LSD_GAIN_PSM.items():
        m = res[name]
        assert m["finite"], name
        assert m["lsd_gain"] >= min_gain, (name, m["lsd_gain"], min_gain)
        assert m["stoi_gain"] >= 0.0, (name, m["stoi_gain"])
        assert m["segsnr_gain"] >= 0.0, (name, m["segsnr_gain"])


# Canonical pfile-recipe model (benchmarks/run_tpu_round3.py stage D): the
# 20-epoch momentum-ramp recipe through the byte-exact FILE/CLI path — the
# reference's actual operating mode.  Measured +2.34/+2.98/+3.80 dB LSD.
ART_RECIPE = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                          "recipe_full", "demo_gate.json")
MIN_LSD_GAIN_RECIPE = {"test1": 1.5, "test2": 2.0, "test3": 2.5}


def test_demo_gate_pfile_recipe_tracked_thresholds():
    if not os.path.exists(ART_RECIPE):
        pytest.skip("artifacts/recipe_full/demo_gate.json not yet produced")
    res = json.load(open(ART_RECIPE))
    assert res["pass"] is True
    for name, min_gain in MIN_LSD_GAIN_RECIPE.items():
        m = res[name]
        assert m["finite"], name
        assert m["lsd_gain"] >= min_gain, (name, m["lsd_gain"], min_gain)


# 16 kHz mask heads at FLAGSHIP scale (round 4, benchmarks/run_tpu_round4.py
# stages B/C: 2000 utts x 2 variants, 22 epochs, all noise families, held-out
# sweep, trained on the sr_delta resident engine).  Measured PSM
# +2.47/+2.83/+7.70 dB LSD (stoi +0.009/-0.007/-0.041), IRM
# +2.26/+2.55/+7.04.  PSM dominates IRM at 16 kHz like at 8 kHz; the lps
# model keeps the LSD-primary 16k slot (see BASELINE.md r4 — scale saturates
# the 16 kHz gate).  Thresholds sit under the measured values with margin;
# the stoi bound is a proxy tripwire (see STOI_PROXY_TRIPWIRE above).
ART_PSM_16K = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                           "demo_gate_psm_16k.json")
MIN_LSD_GAIN_PSM_16K = {"test1": 1.9, "test2": 2.2, "test3": 6.8}
ART_IRM_16K = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                           "demo_gate_irm_16k.json")
MIN_LSD_GAIN_IRM_16K = {"test1": 1.7, "test2": 2.0, "test3": 6.2}
STOI_PROXY_TRIPWIRE_MASK_16K = -0.08


def test_demo_gate_psm_16k_tracked_thresholds():
    if not os.path.exists(ART_PSM_16K):
        pytest.skip("artifacts/demo_gate_psm_16k.json not yet produced")
    res = json.load(open(ART_PSM_16K))
    for name, min_gain in MIN_LSD_GAIN_PSM_16K.items():
        m = res[name]
        assert m["finite"], name
        assert m["lsd_gain"] >= min_gain, (name, m["lsd_gain"], min_gain)
        assert m["stoi_gain"] >= STOI_PROXY_TRIPWIRE_MASK_16K, (name, m["stoi_gain"])


def test_demo_gate_irm_16k_tracked_thresholds():
    if not os.path.exists(ART_IRM_16K):
        pytest.skip("artifacts/demo_gate_irm_16k.json not yet produced")
    res = json.load(open(ART_IRM_16K))
    for name, min_gain in MIN_LSD_GAIN_IRM_16K.items():
        m = res[name]
        assert m["finite"], name
        assert m["lsd_gain"] >= min_gain, (name, m["lsd_gain"], min_gain)
        assert m["stoi_gain"] >= STOI_PROXY_TRIPWIRE_MASK_16K, (name, m["stoi_gain"])


# Unseen-noise generalization protocol, WIDENED round 5 (VERDICT r4 item 4;
# benchmarks/run_unseen_noise_wide.py): the round-4 seen-5-families PSM model
# re-scored over 10 unseen families (toward the reference's 15 unseen NoiseX
# types).  Two decode configs in the artifact:
# * noise_generalization — production (val-sweep-frozen) decode.  Measured:
#   EVERY unseen family positive on every metric; unseen aggregate LSD
#   +5.59 dB / STOI +0.062; gap LSD +2.77 (the widened set includes
#   low-frequency regimes — car/traffic/wind — farthest from the 5 seen
#   families' coverage; uncapped suppression widens the seen advantage).
# * r4_decode_continuity — the round-4 in-training eval's decode (mask_floor
#   0.05, -10/0 dB window): first seven family rows reproduce the round-4
#   artifact (white +7.419 vs +7.414), gap LSD +0.87 over 10 families.
ART_UNSEEN = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                          "unseen_noise.json")


def test_unseen_noise_generalization_tracked():
    if not os.path.exists(ART_UNSEEN):
        pytest.skip("artifacts/unseen_noise.json not yet produced (TPU run)")
    art = json.load(open(ART_UNSEEN))
    gen = art["noise_generalization"]
    unseen_kinds = [k for k, v in gen["per_kind"].items() if not v["seen"]]
    assert len(unseen_kinds) >= 10  # widened protocol
    # the central claim: generalization holds on EVERY unseen family
    for kind in unseen_kinds:
        assert gen["per_kind"][kind]["lsd_gain"] >= 1.0, kind
        assert gen["per_kind"][kind]["stoi_gain"] >= 0.0, kind
        assert gen["per_kind"][kind]["segsnr_gain"] >= 0.0, kind
    assert gen["unseen"]["lsd_gain"] >= 4.0
    assert gen["unseen"]["stoi_gain"] >= 0.03
    # gap bounded under production decode (widened families include
    # low-frequency regimes the seen set covers least)
    assert gen["gap"]["lsd_gain"] <= 3.5
    assert gen["gap"]["stoi_gain"] <= 0.1
    # continuity block: same decode as round 4 -> tight gap over 10 families
    cont = art.get("r4_decode_continuity")
    if cont:
        assert cont["gap"]["lsd_gain"] <= 1.5
        assert cont["unseen"]["lsd_gain"] >= 3.5
        # round-4 reproduction pin (CPU/TPU fp tolerance)
        assert abs(cont["per_kind"]["white"]["lsd_gain"] - 7.414) < 0.1


# Reverb-trained flagship variant (round 4 stage E, reverb_prob=0.5):
# measured +3.37/+6.97/+4.00 dB LSD, ALL stoi/segsnr positive, and 4x the
# flagship's test3 (real-world reverberant clip) proxy STOI. Tracked as the
# reverberant-conditions deployment variant; the dry PSM keeps the flagship.
ART_PSM_REVERB = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                              "demo_gate_psm_reverb.json")
MIN_LSD_GAIN_PSM_REVERB = {"test1": 2.8, "test2": 6.0, "test3": 3.4}


def test_demo_gate_psm_reverb_tracked_thresholds():
    if not os.path.exists(ART_PSM_REVERB):
        pytest.skip("artifacts/demo_gate_psm_reverb.json not yet produced")
    res = json.load(open(ART_PSM_REVERB))
    for name, min_gain in MIN_LSD_GAIN_PSM_REVERB.items():
        m = res[name]
        assert m["finite"], name
        assert m["lsd_gain"] >= min_gain, (name, m["lsd_gain"], min_gain)
        assert m["stoi_gain"] >= 0.0, (name, m["stoi_gain"])
        assert m["segsnr_gain"] >= 0.0, (name, m["segsnr_gain"])
    # the reason this variant exists: real-world reverberant clip STOI
    assert res["test3"]["stoi_gain"] >= 0.01


# IBM head (round 4 stage F, 800 utts x 2, LC5dB targets): the last head
# variant with quality evidence. Measured +4.18/+5.93/+4.23 dB LSD.
ART_IBM = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "demo_gate_ibm.json")
MIN_LSD_GAIN_IBM = {"test1": 3.5, "test2": 5.0, "test3": 3.5}


def test_demo_gate_ibm_tracked_thresholds():
    if not os.path.exists(ART_IBM):
        pytest.skip("artifacts/demo_gate_ibm.json not yet produced (TPU run)")
    res = json.load(open(ART_IBM))
    for name, min_gain in MIN_LSD_GAIN_IBM.items():
        m = res[name]
        assert m["finite"], name
        assert m["lsd_gain"] >= min_gain, (name, m["lsd_gain"], min_gain)
        assert m["stoi_gain"] >= -0.05, (name, m["stoi_gain"])  # proxy tripwire
        assert m["segsnr_gain"] >= 0.0, (name, m["segsnr_gain"])


# sr_delta engine quality control (round 4): same 16 kHz PSM XL config
# trained on the resident sr_delta engine vs the XLA f32 fallback — CV and
# gate numbers must stay within run noise of each other.
ART_SR_CTL = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                          "sr_delta_quality_control.json")


def test_sr_delta_quality_control_tracked():
    if not os.path.exists(ART_SR_CTL):
        pytest.skip("artifacts/sr_delta_quality_control.json not yet produced")
    d = json.load(open(ART_SR_CTL))
    cv = d["cv_final"]
    assert abs(cv["sr_delta"] - cv["xla_ctl"]) / cv["xla_ctl"] < 0.02
    for clip, g in d["gate"].items():
        assert abs(g["sr_delta"]["lsd_gain"] - g["xla_ctl"]["lsd_gain"]) < 1.0, clip
        assert abs(g["sr_delta"]["stoi_gain"] - g["xla_ctl"]["stoi_gain"]) < 0.03, clip


# Reverb dose-response winner (reverb_prob=0.25): within ~0.5 dB LSD of the
# dry flagship with all proxies positive and 4x its test3 real-world STOI —
# the recommended deployment recipe. Measured +4.56/+7.52/+4.67 dB LSD.
ART_PSM_REVERB25 = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                                "demo_gate_psm_reverb25.json")
MIN_LSD_GAIN_PSM_REVERB25 = {"test1": 3.8, "test2": 6.5, "test3": 4.0}


def test_demo_gate_psm_reverb25_tracked_thresholds():
    if not os.path.exists(ART_PSM_REVERB25):
        pytest.skip("artifacts/demo_gate_psm_reverb25.json not yet produced")
    res = json.load(open(ART_PSM_REVERB25))
    for name, min_gain in MIN_LSD_GAIN_PSM_REVERB25.items():
        m = res[name]
        assert m["finite"], name
        assert m["lsd_gain"] >= min_gain, (name, m["lsd_gain"], min_gain)
        assert m["stoi_gain"] >= 0.0, (name, m["stoi_gain"])
        assert m["segsnr_gain"] >= 0.0, (name, m["segsnr_gain"])
    assert res["test3"]["stoi_gain"] >= 0.01  # real-world robustness claim


# Flagship seed-jitter record (round 5: n=3 seeds): seed-1/2 reruns of the
# flagship protocol must stay within measured run-to-run jitter of seed 0
# and pass the same quality bars — flagship quality is recipe, not seed
# luck.  Measured max |delta| vs seed 0 over both extra seeds: 0.87 dB LSD,
# 0.013 STOI (artifacts/flagship_seed_jitter.json).
ART_JITTER = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                          "flagship_seed_jitter.json")


def test_flagship_seed_jitter_tracked():
    if not os.path.exists(ART_JITTER):
        pytest.skip("artifacts/flagship_seed_jitter.json not yet produced")
    d = json.load(open(ART_JITTER))
    assert d["max_abs_delta_vs_seed0"]["lsd_gain"] <= 1.2
    assert d["max_abs_delta_vs_seed0"]["stoi_gain"] <= 0.02
    assert all(d["all_pass"].values())
    for clip, g in d["gate"].items():
        for tag in ("seed1", "seed2"):
            assert g[tag]["lsd_gain"] >= 4.0, (clip, tag)
            assert g[tag]["stoi_gain"] >= 0.0, (clip, tag)
            assert g[tag]["segsnr_gain"] >= 0.0, (clip, tag)


# Round-5 reverb-0.25 confirmation (VERDICT r4 item 6): seed-1 rerun
# reproduces the dose-response (all proxies positive, gate pass, >=2x dry
# test3 STOI) but misses the pre-registered flip bar (within 0.5 dB LSD of
# dry on EVERY clip) by 0.65 dB on test1 -> dry stays flagship, reverb25
# stays the reverberant-conditions deployment recipe.
ART_REVERB_CONFIRM = os.path.join(os.path.dirname(__file__), "..",
                                  "artifacts", "reverb25_confirm.json")


def test_reverb25_confirmation_tracked():
    if not os.path.exists(ART_REVERB_CONFIRM):
        pytest.skip("artifacts/reverb25_confirm.json not yet produced")
    d = json.load(open(ART_REVERB_CONFIRM))
    c = d["criteria"]
    assert c["all_proxies_positive"] and c["gate_pass"]
    assert c["test3_stoi_at_least_2x_dry"]
    # the recorded decision must match the criteria outcome (no silent flip)
    assert d["confirmed"] == all(c.values())
    for clip, g in d["gate"].items():
        assert g["rv25_seed1"]["lsd_gain"] >= 4.0, clip


# Round-5 16 kHz head fusion (VERDICT r4 item 5): the convex blend must
# dominate BOTH single models on held-out LSD at the swept weight, and the
# fused demo gate must pass; the tracked 16 kHz slot stays PSM because the
# fusion does not clear the proxy-gate flip bar (documented negative,
# BASELINE.md r5).
ART_FUSION_16K = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                              "fusion_sweep_16k.json")
ART_FUSION_8K = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                             "fusion_sweep_8k.json")


@pytest.mark.parametrize("art", [ART_FUSION_16K, ART_FUSION_8K])
def test_fusion_sweep_tracked(art):
    if not os.path.exists(art):
        pytest.skip(f"{os.path.basename(art)} not yet produced")
    d = json.load(open(art))
    rows = {r["alpha"]: r for r in d["table"]}
    assert 0.0 in rows and 1.0 in rows
    best = d["best"]
    assert 0.0 < best["alpha"] < 1.0  # an interior blend wins
    assert best["score"] >= rows[0.0]["score"] + 0.4
    assert best["score"] >= rows[1.0]["score"] + 0.4
    # held-out LSD also peaks at an interior blend
    best_lsd = max(d["table"], key=lambda r: r["lsd_gain"])
    assert 0.0 < best_lsd["alpha"] < 1.0
    assert best_lsd["lsd_gain"] >= max(rows[0.0]["lsd_gain"],
                                       rows[1.0]["lsd_gain"])
    gate = d.get("gate") or {}
    assert gate.get("pass") is True


# Round-5 16 kHz unseen-family robustness (eval-only on the tracked PSM XL;
# benchmarks/run_unseen_noise_16k.py).  Thresholds encode the measured
# finding: every unseen family positive on STOI/SegSNR/PESQ; LSD positive on
# all but the low-frequency-dominated families (traffic/car), where heavy
# rumble suppression trades spectral fidelity for the strongest perceptual
# gains of the set.
ART_UNSEEN_16K = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                              "unseen_noise_16k.json")


def test_unseen_noise_16k_tracked():
    if not os.path.exists(ART_UNSEEN_16K):
        pytest.skip("artifacts/unseen_noise_16k.json not yet produced")
    gen = json.load(open(ART_UNSEEN_16K))["noise_generalization"]
    unseen = {k: v for k, v in gen["per_kind"].items() if not v["seen"]}
    assert len(unseen) >= 8
    for kind, v in unseen.items():
        assert v["stoi_gain"] >= 0.0, kind
        assert v["segsnr_gain"] >= 0.0, kind
        assert v["pesq_gain"] >= 0.0, kind
    lsd_positive = [k for k, v in unseen.items() if v["lsd_gain"] > 0.0]
    assert len(lsd_positive) >= 6
    assert gen["unseen"]["lsd_gain"] >= 4.0
    assert gen["unseen"]["stoi_gain"] >= 0.03
