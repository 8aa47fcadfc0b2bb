"""Held-out decode-parameter sweep (ADVICE r2: never tune on the gate clips)."""

import json
import os

import numpy as np
import jax
import pytest

from tpu_sednn.dsp import StftConfig
from tpu_sednn.enhance.decode import EnhanceConfig
from tpu_sednn.model import ModelConfig, init_params
from tpu_sednn.recipes.val_sweep import (
    VAL_SEED, make_val_clips, sweep_decode_params,
)


def test_val_clips_are_heldout_and_paired():
    clips = make_val_clips(8000, n_clips=4, seconds=1.0)
    assert len(clips) == 4
    for clean, noisy in clips:
        assert clean.shape == noisy.shape
        assert np.isfinite(clean).all() and np.isfinite(noisy).all()
        # genuinely noisy: the pair differs substantially
        assert np.abs(clean - noisy).max() > 1e-3
    # seed is pinned and disjoint from recipe seeds (0..~100 range)
    assert VAL_SEED > 10000


def test_sweep_picks_stoi_safe_candidate():
    stft = StftConfig.for_rate(8000)
    d = stft.n_bins
    cfg = ModelConfig(layersizes=(d * 3 + d, 32, d), output="sigmoid")
    params = init_params(jax.random.key(0), cfg, scheme="glorot")
    ecfg = EnhanceConfig(stft=stft, fea_context=3, targ_offset=1, nat=True,
                         head="irm")
    clips = make_val_clips(8000, n_clips=2, seconds=1.0)
    res = sweep_decode_params(params, cfg, ecfg, clips,
                              np.zeros(d, np.float32), np.ones(d, np.float32),
                              grid="small")
    assert "best" in res and len(res["table"]) >= 3
    best = res["best"]
    ok = [r for r in res["table"] if r["stoi_gain"] >= 0.0]
    if ok:  # constraint honored when satisfiable; winner = max combined score
        assert best["stoi_gain"] >= 0.0
        assert best["score"] == max(r["score"] for r in ok)
