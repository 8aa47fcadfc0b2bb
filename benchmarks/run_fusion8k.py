"""8 kHz head-fusion experiment (round-5 stretch).

The 8 kHz gate shows the same complementary split as 16 kHz: the lps head
leads LSD on test3 (+7.8 vs PSM's +5.0) while the PSM flagship leads the
perceptual proxies.  The round-2 lps model's weights were purged, so:

1. retrain the EXACT round-2 lps protocol (800x2 utts, 18 epochs, all 7
   families; benchmarks/run_tpu_round.py config with head pinned to "lps" —
   the config default has since flipped to psm) -> artifacts/mc_full_lps_r5;
2. val-sweep + demo gate for the retrain;
3. fusion sweep vs the PSM flagship (artifacts/mc_full_psm) on held-out
   clips + fused demo gate -> artifacts/fusion_sweep_8k.json /
   demo_gate_fusion_8k.json.

Flip bar (same as 16 kHz): fused gate must be >= the PSM flagship on every
metric family to contest the tracked slot; else a documented result.
"""

import json
import os
import shutil
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
ART = os.path.join(REPO, "artifacts")

import importlib
import pkgutil

import tpu_sednn

for _m in pkgutil.walk_packages(tpu_sednn.__path__, "tpu_sednn."):
    try:
        importlib.import_module(_m.name)
    except Exception as e:  # pragma: no cover
        print(f"[preimport] {_m.name}: {e}", flush=True)


def main() -> int:
    t0 = time.time()
    from tpu_sednn.data.mixing import NOISE_KINDS
    from tpu_sednn.recipes import demo_gate as dg
    from tpu_sednn.recipes import fusion_sweep
    from tpu_sednn.recipes.multi_condition import (
        MultiConditionConfig, run_multi_condition)
    from tpu_sednn.recipes.val_sweep import sweep_run_dir

    out_dir = os.path.join(ART, "mc_full_lps_r5")
    # resume keys on the LAST artifact the block writes (the copied gate),
    # so a run that died between train and sweep/gate re-runs the whole
    # block instead of silently proceeding with unswept decode params
    if not os.path.exists(os.path.join(ART, "demo_gate_lps_r5.json")):
        mc = MultiConditionConfig(
            out_dir=out_dir, head="lps",
            n_utts=800, variants=2, n_epochs=18,
            hidden=(2048, 2048, 2048),
            snrs=(-5.0, 0.0, 5.0, 10.0, 15.0, 20.0),
            noise_kinds=NOISE_KINDS, ckpt_every=6,
        )
        res = run_multi_condition(mc)
        print(f"[f8k] lps retrain {time.time() - t0:.0f}s "
              f"cv={res['cv_hist'][-1]:.3f}", flush=True)
        sweep_run_dir(out_dir, grid="full")
        dg.main([out_dir])
        shutil.copy(os.path.join(out_dir, "demo_gate.json"),
                    os.path.join(ART, "demo_gate_lps_r5.json"))

    rc = fusion_sweep.main([
        os.path.join(ART, "mc_full_psm"), out_dir,
        "--out", os.path.join(ART, "fusion_sweep_8k.json"),
        "--gate", os.path.join(ART, "demo_gate_fusion_8k.json"),
        "--alphas", "0,0.2,0.35,0.5,0.65,0.8,1",
    ])
    print(f"[f8k] fusion rc={rc} total {time.time() - t0:.0f}s", flush=True)

    # flip-bar comparison vs the tracked PSM flagship gate
    psm = json.load(open(os.path.join(ART, "demo_gate_psm.json")))
    fus = json.load(open(os.path.join(ART, "demo_gate_fusion_8k.json")))
    clips = ("test1", "test2", "test3")
    keys = ("lsd_gain", "stoi_gain", "segsnr_gain", "pesq_gain")
    dominates = all(fus[c][k] >= psm[c][k] - 1e-9 for c in clips for k in keys)
    summary = {
        "dominates_psm_flagship_on_gate": bool(dominates),
        "gate": {c: {"psm": {k: round(psm[c][k], 4) for k in keys},
                     "fusion": {k: round(fus[c][k], 4) for k in keys}}
                 for c in clips},
    }
    json.dump(summary, open(os.path.join(ART, "fusion8k_vs_flagship.json"),
                            "w"), indent=2)
    print(json.dumps(summary["gate"], indent=1))
    print(f"[f8k] dominates flagship: {dominates}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
