"""Unseen-noise generalization at 16 kHz (round-5 breadth extension).

The widened protocol's main table is 8 kHz (the flagship rate).  This
re-scores the TRACKED 16 kHz model (artifacts/mc_full_psm_16k_xl, trained
round 4 on ALL seven original families) under the eight round-5 families it
has never seen — generalization evidence at the reference demo clips'
native rate.  Eval-only; no retraining.

Writes artifacts/unseen_noise_16k.json.

Run:  python benchmarks/run_unseen_noise_16k.py [--cpu]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
ART = os.path.join(REPO, "artifacts")
RUN_DIR = os.path.join(ART, "mc_full_psm_16k_xl")


def main() -> int:
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    t0 = time.time()
    from tpu_sednn.data.mixing import EXTRA_UNSEEN_NOISE_KINDS, NOISE_KINDS
    from tpu_sednn.recipes.artifact import load_run_dir
    from tpu_sednn.recipes.multi_condition import (
        MultiConditionConfig, _noise_generalization_eval)
    from tpu_sednn.utils.logging import Logger

    params, mcfg, ecfg, mean, inv_std, tn, gv = load_run_dir(RUN_DIR)
    assert ecfg.stft.sample_rate == 16000 and ecfg.head == "psm"

    mc = MultiConditionConfig(
        out_dir=RUN_DIR, seed=0, sample_rate=16000,
        noise_kinds=NOISE_KINDS,                 # all 7 were TRAINED on
        eval_noise_kinds=EXTRA_UNSEEN_NOISE_KINDS,  # the 8 r5 families
    )
    gen = _noise_generalization_eval(params, mcfg, ecfg, mean, inv_std,
                                     tn, gv, mc, Logger())
    out = {
        "protocol": {
            "model": "artifacts/mc_full_psm_16k_xl (round-4 weights; "
                     "trained on all 7 original families at 16 kHz)",
            "train_noise_kinds": list(NOISE_KINDS),
            "unseen_noise_kinds": list(EXTRA_UNSEEN_NOISE_KINDS),
            "note": "eval-only; decode = the val-sweep-frozen run.json params",
        },
        "noise_generalization": gen,
        "eval_seconds": round(time.time() - t0, 1),
    }
    path = os.path.join(ART, "unseen_noise_16k.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path} in {out['eval_seconds']}s")
    print(json.dumps({"gap": gen.get("gap"), "unseen": gen.get("unseen")},
                     indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
