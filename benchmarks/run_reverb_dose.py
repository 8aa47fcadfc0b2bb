"""Reverb dose-response probe: flagship PSM protocol at reverb_prob=0.25
(stage E used 0.5 — it matched the dry flagship on dry conditions and 4x'd
the real-world clip's proxy STOI, but conceded ~1.8 dB t1 LSD).  A milder
dose may interpolate: keep most of the dry LSD while retaining the test3
robustness.  Win => flagship candidate; else the dose-response is recorded.

Writes artifacts/mc_full_psm_reverb25/ + artifacts/demo_gate_psm_reverb25.json.
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

for m in pkgutil.walk_packages(tpu_sednn.__path__, "tpu_sednn."):
    try:
        importlib.import_module(m.name)
    except Exception as e:  # pragma: no cover
        print(f"[preimport] {m.name}: {e}", flush=True)


def main() -> int:
    t0 = time.time()
    from tpu_sednn.data.mixing import NOISE_KINDS
    from tpu_sednn.recipes import demo_gate as dg
    from tpu_sednn.recipes.multi_condition import (
        MultiConditionConfig, run_multi_condition,
    )
    from tpu_sednn.recipes.val_sweep import sweep_run_dir

    out_dir = os.path.join(ART, "mc_full_psm_reverb25")
    mc = MultiConditionConfig(
        out_dir=out_dir, head="psm",
        n_utts=2000, variants=2, n_epochs=22,
        hidden=(2048, 2048, 2048),
        snrs=(-5.0, 0.0, 5.0, 10.0, 15.0, 20.0),
        noise_kinds=NOISE_KINDS, reverb_prob=0.25, ckpt_every=8,
    )
    res = run_multi_condition(mc)
    print(f"[rv25] trained in {time.time() - t0:.0f}s "
          f"cv={res['cv_hist'][-1]:.4f}", flush=True)
    sweep_run_dir(out_dir, grid="full")
    dg.main([out_dir])
    shutil.copy(os.path.join(out_dir, "demo_gate.json"),
                os.path.join(ART, "demo_gate_psm_reverb25.json"))
    gate = json.load(open(os.path.join(out_dir, "demo_gate.json")))
    summ = {k: (round(v["lsd_gain"], 2), round(v["stoi_gain"], 4),
                round(v["segsnr_gain"], 2))
            for k, v in gate.items() if isinstance(v, dict)}
    print(f"[rv25] gate pass={gate.get('pass')} {summ} "
          f"(total {time.time() - t0:.0f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
