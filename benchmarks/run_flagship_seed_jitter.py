"""Training-jitter probe: the EXACT dry PSM flagship protocol rerun with
seed=1 (corpus, init, and dropout streams all reseeded).  The spread vs the
tracked seed-0 flagship quantifies run-to-run gate jitter — the margin every
tracked threshold in tests/test_demo_gate.py is supposed to cover.

Writes artifacts/mc_full_psm_seed1/ + artifacts/flagship_seed_jitter.json.
"""

import json
import os
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

    out_dir = os.path.join(ART, "mc_full_psm_seed1")
    mc = MultiConditionConfig(
        out_dir=out_dir, head="psm", seed=1,
        n_utts=2000, variants=2, n_epochs=22,
        hidden=(2048, 2048, 2048),
        snrs=(-5.0, 0.0, 5.0, 10.0, 15.0, 20.0),
        noise_kinds=NOISE_KINDS, ckpt_every=8,
    )
    res = run_multi_condition(mc)
    print(f"[jit] trained in {time.time() - t0:.0f}s "
          f"cv={res['cv_hist'][-1]:.4f}", flush=True)
    sweep_run_dir(out_dir, grid="full")
    dg.main([out_dir])
    s1 = json.load(open(os.path.join(out_dir, "demo_gate.json")))
    s0 = json.load(open(os.path.join(ART, "demo_gate_psm.json")))
    keys = ("lsd_gain", "stoi_gain", "segsnr_gain", "pesq_gain")
    cmp = {
        "protocol": "dry PSM flagship (2000x2, 22 epochs) at seed 0 vs seed 1",
        "gate": {c: {"seed0": {k: round(s0[c][k], 4) for k in keys},
                     "seed1": {k: round(s1[c][k], 4) for k in keys},
                     "delta": {k: round(s1[c][k] - s0[c][k], 4) for k in keys}}
                 for c in ("test1", "test2", "test3")},
        "max_abs_delta": {k: round(max(abs(s1[c][k] - s0[c][k])
                                       for c in ("test1", "test2", "test3")), 4)
                          for k in keys},
    }
    json.dump(cmp, open(os.path.join(ART, "flagship_seed_jitter.json"), "w"),
              indent=2)
    print(f"[jit] max_abs_delta={cmp['max_abs_delta']} "
          f"(total {time.time() - t0:.0f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
