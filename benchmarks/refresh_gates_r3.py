"""Re-select decode params with the combined (LSD + 50*STOI) held-out
objective and re-score the demo gates for every tracked run dir.

The first round-3 sweep maximized LSD alone, which picked unbounded
suppression — strong on in-domain held-out clips, brittle on the real
out-of-distribution gate recordings (the 16 kHz gate regressed).  The
combined objective keeps bounded-suppression candidates competitive while
still being chosen purely on held-out data.
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

from tpu_sednn.recipes import demo_gate as dg
from tpu_sednn.recipes.val_sweep import sweep_run_dir


def main():
    jobs = [
        ("mc_full_irm_r3", os.path.join(ART, "demo_gate_irm.json")),
        ("mc_full_r2", os.path.join(ART, "demo_gate.json")),
        ("mc_full_16k", os.path.join(ART, "demo_gate_16k.json")),
        ("recipe_full", None),
    ]
    for name, copy_to in jobs:
        run_dir = os.path.join(ART, name)
        if not os.path.exists(os.path.join(run_dir, "mlp.final.wts")):
            print(f"[skip] {name}", flush=True)
            continue
        t0 = time.time()
        res = sweep_run_dir(run_dir, grid="full")
        print(f"[{name}] best={res['best']} ({time.time() - t0:.0f}s)",
              flush=True)
        dg.main([run_dir])
        gate = json.load(open(os.path.join(run_dir, "demo_gate.json")))
        if copy_to:
            shutil.copy(os.path.join(run_dir, "demo_gate.json"), copy_to)
        summ = {k: (round(v["lsd_gain"], 2), round(v["stoi_gain"], 4))
                for k, v in gate.items() if isinstance(v, dict)}
        print(f"[{name}] gate pass={gate.get('pass')} {summ}", flush=True)


if __name__ == "__main__":
    main()
