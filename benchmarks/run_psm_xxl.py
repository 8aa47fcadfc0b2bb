"""PSM flagship scale-up: 3200 utts x 2 variants (1.6x the flagship
corpus), 24 recipe epochs, held-out decode sweep, demo gate.

Writes artifacts/mc_full_psm_xxl/ and artifacts/demo_gate_psm_xxl.json; the
tracked artifacts/demo_gate_psm.json is only replaced by hand if this run
dominates the current PSM flagship.
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

    out_dir = os.path.join(ART, "mc_full_psm_xxl")
    mc = MultiConditionConfig(
        out_dir=out_dir,
        head="psm",
        n_utts=3200,
        variants=2,
        n_epochs=24,
        hidden=(2048, 2048, 2048),
        snrs=(-5.0, 0.0, 5.0, 10.0, 15.0, 20.0),
        noise_kinds=NOISE_KINDS,
        ckpt_every=8,
    )
    res = run_multi_condition(mc)
    print(f"[psmxxl] trained in {time.time() - t0:.0f}s cv={res['cv_hist'][-1]:.4f}",
          flush=True)
    sw = sweep_run_dir(out_dir, grid="full")
    print(f"[psmxxl] sweep best={sw['best']}", flush=True)
    dg.main([out_dir])
    shutil.copy(os.path.join(out_dir, "demo_gate.json"),
                os.path.join(ART, "demo_gate_psm_xxl.json"))
    gate = json.load(open(os.path.join(out_dir, "demo_gate.json")))
    summ = {k: (round(v["lsd_gain"], 2), round(v["stoi_gain"], 4),
                round(v["segsnr_gain"], 2))
            for k, v in gate.items() if isinstance(v, dict)}
    print(f"[psmxxl] gate pass={gate.get('pass')} {summ} "
          f"(total {time.time() - t0:.0f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
