"""One-process TPU driver for the round's expensive runs, in order:

1. full multi-condition training (canonical 2048x3 net) -> artifacts/mc_full_r2
   + demo-clip quality gate (demo_gate.json copied to artifacts/)
2. canonical-scale pfile epoch benchmark (~1.05M samples, resident engine)
3. bench.py main benchmark (imported, same process)

One process so nothing fights over the single TPU and compiled programs are
reused; run it in the background with a generous timeout — NEVER kill it
mid-compile (an orphaned remote compile can wedge the relay for a long time).
"""

import json
import os
import shutil
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    t0 = time.time()

    # ---- 1. full multi-condition training + demo gate ----
    from tpu_sednn.data.mixing import NOISE_KINDS
    from tpu_sednn.recipes.multi_condition import (
        MultiConditionConfig, run_multi_condition,
    )

    out_dir = os.path.join(REPO, "artifacts", "mc_full_r2")
    mc = MultiConditionConfig(
        out_dir=out_dir,
        n_utts=800,     # distinct synthetic "speakers"
        variants=2,     # noise x SNR conditions per clean utterance
        n_epochs=18,
        hidden=(2048, 2048, 2048),
        snrs=(-5.0, 0.0, 5.0, 10.0, 15.0, 20.0),
        noise_kinds=NOISE_KINDS,
        ckpt_every=6,
    )
    res = run_multi_condition(mc)
    print(f"[round] mc_full_r2 done in {time.time() - t0:.0f}s; "
          f"cv={res['cv_hist'][-1]:.3f}", flush=True)
    shutil.copy(os.path.join(out_dir, "demo_gate.json"),
                os.path.join(REPO, "artifacts", "demo_gate.json"))

    # ---- 2. canonical pfile epoch ----
    t1 = time.time()
    from benchmarks.canonical_pfile_epoch import main as pfile_main

    pfile_main(["--frames", "1050000"])
    print(f"[round] pfile epoch done in {time.time() - t1:.0f}s", flush=True)

    # ---- 3. main bench ----
    t2 = time.time()
    import bench

    sys.argv = ["bench.py"]
    bench.main()
    print(f"[round] bench done in {time.time() - t2:.0f}s; "
          f"total {time.time() - t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
