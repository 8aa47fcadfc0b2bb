"""Full-scale IRM mask-head training + demo gate — the Interspeech'15
variant the reference trains via a mask target pfile
(finetune_...NAT.pl:50 "estIBM_refCLEAN_LC5dB"): same trainer, sigmoid
output head, IRM targets, mask-floor post-processing at decode.

One process, one TPU; run in the background with a generous timeout.
"""

import os
import shutil
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    t0 = time.time()
    from tpu_sednn.data.mixing import NOISE_KINDS
    from tpu_sednn.recipes.multi_condition import (
        MultiConditionConfig, run_multi_condition,
    )

    out_dir = os.path.join(REPO, "artifacts", "mc_full_irm")
    mc = MultiConditionConfig(
        out_dir=out_dir,
        head="irm",
        n_utts=800,
        variants=2,
        n_epochs=18,
        hidden=(2048, 2048, 2048),
        snrs=(-5.0, 0.0, 5.0, 10.0, 15.0, 20.0),
        noise_kinds=NOISE_KINDS,
        ckpt_every=6,
    )
    res = run_multi_condition(mc)
    print(f"[irm] done in {time.time() - t0:.0f}s; cv={res['cv_hist'][-1]:.4f}",
          flush=True)
    shutil.copy(os.path.join(out_dir, "demo_gate.json"),
                os.path.join(REPO, "artifacts", "demo_gate_irm.json"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
