"""Full-band 16 kHz multi-condition training + demo gate.

The reference demo clips (enh_wav_example/*.wav) are 16 kHz; the canonical
129-bin recipe works at 8 kHz (Xu et al. SPL'14 resampled to 8 kHz), so the
8 kHz gate downsamples them.  This run trains the 257-bin / 16 kHz full-band
variant (StftConfig.for_rate(16000): 512-win/256-shift; layersizes
3084-2048x3-257) and gates the clips at their NATIVE rate — covering the
4-8 kHz band the 8 kHz model cannot reconstruct.

One process, one TPU; run in the background with a generous timeout.
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
    from tpu_sednn.data.mixing import NOISE_KINDS
    from tpu_sednn.recipes.multi_condition import (
        MultiConditionConfig, run_multi_condition,
    )

    out_dir = os.path.join(REPO, "artifacts", "mc_full_16k")
    mc = MultiConditionConfig(
        out_dir=out_dir,
        sample_rate=16000,
        n_utts=800,
        variants=2,
        n_epochs=18,
        hidden=(2048, 2048, 2048),
        snrs=(-5.0, 0.0, 5.0, 10.0, 15.0, 20.0),
        noise_kinds=NOISE_KINDS,
        ckpt_every=6,
    )
    res = run_multi_condition(mc)
    print(f"[16k] done in {time.time() - t0:.0f}s; cv={res['cv_hist'][-1]:.3f}",
          flush=True)
    shutil.copy(os.path.join(out_dir, "demo_gate.json"),
                os.path.join(REPO, "artifacts", "demo_gate_16k.json"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
