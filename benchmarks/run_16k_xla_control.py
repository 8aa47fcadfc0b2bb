"""sr_delta quality control: the EXACT stage-B 16 kHz PSM XL config retrained
on the XLA fallback engine (f32 momentum; TPU_SEDNN_NO_SR_FALLBACK=1), same
seed/corpus/schedule/sweep.  Comparing CV curves and gate numbers against
artifacts/mc_full_psm_16k_xl isolates the ENGINE (bf16-SR momentum + hw-PRNG
masks vs f32 momentum + threefry masks) as the only variable — the
head-to-head certification for round 4's resident-degrade feature.

Writes artifacts/mc_full_psm_16k_xla_ctl/ + artifacts/sr_delta_quality_control.json.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ["TPU_SEDNN_NO_SR_FALLBACK"] = "1"  # force the XLA fallback
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

    out_dir = os.path.join(ART, "mc_full_psm_16k_xla_ctl")
    mc = MultiConditionConfig(
        out_dir=out_dir,
        sample_rate=16000, head="psm",
        n_utts=2000, variants=2, n_epochs=22,
        hidden=(2048, 2048, 2048),
        snrs=(-5.0, 0.0, 5.0, 10.0, 15.0, 20.0),
        noise_kinds=NOISE_KINDS, ckpt_every=8,
    )
    res = run_multi_condition(mc)
    print(f"[ctl] trained in {time.time() - t0:.0f}s cv={res['cv_hist'][-1]:.4f}",
          flush=True)
    sweep_run_dir(out_dir, grid="full")
    dg.main([out_dir])
    ctl = json.load(open(os.path.join(out_dir, "demo_gate.json")))
    sr = json.load(open(os.path.join(ART, "mc_full_psm_16k_xl", "demo_gate.json")))
    sr_res = json.load(open(os.path.join(ART, "mc_full_psm_16k_xl", "results.json")))
    cmp = {
        "config": "16 kHz PSM XL (2000x2, 22 epochs), identical seed/corpus/schedule/sweep",
        "engines": {"sr_delta": "resident, bf16 momentum + hw-PRNG SR + in-kernel masks",
                     "xla_ctl": "XLA fallback, f32 momentum, threefry masks"},
        "cv_final": {"sr_delta": sr_res["cv_hist"][-1], "xla_ctl": res["cv_hist"][-1]},
        "gate": {
            clip: {
                "sr_delta": {k: round(sr[clip][k], 4) for k in
                             ("lsd_gain", "stoi_gain", "segsnr_gain", "pesq_gain")},
                "xla_ctl": {k: round(ctl[clip][k], 4) for k in
                            ("lsd_gain", "stoi_gain", "segsnr_gain", "pesq_gain")},
            } for clip in ("test1", "test2", "test3")
        },
    }
    json.dump(cmp, open(os.path.join(ART, "sr_delta_quality_control.json"), "w"),
              indent=2)
    print(f"[ctl] comparison: {json.dumps(cmp['cv_final'])}", flush=True)
    for clip in ("test1", "test2", "test3"):
        print(f"[ctl] {clip}: sr={cmp['gate'][clip]['sr_delta']} "
              f"xla={cmp['gate'][clip]['xla_ctl']}", flush=True)
    print(f"[ctl] done in {time.time() - t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
