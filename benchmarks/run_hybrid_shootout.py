"""Post-round A/B: sr_delta vs f32-hybrid (prefetch) 16 kHz, alternating.

The round-5 main run measured the SERIAL-DMA hybrid at 0.79 ms cold /
0.138 ms warm — a suspicious cold-relay artifact.  This remeasures the
PREFETCH hybrid and sr_delta back-to-back, alternating twice each at
reps=20, so relay drift cannot masquerade as an engine difference.

Writes artifacts/kernel_bench_r5_ab.json.  Run ONLY when no other process
holds the chip.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import bench as bench_mod

    seq = [("sr_delta", {"sr_delta": True}), ("hybrid", {"hbm_spill": 1}),
           ("sr_delta", {"sr_delta": True}), ("hybrid", {"hbm_spill": 1}),
           ("xla", None)]
    out = {"order": [], "runs": {}}
    for tag, kw in seq:
        engine = "xla" if tag == "xla" else "resident"
        t0 = time.time()
        r = bench_mod.bench_train_16k(reps=20, engine=engine, engine_kwargs=kw)
        r["wall_s"] = round(time.time() - t0, 1)
        out["order"].append(tag)
        out["runs"].setdefault(tag, []).append(r)
        print(f"[ab] {tag}: {r['step_ms']:.4f} ms/bunch mfu={r['mfu']:.3f} "
              f"(wall {r['wall_s']}s)", flush=True)
    for tag, runs in out["runs"].items():
        best = min(x["step_ms"] for x in runs)
        out[f"{tag}_best_step_ms"] = round(best, 4)
    json.dump(out, open(os.path.join(REPO, "artifacts",
                                     "kernel_bench_r5_ab.json"), "w"), indent=2)
    print(json.dumps({k: v for k, v in out.items() if k.endswith("step_ms")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
