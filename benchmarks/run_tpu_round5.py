"""Round-5 consolidated TPU run — ONE process holds the chip throughout.

Stages (selectable: python benchmarks/run_tpu_round5.py [stage ...]):

  kernel  16 kHz engine shoot-out: f32 hybrid residency (hbm_spill=1, NEW)
          vs sr_delta vs sr_state vs the XLA fallback — VERDICT r4 item 3.
          Decides the auto-engine degrade order with on-chip numbers.
  lps16k  retrain the 16 kHz lps head (its round-3 weights were purged) into
          artifacts/mc_full_16k_r5 + val sweep + demo gate — the fusion
          stage needs both 16 kHz models' weights.
  fusion  head-fusion blend sweep (PSM 16k XL x lps 16k) on held-out clips
          + fused demo gate — VERDICT r4 item 5.
  seed2   third flagship seed (dry PSM 2000x2/22ep, seed=2); extends
          artifacts/flagship_seed_jitter.json to n=3 — VERDICT r4 item 8.
  reverb  reverb_prob=0.25 confirmation run at seed=1; records the
          flagship-flip decision — VERDICT r4 item 6.
  unseen  refresh the widened 15-family unseen-noise artifact on chip.
  scale   reference-scale pfile epoch: ~10.6 M-frame corpus (~57k utts,
          ~11 GB pfiles), 3 CLI epochs on the resident engine — VERDICT r4
          item 2.  Artifact: artifacts/pfile_epoch_scale.json.
  bench   smoke python bench.py and assert the emitted line parses and fits
          the driver's 2000-char capture window.

Run it in ONE background process with a generous timeout (CLAUDE.md: never
kill a TPU process mid-compile).
"""

from __future__ import annotations

import json
import os
import shutil

import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
ART = os.path.join(REPO, "artifacts")

# Pre-import the whole package: NEVER let a lazily-imported module load a
# NEWER file than its already-imported siblings mid-run (CLAUDE.md: an
# ImportError killed a round-4 run this way).  Guarded against multiprocessing
# SPAWN children (stage_scale's synthesis pool re-imports this module as
# __mp_main__): the workers need only numpy+mixing, and an import that ever
# touched the device would deadlock on the TPU futex the parent holds.
if __name__ != "__mp_main__":
    import importlib
    import pkgutil

    import tpu_sednn

    for _m in pkgutil.walk_packages(tpu_sednn.__path__, "tpu_sednn."):
        try:
            importlib.import_module(_m.name)
        except Exception as e:  # pragma: no cover
            print(f"[preimport] {_m.name}: {e}", flush=True)


def log(msg: str) -> None:
    print(f"[r5 {time.strftime('%H:%M:%S')}] {msg}", flush=True)


# --------------------------------------------------------------------------
def stage_kernel() -> None:
    """16 kHz training-engine shoot-out on the real chip."""
    sys.path.insert(0, REPO)
    import bench as bench_mod

    out = {}
    modes = [
        ("hybrid_spill1", "resident", {"hbm_spill": 1}),
        ("sr_delta", "resident", {"sr_delta": True}),
        ("xla", "xla", {}),
        ("auto", "auto", None),
    ]
    for tag, engine, kw in modes:
        t0 = time.time()
        try:
            r = bench_mod.bench_train_16k(reps=10, engine=engine,
                                          engine_kwargs=kw)
            r["compile_plus_run_s"] = round(time.time() - t0, 1)
            out[tag] = r
            log(f"kernel 16k {tag}: {r['step_ms']:.4f} ms/bunch "
                f"mfu={r['mfu']:.3f} engine={r['engine']} {r['engine_kwargs']}")
        except Exception as e:
            out[tag] = {"error": f"{type(e).__name__}: {e}"}
            log(f"kernel 16k {tag} FAILED: {type(e).__name__}: {e}")
    json.dump(out, open(os.path.join(ART, "kernel_bench_r5.json"), "w"),
              indent=2)
    log(f"kernel: wrote kernel_bench_r5.json")


# --------------------------------------------------------------------------
def stage_lps16k() -> None:
    from tpu_sednn.data.mixing import NOISE_KINDS
    from tpu_sednn.recipes import demo_gate as dg
    from tpu_sednn.recipes.multi_condition import (
        MultiConditionConfig, run_multi_condition)
    from tpu_sednn.recipes.val_sweep import sweep_run_dir

    out_dir = os.path.join(ART, "mc_full_16k_r5")
    # the EXACT round-3 lps-16k protocol (benchmarks/run_16k_full.py) whose
    # final weights were purged; head/gv/target_norm as that run froze them
    mc = MultiConditionConfig(
        out_dir=out_dir, sample_rate=16000, head="lps",
        n_utts=800, variants=2, n_epochs=18,
        hidden=(2048, 2048, 2048),
        snrs=(-5.0, 0.0, 5.0, 10.0, 15.0, 20.0),
        noise_kinds=NOISE_KINDS, ckpt_every=6,
    )
    t0 = time.time()
    res = run_multi_condition(mc)
    log(f"lps16k: trained in {time.time() - t0:.0f}s "
        f"cv={res['cv_hist'][-1]:.3f}")
    sweep_run_dir(out_dir, grid="full")
    dg.main([out_dir])
    shutil.copy(os.path.join(out_dir, "demo_gate.json"),
                os.path.join(ART, "demo_gate_16k_r5.json"))
    gate = json.load(open(os.path.join(out_dir, "demo_gate.json")))
    log(f"lps16k: gate pass={gate.get('pass')}")


# --------------------------------------------------------------------------
def stage_fusion() -> None:
    from tpu_sednn.recipes import fusion_sweep

    run_a = os.path.join(ART, "mc_full_psm_16k_xl")   # perceptual-proxy winner
    run_b = os.path.join(ART, "mc_full_16k_r5")        # LSD winner (lps)
    if not os.path.exists(os.path.join(run_b, "mlp.final.wts")):
        log("fusion: SKIPPED (lps16k weights missing — run stage lps16k)")
        return
    rc = fusion_sweep.main([
        run_a, run_b,
        "--out", os.path.join(ART, "fusion_sweep_16k.json"),
        "--gate", os.path.join(ART, "demo_gate_fusion_16k.json"),
        "--alphas", "0,0.2,0.35,0.5,0.65,0.8,1",
    ])
    log(f"fusion: rc={rc}")


# --------------------------------------------------------------------------
def stage_seed2() -> None:
    from tpu_sednn.data.mixing import NOISE_KINDS
    from tpu_sednn.recipes import demo_gate as dg
    from tpu_sednn.recipes.multi_condition import (
        MultiConditionConfig, run_multi_condition)
    from tpu_sednn.recipes.val_sweep import sweep_run_dir

    out_dir = os.path.join(ART, "mc_full_psm_seed2")
    mc = MultiConditionConfig(
        out_dir=out_dir, head="psm", seed=2,
        n_utts=2000, variants=2, n_epochs=22,
        hidden=(2048, 2048, 2048),
        snrs=(-5.0, 0.0, 5.0, 10.0, 15.0, 20.0),
        noise_kinds=NOISE_KINDS, ckpt_every=8,
    )
    t0 = time.time()
    res = run_multi_condition(mc)
    log(f"seed2: trained in {time.time() - t0:.0f}s cv={res['cv_hist'][-1]:.4f}")
    sweep_run_dir(out_dir, grid="full")
    dg.main([out_dir])

    keys = ("lsd_gain", "stoi_gain", "segsnr_gain", "pesq_gain")
    clips = ("test1", "test2", "test3")
    s0 = json.load(open(os.path.join(ART, "demo_gate_psm.json")))
    s1 = json.load(open(os.path.join(ART, "mc_full_psm_seed1", "demo_gate.json")))
    s2 = json.load(open(os.path.join(out_dir, "demo_gate.json")))
    seeds = {"seed0": s0, "seed1": s1, "seed2": s2}
    cmp = {
        "protocol": "dry PSM flagship (2000x2, 22 epochs), seeds 0/1/2 "
                    "(round-5 extends the n=2 round-4 probe to n=3)",
        "gate": {c: {tag: {k: round(s[c][k], 4) for k in keys}
                     for tag, s in seeds.items()}
                 for c in clips},
        "max_abs_delta_vs_seed0": {
            k: round(max(abs(seeds[t][c][k] - s0[c][k])
                         for c in clips for t in ("seed1", "seed2")), 4)
            for k in keys},
        "all_pass": {t: bool(s.get("pass")) for t, s in seeds.items()},
    }
    json.dump(cmp, open(os.path.join(ART, "flagship_seed_jitter.json"), "w"),
              indent=2)
    log(f"seed2: max_abs_delta_vs_seed0={cmp['max_abs_delta_vs_seed0']} "
        f"all_pass={cmp['all_pass']}")


# --------------------------------------------------------------------------
def stage_reverb() -> None:
    from tpu_sednn.data.mixing import NOISE_KINDS
    from tpu_sednn.recipes import demo_gate as dg
    from tpu_sednn.recipes.multi_condition import (
        MultiConditionConfig, run_multi_condition)
    from tpu_sednn.recipes.val_sweep import sweep_run_dir

    out_dir = os.path.join(ART, "mc_full_psm_reverb25_s1")
    mc = MultiConditionConfig(
        out_dir=out_dir, head="psm", seed=1,
        n_utts=2000, variants=2, n_epochs=22,
        hidden=(2048, 2048, 2048),
        snrs=(-5.0, 0.0, 5.0, 10.0, 15.0, 20.0),
        noise_kinds=NOISE_KINDS, reverb_prob=0.25, ckpt_every=8,
    )
    t0 = time.time()
    res = run_multi_condition(mc)
    log(f"reverb: trained in {time.time() - t0:.0f}s cv={res['cv_hist'][-1]:.4f}")
    sweep_run_dir(out_dir, grid="full")
    dg.main([out_dir])

    keys = ("lsd_gain", "stoi_gain", "segsnr_gain", "pesq_gain")
    clips = ("test1", "test2", "test3")
    dry = json.load(open(os.path.join(ART, "demo_gate_psm.json")))
    r0 = json.load(open(os.path.join(ART, "demo_gate_psm_reverb25.json")))
    r1 = json.load(open(os.path.join(out_dir, "demo_gate.json")))
    # confirmation criteria (VERDICT r4 item 6 / CLAUDE.md r5 candidates):
    # within ~0.5 dB LSD of the dry flagship on every clip, all proxies
    # positive, and the real-world-clip (test3) STOI advantage holds
    within = all(r1[c]["lsd_gain"] >= dry[c]["lsd_gain"] - 0.5 for c in clips)
    positive = all(r1[c][k] >= 0.0 for c in clips
                   for k in ("stoi_gain", "segsnr_gain"))
    t3_adv = r1["test3"]["stoi_gain"] >= 2.0 * dry["test3"]["stoi_gain"]
    confirmed = bool(within and positive and t3_adv and r1.get("pass"))
    decision = {
        "protocol": "reverb_prob=0.25 flagship protocol, seed 0 (round 4) "
                    "vs seed 1 (round 5 confirmation)",
        "gate": {c: {"dry_seed0": {k: round(dry[c][k], 4) for k in keys},
                     "rv25_seed0": {k: round(r0[c][k], 4) for k in keys},
                     "rv25_seed1": {k: round(r1[c][k], 4) for k in keys}}
                 for c in clips},
        "criteria": {"within_half_db_of_dry": within,
                     "all_proxies_positive": positive,
                     "test3_stoi_at_least_2x_dry": t3_adv,
                     "gate_pass": bool(r1.get("pass"))},
        "confirmed": confirmed,
        "decision": ("reverb_prob=0.25 becomes the RECOMMENDED DEPLOYMENT "
                     "default (robust to reverberant real-world input at "
                     "~no dry-condition cost)" if confirmed else
                     "NOT confirmed - dry flagship stays; reverb25 remains "
                     "the reverberant-conditions variant"),
    }
    json.dump(decision, open(os.path.join(ART, "reverb25_confirm.json"), "w"),
              indent=2)
    log(f"reverb: confirmed={confirmed} criteria={decision['criteria']}")


# --------------------------------------------------------------------------
def stage_unseen() -> None:
    # in-process: a subprocess would block on the TPU tunnel we hold
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "run_unseen_noise_wide",
        os.path.join(REPO, "benchmarks", "run_unseen_noise_wide.py"))
    mod = importlib.util.module_from_spec(spec)
    old_argv = sys.argv
    sys.argv = ["run_unseen_noise_wide.py"]
    try:
        spec.loader.exec_module(mod)
        rc = mod.main()
    finally:
        sys.argv = old_argv
    log(f"unseen: rc={rc}")


# --------------------------------------------------------------------------
def stage_scale() -> None:
    """Reference-scale epoch INSIDE this process (the chip is already held;
    a subprocess would deadlock on the tunnel)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "canonical_pfile_epoch",
        os.path.join(REPO, "benchmarks", "canonical_pfile_epoch.py"))
    cpe = importlib.util.module_from_spec(spec)
    sys.modules["canonical_pfile_epoch"] = cpe  # parent-side resolution
    # spawn workers re-import the module BY NAME with the parent's sys.path
    # (multiprocessing forwards it), so benchmarks/ must be on it
    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    spec.loader.exec_module(cpe)

    work = os.path.join(ART, "pfile_epoch_scale")
    os.makedirs(work, exist_ok=True)
    rc = cpe.main(["--frames", "10600000", "--epochs", "3",
                   "--work", work,
                   "--out", os.path.join(ART, "pfile_epoch_scale.json")])
    # context row: the 1 M-frame canonical number for the comparison table
    try:
        small = json.load(open(os.path.join(ART, "pfile_epoch.json")))
        scale = json.load(open(os.path.join(ART, "pfile_epoch_scale.json")))
        scale["canonical_1m_samples_per_sec"] = small["samples_per_sec"]
        scale["scale_vs_canonical"] = round(
            scale["samples_per_sec"] / small["samples_per_sec"], 3)
        json.dump(scale, open(os.path.join(ART, "pfile_epoch_scale.json"),
                              "w"), indent=2)
        log(f"scale: {scale['samples_per_sec']} samples/s at "
            f"{scale['train_samples']} samples/epoch "
            f"({scale['scale_vs_canonical']}x the 1M-frame epoch rate)")
    except Exception as e:
        log(f"scale: comparison row failed: {e}")
    log(f"scale: rc={rc}")


# --------------------------------------------------------------------------
def stage_bench() -> None:
    """Smoke bench.py IN-PROCESS (the chip is held by us; a subprocess
    would block on the tunnel) and assert the emitted line parses and fits
    the driver's capture window.  The driver runs its own fresh-process
    bench after the round; this catches breakage while we can still fix it."""
    import bench as bench_mod

    # capture the emitted line
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    old_argv = sys.argv
    sys.argv = ["bench.py"]
    try:
        with redirect_stdout(buf):
            bench_mod.main()
    finally:
        sys.argv = old_argv
    line = buf.getvalue().strip().splitlines()[-1]
    print(line, flush=True)
    assert len(line) <= 2000, f"bench line too long: {len(line)}"
    parsed = json.loads(line)
    log(f"bench: line={len(line)} chars, value={parsed['value']} "
        f"mfu={parsed.get('mfu')} 16k={parsed.get('train16k_step_ms')} ms "
        f"engine={parsed.get('train16k_engine')}")
    json.dump({"line_chars": len(line), "parsed": parsed},
              open(os.path.join(ART, "bench_smoke_r5.json"), "w"), indent=2)


STAGES = {
    "kernel": stage_kernel,
    "lps16k": stage_lps16k,
    "fusion": stage_fusion,
    "seed2": stage_seed2,
    "reverb": stage_reverb,
    "unseen": stage_unseen,
    "scale": stage_scale,
    "bench": stage_bench,
}
DEFAULT_ORDER = ["kernel", "lps16k", "fusion", "seed2", "reverb", "unseen",
                 "scale", "bench"]


def main() -> int:
    wanted = [a for a in sys.argv[1:] if not a.startswith("-")] or DEFAULT_ORDER
    t0 = time.time()
    failures = []
    for name in wanted:
        log(f"=== stage {name} ===")
        ts = time.time()
        try:
            STAGES[name]()
            log(f"=== stage {name} done in {time.time() - ts:.0f}s ===")
        except Exception:
            failures.append(name)
            log(f"=== stage {name} FAILED in {time.time() - ts:.0f}s ===")
            traceback.print_exc()
    log(f"all stages done in {time.time() - t0:.0f}s; failures={failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
