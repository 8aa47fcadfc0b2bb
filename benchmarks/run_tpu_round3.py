"""Round-3 TPU work, one process, one chip (run in background, long timeout).

Stages (each writes its artifact immediately, so a late failure keeps early
results):
  A. kernel micro-bench: parity resident vs dedy_full variant, clean,
     row-tiled mega-batch (4096/1024 x tile 128), XLA parity
     -> artifacts/kernel_bench_r3.json
  B. IRM flagship full retrain (fresh dir, utterance-granular CV split) ->
     val_sweep (FULL grid, held-out clips) freezes decode params ->
     demo gate re-scored -> artifacts/demo_gate_irm.json
  C. re-sweep the lps (mc_full_r2) and 16 kHz (mc_full_16k) run dirs on
     held-out clips -> re-score their gates (de-biases the round-2 numbers)
  D. canonical 20-epoch pfile recipe through the CLI path (the reference's
     actual operating mode) -> artifacts/recipe_full/ + gate
  E. dropout + DP-dropout hardware checks

NEVER kill this mid-compile (wedges the relay; see CLAUDE.md).
"""

import importlib
import json
import os
import pkgutil
import shutil
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
ART = os.path.join(REPO, "artifacts")

# Pre-import the whole package NOW: repo files may be edited while this run
# is in flight, and a lazy import would mix new files with old modules
# (an ImportError killed a round-2 run this way).
import tpu_sednn

for m in pkgutil.walk_packages(tpu_sednn.__path__, "tpu_sednn."):
    try:
        importlib.import_module(m.name)
    except Exception as e:  # pragma: no cover
        print(f"[preimport] {m.name}: {e}", flush=True)
import bench  # noqa: E402  (bench helpers; also pins its module)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def stage_a():
    log("A: kernel micro-bench")
    out = {}
    runs = [
        ("parity_resident", dict(mode="parity")),
        ("parity_resident_dedyfull", dict(mode="parity",
                                          res_kwargs={"dedy_full": True})),
        ("clean_resident", dict(mode="clean")),
        ("clean_tiled_4096", dict(mode="clean", bunch=4096,
                                  res_kwargs={"tile_rows": 128})),
        ("clean_tiled_1024", dict(mode="clean", bunch=1024,
                                  res_kwargs={"tile_rows": 128})),
        ("parity_xla", dict(mode="parity_xla")),
    ]
    for name, kw in runs:
        try:
            t0 = time.time()
            r = bench.bench_mode(n_samples=32768, reps=10, **kw)
            r = {k: (round(v, 4) if isinstance(v, float) else v)
                 for k, v in r.items()}
            out[name] = r
            log(f"A: {name}: {r} (total {time.time() - t0:.0f}s)")
        except Exception:
            out[name] = {"error": traceback.format_exc()[-2000:]}
            log(f"A: {name} FAILED")
        json.dump(out, open(os.path.join(ART, "kernel_bench_r3.json"), "w"),
                  indent=2)
    return out


def _sweep_and_gate(run_dir, gate_copy, grid="full"):
    from tpu_sednn.recipes import demo_gate as dg
    from tpu_sednn.recipes.val_sweep import sweep_run_dir

    t0 = time.time()
    res = sweep_run_dir(run_dir, grid=grid)
    log(f"sweep {os.path.basename(run_dir)}: best={res['best']} "
        f"({time.time() - t0:.0f}s)")
    dg.main([run_dir])  # re-score with the frozen manifest
    src = os.path.join(run_dir, "demo_gate.json")
    if gate_copy:
        shutil.copy(src, gate_copy)
    return json.load(open(src))


def stage_b():
    log("B: IRM flagship retrain")
    from tpu_sednn.data.mixing import NOISE_KINDS
    from tpu_sednn.recipes.multi_condition import (
        MultiConditionConfig, run_multi_condition,
    )

    out_dir = os.path.join(ART, "mc_full_irm_r3")
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
    t0 = time.time()
    res = run_multi_condition(mc)
    log(f"B: trained in {time.time() - t0:.0f}s cv={res['cv_hist'][-1]:.4f}")
    gate = _sweep_and_gate(out_dir, os.path.join(ART, "demo_gate_irm.json"))
    log(f"B: gate={ {k: v.get('lsd_gain') for k, v in gate.items() if isinstance(v, dict)} }")


def stage_c():
    for run_dir, copy_to in (
        (os.path.join(ART, "mc_full_r2"), os.path.join(ART, "demo_gate.json")),
        (os.path.join(ART, "mc_full_16k"), os.path.join(ART, "demo_gate_16k.json")),
    ):
        if not os.path.exists(os.path.join(run_dir, "mlp.final.wts")):
            log(f"C: skip {run_dir} (no weights)")
            continue
        log(f"C: re-sweep {run_dir}")
        try:
            _sweep_and_gate(run_dir, copy_to)
        except Exception:
            log(f"C: {run_dir} FAILED\n{traceback.format_exc()[-2000:]}")


def stage_d():
    log("D: canonical 20-epoch pfile recipe")
    sys.argv = ["canonical_pfile_epoch"]
    import benchmarks.canonical_pfile_epoch as cpe

    t0 = time.time()
    cpe.main(["--epochs", "20"])
    log(f"D: 20 epochs in {time.time() - t0:.0f}s")
    # package the pfile-trained model as a scoreable run dir + gate it
    work = os.path.join(ART, "pfile_epoch")
    run_dir = os.path.join(ART, "recipe_full")
    os.makedirs(run_dir, exist_ok=True)
    shutil.copy(os.path.join(work, "mlp.20.wts"),
                os.path.join(run_dir, "mlp.final.wts"))
    shutil.copy(os.path.join(work, "fea.norm"),
                os.path.join(run_dir, "fea.norm"))
    shutil.copy(os.path.join(work, "targ.norm"),
                os.path.join(run_dir, "targ.norm"))
    # cv curve for BASELINE
    shutil.copy(os.path.join(REPO, "artifacts", "pfile_epoch.json"),
                os.path.join(run_dir, "pfile_epoch.json"))
    with open(os.path.join(run_dir, "run.json"), "w") as f:
        json.dump({"head": "lps", "sample_rate": 8000, "fea_context": 11,
                   "targ_offset": 5, "dropout": [0.1, 0.2], "gv_mode": "off",
                   "layersizes": [1548, 2048, 2048, 2048, 129], "nat": True,
                   "mask_floor": 0.0, "target_norm": True,
                   "min_gain_db": None, "max_gain_db": None}, f, indent=2)
    gate = _sweep_and_gate(run_dir, None)
    log(f"D: recipe-full gate pass={gate.get('pass')}")


def stage_e():
    log("E: dropout hardware checks")
    out = {"dropout_check": bench.validate_dropout(),
           "dp_dropout_check": bench.validate_dp_dropout()}
    json.dump(out, open(os.path.join(ART, "dropout_checks_r3.json"), "w"),
              indent=2)
    log(f"E: {out}")


def main():
    t0 = time.time()
    import jax

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    for stage in (stage_a, stage_b, stage_c, stage_d, stage_e):
        try:
            stage()
        except Exception:
            log(f"{stage.__name__} FAILED\n{traceback.format_exc()[-3000:]}")
    log(f"round-3 TPU run done in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
