"""Round-4 TPU work, one process, one chip (run in background, long timeout).

Stages (each writes its artifact immediately, so a late failure keeps early
results):
  A. 16 kHz engine smoke + kernel bench: auto (resident sr_delta — bf16
     momentum + SR, f32 weights) vs the sr_state variant vs the explicit
     XLA fallback -> artifacts/kernel_bench_r4.json
  B. 16 kHz PSM flagship-scale run (2000 utts x 2 variants, 22 epochs, all
     noise kinds, held-out sweep) -> artifacts/demo_gate_psm_16k.json
  C. 16 kHz IRM control at the same scale -> artifacts/demo_gate_irm_16k.json
  D. unseen-noise generalization: 8 kHz PSM at flagship scale trained on
     SEEN_NOISE_KINDS only, evaluated on all 7 families
     -> artifacts/unseen_noise.json (+ demo_gate_psm_unseen.json)
  E. reverb corpus-realism probe: 8 kHz PSM at flagship scale with
     reverb_prob=0.5 -> artifacts/demo_gate_psm_reverb.json
  F. IBM head at modest scale (800 x 2, 18 epochs)
     -> artifacts/demo_gate_ibm.json
  G. on-chip streaming bench (device-state scan, block 8 and 1)
     -> artifacts/stream_bench_r4.json

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
# is in flight, and a lazy import would mix new files with old modules.
import tpu_sednn

for m in pkgutil.walk_packages(tpu_sednn.__path__, "tpu_sednn."):
    try:
        importlib.import_module(m.name)
    except Exception as e:  # pragma: no cover
        print(f"[preimport] {m.name}: {e}", flush=True)
import bench  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _round_floats(d, nd=4):
    return {k: (round(v, nd) if isinstance(v, float) else v) for k, v in d.items()}


def stage_a():
    log("A: 16 kHz engine smoke + kernel bench")
    out = {}
    path = os.path.join(ART, "kernel_bench_r4.json")
    # auto -> resident sr_delta (bf16 momentum + SR, f32 weights): the
    # production degrade for over-VMEM models; sr_state (all-bf16 state) is
    # the max-VMEM-savings alternative row
    for name, kw in (
        ("train16k_auto", dict(engine="auto")),
        ("train16k_xla", dict(engine="xla")),
        ("train16k_sr_state", dict(engine="resident",
                                   engine_kwargs={"sr_state": True})),
    ):
        try:
            t0 = time.time()
            r = _round_floats(bench.bench_train_16k(reps=8, n_samples=16384, **kw))
            out[name] = r
            log(f"A: {name}: {r} ({time.time() - t0:.0f}s)")
        except Exception:
            out[name] = {"error": traceback.format_exc()[-2000:]}
            log(f"A: {name} FAILED\n{out[name]['error'][-800:]}")
        json.dump(out, open(path, "w"), indent=2)
    auto = out.get("train16k_auto", {})
    xla = out.get("train16k_xla", {})
    ok = (auto.get("engine") == "resident"
          and auto.get("engine_kwargs", {}).get("sr_delta")
          and "error" not in auto
          and auto.get("step_ms", 1e9) < xla.get("step_ms", 0.0))
    log(f"A: sr_delta resident on hardware (selected AND faster than XLA): "
        f"{'OK' if ok else 'NO'}")
    return bool(ok)


def _sweep_and_gate(run_dir, gate_copy, grid="full"):
    from tpu_sednn.recipes import demo_gate as dg
    from tpu_sednn.recipes.val_sweep import sweep_run_dir

    t0 = time.time()
    res = sweep_run_dir(run_dir, grid=grid)
    log(f"sweep {os.path.basename(run_dir)}: best={res['best']} "
        f"({time.time() - t0:.0f}s)")
    dg.main([run_dir])
    src = os.path.join(run_dir, "demo_gate.json")
    if gate_copy:
        shutil.copy(src, gate_copy)
    return json.load(open(src))


def _gate_summary(gate):
    return {k: (round(v["lsd_gain"], 2), round(v["stoi_gain"], 4),
                round(v["segsnr_gain"], 2))
            for k, v in gate.items() if isinstance(v, dict)}


def _run_mc(tag, mc, gate_copy):
    from tpu_sednn.recipes.multi_condition import run_multi_condition

    t0 = time.time()
    res = run_multi_condition(mc)
    log(f"{tag}: trained in {time.time() - t0:.0f}s cv={res['cv_hist'][-1]:.4f} "
        f"({res['train_samples_per_sec']:.0f} samples/s)")
    gate = _sweep_and_gate(mc.out_dir, gate_copy)
    log(f"{tag}: gate pass={gate.get('pass')} {_gate_summary(gate)}")
    return res, gate


def stage_b():
    log("B: 16 kHz PSM flagship-scale")
    from tpu_sednn.data.mixing import NOISE_KINDS
    from tpu_sednn.recipes.multi_condition import MultiConditionConfig

    mc = MultiConditionConfig(
        out_dir=os.path.join(ART, "mc_full_psm_16k_xl"),
        sample_rate=16000, head="psm",
        n_utts=2000, variants=2, n_epochs=22,
        hidden=(2048, 2048, 2048),
        snrs=(-5.0, 0.0, 5.0, 10.0, 15.0, 20.0),
        noise_kinds=NOISE_KINDS, ckpt_every=8,
    )
    _run_mc("B", mc, os.path.join(ART, "demo_gate_psm_16k.json"))


def stage_c():
    log("C: 16 kHz IRM control at the same scale")
    from tpu_sednn.data.mixing import NOISE_KINDS
    from tpu_sednn.recipes.multi_condition import MultiConditionConfig

    mc = MultiConditionConfig(
        out_dir=os.path.join(ART, "mc_full_irm_16k_xl"),
        sample_rate=16000, head="irm",
        n_utts=2000, variants=2, n_epochs=22,
        hidden=(2048, 2048, 2048),
        snrs=(-5.0, 0.0, 5.0, 10.0, 15.0, 20.0),
        noise_kinds=NOISE_KINDS, ckpt_every=8,
    )
    _run_mc("C", mc, os.path.join(ART, "demo_gate_irm_16k.json"))


def stage_d():
    log("D: unseen-noise generalization (train on 5 families, eval on 7)")
    from tpu_sednn.data.mixing import SEEN_NOISE_KINDS, UNSEEN_NOISE_KINDS
    from tpu_sednn.recipes.multi_condition import MultiConditionConfig

    mc = MultiConditionConfig(
        out_dir=os.path.join(ART, "mc_full_psm_unseen"),
        head="psm",
        n_utts=2000, variants=2, n_epochs=22,
        hidden=(2048, 2048, 2048),
        snrs=(-5.0, 0.0, 5.0, 10.0, 15.0, 20.0),
        noise_kinds=SEEN_NOISE_KINDS,
        eval_noise_kinds=UNSEEN_NOISE_KINDS,
        ckpt_every=8,
    )
    res, _ = _run_mc("D", mc, os.path.join(ART, "demo_gate_psm_unseen.json"))
    gen = res["eval"].get("noise_generalization")
    json.dump({
        "protocol": {
            "train_noise_kinds": list(SEEN_NOISE_KINDS),
            "unseen_noise_kinds": list(UNSEEN_NOISE_KINDS),
            "n_utts": mc.n_utts, "variants": mc.variants,
            "n_epochs": mc.n_epochs, "head": mc.head,
            "reference": "README.md:22-24 (eval on unseen noise types)",
        },
        "noise_generalization": gen,
    }, open(os.path.join(ART, "unseen_noise.json"), "w"), indent=2)
    log(f"D: gap={gen.get('gap') if gen else None}")


def stage_e():
    log("E: reverb corpus-realism probe (flagship scale, reverb_prob=0.5)")
    from tpu_sednn.data.mixing import NOISE_KINDS
    from tpu_sednn.recipes.multi_condition import MultiConditionConfig

    mc = MultiConditionConfig(
        out_dir=os.path.join(ART, "mc_full_psm_reverb"),
        head="psm",
        n_utts=2000, variants=2, n_epochs=22,
        hidden=(2048, 2048, 2048),
        snrs=(-5.0, 0.0, 5.0, 10.0, 15.0, 20.0),
        noise_kinds=NOISE_KINDS,
        reverb_prob=0.5,
        ckpt_every=8,
    )
    _run_mc("E", mc, os.path.join(ART, "demo_gate_psm_reverb.json"))


def stage_f():
    log("F: IBM head (estIBM_refCLEAN_LC5dB analog) at modest scale")
    from tpu_sednn.data.mixing import NOISE_KINDS
    from tpu_sednn.recipes.multi_condition import MultiConditionConfig

    mc = MultiConditionConfig(
        out_dir=os.path.join(ART, "mc_full_ibm"),
        head="ibm",
        n_utts=800, variants=2, n_epochs=18,
        hidden=(2048, 2048, 2048),
        snrs=(-5.0, 0.0, 5.0, 10.0, 15.0, 20.0),
        noise_kinds=NOISE_KINDS, ckpt_every=6,
    )
    _run_mc("F", mc, os.path.join(ART, "demo_gate_ibm.json"))


def stage_g():
    log("G: on-chip streaming bench (device-state scan)")
    out = {}
    for name, kw in (("block8", dict(block_frames=8)),
                     ("block1", dict(block_frames=1, n_blocks=512))):
        try:
            t0 = time.time()
            out[name] = _round_floats(bench.bench_stream(**kw))
            log(f"G: {name}: {out[name]} ({time.time() - t0:.0f}s)")
        except Exception:
            out[name] = {"error": traceback.format_exc()[-2000:]}
            log(f"G: {name} FAILED")
    json.dump(out, open(os.path.join(ART, "stream_bench_r4.json"), "w"),
              indent=2)


def main(argv=None):
    t0 = time.time()
    import jax

    argv = sys.argv[1:] if argv is None else argv
    stages = "abcdefg"
    for a in argv:
        if a.startswith("--stages="):
            stages = a.split("=", 1)[1].lower()
    log(f"backend={jax.default_backend()} devices={jax.devices()} "
        f"stages={stages}")
    if "a" in stages and not stage_a():
        # bf16 degrade unusable/slower on this hardware: pin the 16 kHz runs
        # to the known-good XLA fallback rather than crashing two flagship runs
        os.environ["TPU_SEDNN_NO_SR_FALLBACK"] = "1"
        log("A: falling back to XLA for over-VMEM models (TPU_SEDNN_NO_SR_FALLBACK=1)")
    all_stages = {"b": stage_b, "c": stage_c, "d": stage_d, "e": stage_e,
                  "f": stage_f, "g": stage_g}
    for key, stage in all_stages.items():
        if key not in stages:
            continue
        try:
            stage()
        except Exception:
            log(f"{stage.__name__} FAILED\n{traceback.format_exc()[-3000:]}")
    log(f"round-4 TPU run done in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
