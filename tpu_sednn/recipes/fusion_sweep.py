"""Held-out sweep of the head-fusion blend weight (VERDICT r4 item 5).

At 16 kHz the lps head wins LSD and the PSM head wins the perceptual proxies
(BASELINE.md r4 16 kHz table).  This sweeps the convex blend
enhance.fusion over held-out validation clips (recipes/val_sweep.py's
clip builder — fresh seed stream, never the gate clips), picks the weight
maximizing the same objective val_sweep uses (mean lsd_gain + 50 * mean
stoi_gain, subject to mean stoi_gain >= 0), and scores the demo gate with
the winning blend.

CLI:
    python -m tpu_sednn.recipes.fusion_sweep RUN_A RUN_B \
        [--out fusion_sweep.json] [--gate demo_gate_fusion.json] \
        [--alphas 0,0.25,0.5,0.75,1]

alpha = weight on RUN_A (1-alpha on RUN_B).  alpha 0/1 rows are the
single-model baselines under the identical eval, so the table is
self-calibrating.
"""

from __future__ import annotations

import json
import sys
from typing import Dict, List, Sequence

import numpy as np


def sweep_fusion(model_a, model_b, sr: int,
                 alphas: Sequence[float] = (0.0, 0.25, 0.4, 0.5, 0.6, 0.75, 1.0),
                 n_clips: int = 8) -> Dict:
    """-> {"table": [...], "best": {...}} over held-out val clips.

    Each model's enhanced LPS is computed ONCE per clip; per-alpha work is
    the blend + overlap-add + metrics."""
    import jax.numpy as jnp

    from tpu_sednn.dsp import stft_logpower, stft_real_imag
    from tpu_sednn.dsp.stft import reconstruct_from_lps
    from tpu_sednn.enhance.decode import LPS_FLOOR, enhance_lps
    from tpu_sednn.metrics import lsd, seg_snr, stoi
    from tpu_sednn.recipes.val_sweep import make_val_clips

    stft = model_a[2].stft
    clips = make_val_clips(sr, n_clips=n_clips)
    prepped = []
    for clean, noisy in clips:
        re, im = stft_real_imag(jnp.asarray(noisy, jnp.float32), stft)
        noisy_lps = jnp.log(jnp.maximum(re * re + im * im, LPS_FLOOR))
        clean_lps = np.asarray(stft_logpower(jnp.asarray(clean), stft))
        per_model = []
        for params, mcfg, ecfg, mean, inv_std, tn, gv in (model_a, model_b):
            per_model.append(enhance_lps(
                params, mcfg, ecfg, noisy_lps, jnp.asarray(mean),
                jnp.asarray(inv_std),
                target_norm=None if tn is None else (jnp.asarray(tn[0]),
                                                     jnp.asarray(tn[1])),
                gv_ref=None if gv is None else jnp.asarray(gv)))
        prepped.append({
            "clean": clean, "re": re, "im": im, "n": len(noisy),
            "lps_a": per_model[0], "lps_b": per_model[1],
            "clean_lps": clean_lps,
            "lsd_noisy": lsd(clean_lps, np.asarray(noisy_lps)),
            "stoi_noisy": stoi(clean, noisy, sr),
            "segsnr_noisy": seg_snr(clean, noisy, sr),
        })

    table: List[Dict] = []
    for a in alphas:
        rows = []
        for p in prepped:
            fused = a * p["lps_a"] + (1.0 - a) * p["lps_b"]
            enh = np.asarray(reconstruct_from_lps(fused, p["re"], p["im"],
                                                  stft, n_samples=p["n"]))
            rows.append({
                "lsd_gain": p["lsd_noisy"] - lsd(p["clean_lps"], np.asarray(fused)),
                "stoi_gain": stoi(p["clean"], enh, sr) - p["stoi_noisy"],
                "segsnr_gain": seg_snr(p["clean"], enh, sr) - p["segsnr_noisy"],
            })
        m = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
        m["alpha"] = float(a)
        m["score"] = m["lsd_gain"] + 50.0 * m["stoi_gain"]
        table.append(m)
    feasible = [m for m in table if m["stoi_gain"] >= 0.0] or table
    best = max(feasible, key=lambda m: m["score"])
    return {"table": table, "best": best,
            "objective": "lsd_gain + 50*stoi_gain s.t. stoi_gain >= 0 "
                         "on held-out val clips (val_sweep seed stream)"}


def main(argv=None) -> int:
    argv = list(argv if argv is not None else sys.argv[1:])
    out_path = "fusion_sweep.json"
    gate_path = None
    alphas = (0.0, 0.25, 0.4, 0.5, 0.6, 0.75, 1.0)
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i:i + 2]
    if "--gate" in argv:
        i = argv.index("--gate")
        gate_path = argv[i + 1]
        del argv[i:i + 2]
    if "--alphas" in argv:
        i = argv.index("--alphas")
        alphas = tuple(float(x) for x in argv[i + 1].split(","))
        del argv[i:i + 2]
    if len(argv) != 2:
        print(__doc__, file=sys.stderr)
        return 1
    run_a, run_b = argv

    from tpu_sednn.recipes.artifact import load_run_dir

    model_a = load_run_dir(run_a)
    model_b = load_run_dir(run_b)
    sr = model_a[2].stft.sample_rate
    if model_b[2].stft.sample_rate != sr:
        print(f"sample-rate mismatch: {sr} vs {model_b[2].stft.sample_rate}",
              file=sys.stderr)
        return 1

    res = sweep_fusion(model_a, model_b, sr, alphas=alphas)
    res["run_a"] = run_a
    res["run_b"] = run_b
    for row in res["table"]:
        print(f"alpha={row['alpha']:.2f}  lsd={row['lsd_gain']:+.3f}  "
              f"stoi={row['stoi_gain']:+.4f}  segsnr={row['segsnr_gain']:+.2f}  "
              f"score={row['score']:.3f}")
    print(f"best: alpha={res['best']['alpha']}")

    if gate_path:
        from tpu_sednn.enhance.fusion import enhance_waveform_fused
        from tpu_sednn.recipes.demo_gate import evaluate_demo_clips

        a = res["best"]["alpha"]
        gate = evaluate_demo_clips(
            None, model_a[1], model_a[2], None, None,
            enhance_fn=lambda noisy: enhance_waveform_fused(
                (model_a, model_b), noisy, (a, 1.0 - a)))
        gate["fusion"] = {"alpha": a, "run_a": run_a, "run_b": run_b}
        with open(gate_path, "w") as f:
            json.dump(gate, f, indent=2)
        res["gate"] = gate
        print(f"gate (alpha={a}): pass={gate.get('pass')} -> {gate_path}")

    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
