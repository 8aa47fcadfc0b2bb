"""bench.py's emitted JSON line must parse and fit the driver's capture window.

Round 4 shipped a line that outgrew the driver's 2000-char stdout tail
capture, so BENCH_r04.json recorded parsed:false — no machine-readable perf
numbers for the round (VERDICT r4 item 1).  These tests pin the invariant:
the payload main() builds, rendered by render_line, parses as JSON and stays
comfortably under the window for worst-case-width values, with required
headline keys always present.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


def _wide(v):  # worst-case float width after round(): sign + many digits
    return v


def _fake_mode(scale=1.0):
    return {
        "samples_per_sec": _wide(-1234567.8901 * scale),
        "step_ms": -123.456789,
        "audio_s_per_s": -123456.789 * scale,
        "mfu": -0.987654,
    }


def _fake_stream():
    return {"rtf": -0.0123456, "audio_s_per_s": -12345.6,
            "step_ms": -1234.56, "block_ms": -128.0,
            "algorithmic_latency_ms": -12345.6}


def _fake_decode():
    return {"audio_s_per_s": -123456.7, "rtf": -0.000123, "batch": 64}


def _worst_case_payload():
    train16k = dict(_fake_mode(), engine="resident",
                    engine_kwargs={"sr_delta": True, "hbm_spill": 1,
                                   "tile_rows": 4096})
    dropout = {"zero_rate_ok": False, "zero_rate_worst_dev": -0.12345,
               "collision_free": False, "resident_vs_xla_rel": -0.1234,
               "pass": False, "on_tpu": True}
    dp = {"pass": False, "slice_identity": False, "per_device_distinct": False,
          "device_count_invariant": False, "on_tpu": True}
    # 12 gates with worst-width margins + a 15-family generalization table
    gate_detail = {f"gate_{i:02d}": {"pass": False,
                                     "min_lsd_gain_db": -12.34,
                                     "min_stoi_gain": -0.1234,
                                     "artifact_mtime": "2026-08-21T00:00:00"}
                   for i in range(12)}
    gate_detail["bench_commit"] = "0123456789ab"
    gen_detail = {
        grp: {"stoi_gain": -0.1234, "segsnr_gain": -12.3456,
              "pesq_gain": -1.2345, "lsd_gain": -12.3456}
        for grp in ("seen", "unseen", "gap")
    }
    gen_detail["n_seen_families"] = 5
    gen_detail["n_unseen_families"] = 15
    return bench.build_payload(
        parity=_fake_mode(), clean=_fake_mode(), xla_parity=_fake_mode(),
        mega=_fake_mode(), train16k=train16k, stream8=_fake_stream(),
        stream1=_fake_stream(), decode=_fake_decode(),
        decode_16k=_fake_decode(), decode_irm=_fake_decode(),
        decode_int8=_fake_decode(), dropout_check=dropout, dp_dropout=dp,
        gate_detail=gate_detail, gen_detail=gen_detail,
        train16k_hybrid=_fake_mode())


def test_worst_case_line_fits_and_parses():
    line = bench.render_line(_worst_case_payload())
    assert len(line) <= bench.MAX_LINE_CHARS, len(line)
    parsed = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in parsed
    # nothing should need dropping at worst-case widths — the payload itself
    # is sized for the window, the drop ladder is a backstop
    assert "dropped" not in parsed, parsed.get("dropped")


def test_real_artifact_summaries_fit():
    """The payload built from the repo's ACTUAL tracked artifacts (the exact
    summaries a real bench run embeds) must fit."""
    payload = bench.build_payload(
        parity=_fake_mode(), clean=_fake_mode(), xla_parity=_fake_mode(),
        mega=_fake_mode(), train16k=dict(_fake_mode(), engine="resident",
                                         engine_kwargs={"sr_delta": True}),
        stream8=_fake_stream(), stream1=_fake_stream(), decode=_fake_decode(),
        decode_16k=_fake_decode(), decode_irm=_fake_decode(),
        decode_int8=_fake_decode(),
        dropout_check={"pass": True}, dp_dropout={"pass": True},
        gate_detail=bench._demo_gate_summary(),
        gen_detail=bench._unseen_noise_summary())
    line = bench.render_line(payload)
    assert len(line) <= bench.MAX_LINE_CHARS, len(line)
    assert json.loads(line)["metric"] == "train_audio_seconds_per_sec_per_chip"
    assert "dropped" not in json.loads(line)


def test_drop_ladder_guards_oversized_payload():
    """If a future key bloats the line past the window, optional keys drop in
    order and the truncation is recorded — never a silent unparseable line."""
    payload = _worst_case_payload()
    payload["noise_generalization"] = {"x" * 50: "y" * 2000}
    line = bench.render_line(payload)
    assert len(line) <= bench.MAX_LINE_CHARS
    parsed = json.loads(line)
    assert "noise_generalization" not in parsed
    assert "noise_generalization" in parsed["dropped"]
    assert parsed["value"] == round(_fake_mode()["audio_s_per_s"], 1)
