"""Training-throughput benchmark on the canonical reference workload.

Workload: the recipe's flagship net 1548 -> 2048 x3 -> 129 (129-dim LPS,
11-frame context + NAT), bunch 128, dropout 0.1/0.2 — the exact shape trained
by finetune_DNN_speech_enhancement_dropout_NAT.pl (reference lines 11-19,
101-103).  One training sample = one 16 ms frame hop of audio, so

    audio_seconds/s/chip = samples_per_sec * 0.016 / n_chips.

Baseline: the reference publishes NO numbers (BASELINE.md).  We use a
documented engineering estimate of its CUDA-5-era single-GPU trainer:
~11.8 M params => ~71 MFLOP/sample (fwd+bwd ~= 6 FLOP/param); a K20-class
fp32 GPU sustains ~1.2 TFLOP/s on this GEMM mix => ~16.9 k samples/s
=> ~270 audio-s/s.  vs_baseline is measured against REF_AUDIO_S_PER_S = 270.

Prints ONE JSON line:
  {"metric": "train_audio_seconds_per_sec_per_chip", "value": ..., "unit":
   "audio_s/s/chip", "vs_baseline": ...}
plus informative extras (parity-fp32 path, samples/s, step time).
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def _sync(tree):
    """Force completion via a tiny host readback.

    Under the axon relay, jax.block_until_ready returns before the remote
    execution finishes (verified empirically: it reported >4 PFLOP/s); a
    device_get of any output is the only reliable fence.
    """
    import jax

    leaf = jax.tree.leaves(tree)[0]
    return np.asarray(jax.device_get(leaf.ravel()[:1]))

REF_AUDIO_S_PER_S = 270.0  # documented estimate, see module docstring
HOP_SECONDS = 0.016  # 16 ms frame shift (how_to_get_pfile.txt:54)
LAYERS = (1548, 2048, 2048, 2048, 129)
BUNCH = 128
# v5e-class bf16 matmul peak (per chip).  MFU below counts LOGICAL model
# FLOPs (6 per param per sample: fwd 2 + bwd 4) against this peak; the
# kernel additionally computes zero-padding (1548->1664, 129->256 lanes) and
# the VPU-bound momentum update, so the matmul-only speed of light is not
# reachable — see BASELINE.md roofline notes.
PEAK_BF16_TFLOPS = 197.0


def _train_flops_per_sample(layers=LAYERS) -> float:
    params = sum(a * b for a, b in zip(layers[:-1], layers[1:]))
    return 6.0 * params


def bench_mode(mode: str, n_samples: int, reps: int, bunch: int = BUNCH,
               res_kwargs: dict | None = None) -> dict:
    import jax
    import jax.numpy as jnp

    from tpu_sednn.model import ModelConfig, init_params
    from tpu_sednn.train import init_train_state, make_jit_train_chunk
    from tpu_sednn.train.step import OptConfig, clean_train_step

    # dropout_rng="tpu_prng": Bernoulli masks from the hardware PRNG — the
    # same semantics as the reference's curand masks, 28% faster per bunch
    # than threefry mask generation (measured on v5e).
    if mode in ("parity", "parity_xla"):
        cfg = ModelConfig(layersizes=LAYERS, dropout_vis=0.1, dropout_hid=0.2,
                          dropout_mode="parity", dropout_rng="tpu_prng")
    else:
        cfg = ModelConfig(layersizes=LAYERS, dropout_vis=0.1, dropout_hid=0.2,
                          dropout_mode="inverted", dropout_rng="tpu_prng")
    opt = OptConfig(lrate=1.0, momentum=0.5, weightcost=0.0, bunchsize=bunch)

    params = init_params(jax.random.key(0), cfg, scheme="glorot")
    state = init_train_state(params)

    key = jax.random.key(1)
    x = jax.random.normal(key, (n_samples, LAYERS[0]), jnp.float32)
    t = jax.random.normal(jax.random.fold_in(key, 1), (n_samples, LAYERS[-1]), jnp.float32)

    if mode in ("parity", "clean") and jax.default_backend() == "tpu":
        # VMEM-resident whole-chunk megakernel: weights+momentum pinned in
        # VMEM for the entire chunk, one fused fwd+bwd+update per bunch
        # (rule="clean" = standard momentum on the same kernel)
        from tpu_sednn.ops.resident_chunk import make_resident_train_chunk

        run_res = make_resident_train_chunk(
            cfg, opt, rule="parity" if mode == "parity" else "clean",
            **(res_kwargs or {}))

        def step(state, rng):
            seed = jax.random.randint(rng, (), 0, 2**31 - 1, jnp.int32)
            return run_res(state, x, t, seed)
    elif mode in ("parity", "parity_xla"):
        run = make_jit_train_chunk(cfg, opt)

        def step(state, rng):
            return run(state, x, t, rng)
    else:
        import functools

        @functools.partial(jax.jit, donate_argnums=(0,))
        def chunk_bf16(state, x, t, rng):
            n_bunches = n_samples // bunch
            xb = x[: n_bunches * bunch].reshape(n_bunches, bunch, -1)
            tb = t[: n_bunches * bunch].reshape(n_bunches, bunch, -1)
            rngs = jax.random.split(rng, n_bunches)

            def body(st, inp):
                xi, ti, r = inp
                st, loss = clean_train_step(st, xi, ti, cfg, opt, rng=r,
                                            compute_dtype=jnp.bfloat16)
                return st, loss

            state, losses = jax.lax.scan(body, state, (xb, tb, rngs))
            return state

        def step(state, rng):
            return chunk_bf16(state, x, t, rng)

    # warmup / compile (first remote compile+execute can take minutes);
    # two calls so dtype-changing state (sr modes) compiles both signatures
    state = step(state, jax.random.key(10))
    _sync(state.params)
    state = step(state, jax.random.key(11))
    _sync(state.params)

    t0 = time.perf_counter()
    for i in range(reps):
        state = step(state, jax.random.key(100 + i))
    _sync(state.params)
    dt = time.perf_counter() - t0

    n_bunches = n_samples // bunch
    total_samples = reps * n_bunches * bunch
    sps = total_samples / dt
    return {
        "samples_per_sec": sps,
        "step_ms": 1000.0 * dt / (reps * n_bunches),
        "audio_s_per_s": sps * HOP_SECONDS,
        "mfu": sps * _train_flops_per_sample() / (PEAK_BF16_TFLOPS * 1e12),
    }


LAYERS_16K = (3084, 2048, 2048, 2048, 257)


def bench_train_16k(reps: int, n_samples: int = 16384,
                    engine: str = "auto", engine_kwargs: dict | None = None) -> dict:
    """Training throughput for the 16 kHz full-band net (3084-2048x3-257) —
    the reference's native demo rate (enh_wav_example wavs are 16 kHz).

    engine="auto" exercises the production resolution: the all-resident f32
    state misses the mosaic VMEM budget, so auto degrades to sr_delta (bf16
    momentum + SR; 0.122 ms/bunch — the round-5 shoot-out winner,
    artifacts/kernel_bench_r5.json), with the f32 hybrid (hbm_spill=1,
    0.138 ms — exact f32 numerics) and XLA (0.198 ms) as the later rungs.
    Reports which engine/kwargs were selected.
    """
    import jax
    import jax.numpy as jnp

    from tpu_sednn.model import ModelConfig, init_params
    from tpu_sednn.train import init_train_state
    from tpu_sednn.train.loop import _auto_engine, make_chunk_runner
    from tpu_sednn.train.step import OptConfig

    cfg = ModelConfig(layersizes=LAYERS_16K, dropout_vis=0.1, dropout_hid=0.2,
                      dropout_mode="parity", dropout_rng="tpu_prng")
    opt = OptConfig(lrate=1.0, momentum=0.5, weightcost=0.0, bunchsize=BUNCH)
    resolved, extra = (engine, dict(engine_kwargs or {}))
    if engine == "auto":
        resolved, extra = _auto_engine(cfg, opt, engine_kwargs)
        extra = {**(engine_kwargs or {}), **extra}
    run = make_chunk_runner(cfg, opt, engine, **(engine_kwargs or {}))

    params = init_params(jax.random.key(0), cfg, scheme="glorot")
    state = init_train_state(params)
    key = jax.random.key(1)
    x = jax.random.normal(key, (n_samples, LAYERS_16K[0]), jnp.float32)
    t = jax.random.normal(jax.random.fold_in(key, 1),
                          (n_samples, LAYERS_16K[-1]), jnp.float32)

    def step(state, rng):
        return run(state, x, t, rng, opt.lrate, opt.momentum, opt.weightcost)

    # TWO warmup calls: the sr engines auto-cast f32 state to bf16 on the
    # first call, so the second call has a NEW input signature (bf16 state)
    # and triggers its own compile — which must not land in the timed region
    # (a single-warmup version of this bench misread sr_state as 21 ms/bunch
    # when the steady state is 0.13; the 20 s second compile was being timed)
    state = step(state, jax.random.key(10))
    _sync(state.params)
    state = step(state, jax.random.key(11))
    _sync(state.params)
    t0 = time.perf_counter()
    for i in range(reps):
        state = step(state, jax.random.key(100 + i))
    _sync(state.params)
    dt = time.perf_counter() - t0
    n_bunches = n_samples // BUNCH
    sps = reps * n_bunches * BUNCH / dt
    return {
        "samples_per_sec": sps,
        "step_ms": 1000.0 * dt / (reps * n_bunches),
        "audio_s_per_s": sps * HOP_SECONDS,
        "mfu": sps * _train_flops_per_sample(LAYERS_16K) / (PEAK_BF16_TFLOPS * 1e12),
        "engine": resolved,
        "engine_kwargs": {k: v for k, v in extra.items()},
    }


def bench_stream(block_frames: int, reps_scan: int = 3, n_blocks: int = 256,
                 step_reps: int = 20, sample_rate: int = 8000) -> dict:
    """On-chip streaming decode (DeviceStreamingEnhancer, VERDICT r3 item 5).

    Two numbers per block size:
    * rtf — steady-state real-time factor with the rolling state carried as
      device arrays through ONE lax.scan dispatch over n_blocks steps (the
      throughput-oriented streaming regime; per-dispatch relay latency
      amortizes away).  rtf < 1 = faster than realtime.
    * step_ms — wall latency of ONE step() dispatch incl. the host readback
      (the latency-oriented regime; in this environment dominated by the
      ~30 ms relay round-trip, which is the tunnel's cost, not the chip's).
    Plus the algorithmic latency bound in ms.
    """
    import jax
    import jax.numpy as jnp

    from tpu_sednn.dsp.stft import StftConfig
    from tpu_sednn.enhance.decode import EnhanceConfig
    from tpu_sednn.enhance.streaming import DeviceStreamingEnhancer
    from tpu_sednn.model import ModelConfig, init_params

    cfg_stft = StftConfig.for_rate(sample_rate)
    d = cfg_stft.n_bins
    layers = (d * 11 + d, 2048, 2048, 2048, d)
    mcfg = ModelConfig(layersizes=layers, dropout_vis=0.1, dropout_hid=0.2,
                       dropout_mode="parity")
    ecfg = EnhanceConfig(stft=cfg_stft, fea_context=11, targ_offset=5, nat=True)
    params = init_params(jax.random.key(0), mcfg, scheme="glorot")
    mean = np.zeros((d,), np.float32)
    istd = np.ones((d,), np.float32)

    se = DeviceStreamingEnhancer(params, mcfg, ecfg, mean, istd,
                                 block_frames=block_frames)
    step_in = block_frames * cfg_stft.hop
    rng = np.random.default_rng(0)
    # prime + drain the buffer to a block boundary
    se.push(rng.standard_normal(se._n_prime + step_in).astype(np.float32))
    blocks = rng.standard_normal((n_blocks, step_in)).astype(np.float32)

    se.scan_blocks(blocks)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps_scan):
        out = se.scan_blocks(blocks)
    dt = time.perf_counter() - t0
    audio_s = reps_scan * n_blocks * step_in / cfg_stft.sample_rate
    rtf = dt / audio_s

    # single-step latency (push path: one dispatch + readback per block)
    one = blocks[0]
    se.push(one)  # warm the step jit (scan and step compile separately)
    t0 = time.perf_counter()
    for _ in range(step_reps):
        se.push(one)
    step_ms = 1000.0 * (time.perf_counter() - t0) / step_reps

    return {
        "rtf": rtf,
        "audio_s_per_s": 1.0 / rtf,
        "step_ms": step_ms,
        "block_ms": 1000.0 * step_in / cfg_stft.sample_rate,
        "algorithmic_latency_ms": 1000.0 * se.algorithmic_latency_samples
        / cfg_stft.sample_rate,
    }


def bench_decode(seconds: float, reps: int, batch: int = 64,
                 sample_rate: int = 8000, head: str = "lps",
                 quant: str = "none") -> dict:
    """Serving throughput: full wav -> enhanced-wav decode, one jitted program.

    The pipeline the reference ships only as an external binary (README.md:
    39-44): STFT (windowed-matmul rDFT) -> LPS -> normalize -> splice(11)+NAT
    -> flagship-net forward (keep-prob folded into the weights once) ->
    noisy-phase overlap-add ISTFT, via enhance.make_serving_decoder.

    A single dispatch costs ~30 ms of relay latency in this environment, so
    the serving number is measured the way a server would run it: a vmapped
    batch of `batch` utterances per dispatch.

    sample_rate 16000 benches the full-band 257-bin variant (3084-2048x3-257,
    the clips' native rate); head="irm" benches the mask-head flagship
    (sigmoid output + mask_floor decode).
    """
    import jax
    import jax.numpy as jnp

    from tpu_sednn.dsp.stft import StftConfig
    from tpu_sednn.enhance.decode import EnhanceConfig, make_serving_decoder
    from tpu_sednn.model import ModelConfig, init_params

    cfg_stft = StftConfig.for_rate(sample_rate)
    d = cfg_stft.n_bins
    layers = (d * 11 + d, 2048, 2048, 2048, d)
    mask_head = head in ("irm", "ibm", "psm")
    mcfg = ModelConfig(layersizes=layers, dropout_vis=0.1, dropout_hid=0.2,
                       dropout_mode="parity",
                       output="sigmoid" if mask_head else "linear")
    ecfg = EnhanceConfig(stft=cfg_stft, fea_context=11, targ_offset=5,
                         nat=True, head=head,
                         mask_floor=0.05 if mask_head else 0.0)
    params = init_params(jax.random.key(0), mcfg, scheme="glorot")
    mean = np.zeros((d,), np.float32)
    istd = np.ones((d,), np.float32)
    n = int(seconds * cfg_stft.sample_rate)
    wavs = jax.random.normal(jax.random.key(2), (batch, n), jnp.float32)

    decode = make_serving_decoder(params, mcfg, ecfg, mean, istd, quant=quant)

    out = decode(wavs)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = decode(wavs)
    _sync(out)
    dt = time.perf_counter() - t0
    audio = reps * batch * seconds
    return {
        "audio_s_per_s": audio / dt,
        "rtf": dt / audio,  # real-time factor, lower is better
        "batch": batch,
    }


def bench_decode_fused(seconds: float, reps: int, batch: int = 64,
                       sample_rate: int = 16000) -> dict:
    """Serving cost of HEAD FUSION (enhance/fusion.py): two models (PSM
    mask head + lps regression, the production pairing) blended at the
    swept alpha inside ONE jitted batched program with shared STFT work.
    Roofline expectation: ~2x a single decode's model FLOPs, < 2x wall
    (the STFT/ISTFT/overlap-add is shared)."""
    import jax
    import jax.numpy as jnp

    from tpu_sednn.dsp.stft import StftConfig
    from tpu_sednn.enhance.decode import EnhanceConfig
    from tpu_sednn.enhance.fusion import make_fused_serving_decoder
    from tpu_sednn.model import ModelConfig, init_params

    cfg_stft = StftConfig.for_rate(sample_rate)
    d = cfg_stft.n_bins
    layers = (d * 11 + d, 2048, 2048, 2048, d)
    mean = np.zeros((d,), np.float32)
    istd = np.ones((d,), np.float32)
    models = []
    for seed, head in ((0, "psm"), (1, "lps")):
        mask = head != "lps"
        mcfg = ModelConfig(layersizes=layers, dropout_vis=0.1, dropout_hid=0.2,
                           dropout_mode="parity",
                           output="sigmoid" if mask else "linear")
        ecfg = EnhanceConfig(stft=cfg_stft, fea_context=11, targ_offset=5,
                             nat=True, head=head,
                             mask_floor=0.05 if mask else 0.0)
        params = init_params(jax.random.key(seed), mcfg, scheme="glorot")
        models.append((params, mcfg, ecfg, mean, istd, None, None))
    decode = make_fused_serving_decoder(models, (0.65, 0.35))
    n = int(seconds * cfg_stft.sample_rate)
    wavs = jax.random.normal(jax.random.key(2), (batch, n), jnp.float32)
    out = decode(wavs)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = decode(wavs)
    _sync(out)
    dt = time.perf_counter() - t0
    audio = reps * batch * seconds
    return {"audio_s_per_s": audio / dt, "rtf": dt / audio, "batch": batch}


def validate_dropout(n_samples: int = 4096) -> dict:
    """TPU-executable validation of the resident kernel's hw-PRNG dropout
    (VERDICT r1 item 7) — result lands in the bench JSON line.

    1. zero-rate: the exact in-kernel mask for a grid of (bunch, layer)
       seeds must have a zero fraction within a 5-sigma binomial CI of omit;
    2. collisions: all sampled (bunch, layer) streams must be distinct
       (seed-stride collision would silently correlate masks);
    3. trajectory: training a chunk with resident hw-PRNG dropout must land
       within a few percent of the XLA threefry-dropout path on held-out
       MSE — different mask streams, same distribution.
    """
    import jax
    import jax.numpy as jnp

    from tpu_sednn.model import ModelConfig, init_params
    from tpu_sednn.ops.resident_chunk import (
        make_resident_train_chunk, sample_resident_masks,
    )
    from tpu_sednn.train import init_train_state, make_jit_train_chunk
    from tpu_sednn.train.step import OptConfig, cv_squared_error

    on_tpu = jax.default_backend() == "tpu"
    shape = (BUNCH, 2048)
    n_elem = shape[0] * shape[1]
    grid = [(b, l) for b in (0, 1, 7, 255, 799) for l in range(4)]
    zero_rate_ok = True
    worst_dev = 0.0
    sigs = set()
    for b, l in grid:
        omit = 0.1 if l == 0 else 0.2
        mask = np.asarray(sample_resident_masks(
            12345, b, l, shape, omit, interpret=not on_tpu))
        zr = 1.0 - mask.mean()
        tol = 5.0 * np.sqrt(omit * (1 - omit) / n_elem)
        worst_dev = max(worst_dev, abs(zr - omit))
        if on_tpu and abs(zr - omit) > tol:
            zero_rate_ok = False
        sigs.add(mask[:4].tobytes())
    collision_free = (len(sigs) == len(grid)) if on_tpu else True

    # trajectory: resident hw-PRNG dropout vs XLA threefry dropout
    rel = 0.0
    if on_tpu:
        cfg = ModelConfig(layersizes=LAYERS, dropout_vis=0.1, dropout_hid=0.2,
                          dropout_mode="parity", dropout_rng="tpu_prng")
        opt = OptConfig(lrate=0.2, momentum=0.5, weightcost=0.0, bunchsize=BUNCH)
        params = init_params(jax.random.key(3), cfg, scheme="glorot")
        key = jax.random.key(5)
        x = jax.random.normal(key, (n_samples, LAYERS[0]), jnp.float32) * 0.3
        proj = jax.random.normal(jax.random.fold_in(key, 1),
                                 (LAYERS[0], LAYERS[-1]), jnp.float32) * 0.05
        t = x @ proj
        st_r = make_resident_train_chunk(cfg, opt)(
            init_train_state(params), x, t, jnp.int32(17))
        st_x = make_jit_train_chunk(cfg, opt)(
            init_train_state(params), x, t, jax.random.key(17))
        e_r = float(cv_squared_error(st_r.params, x, t, cfg)) / n_samples
        e_x = float(cv_squared_error(st_x.params, x, t, cfg)) / n_samples
        rel = abs(e_r - e_x) / max(e_x, 1e-12)

    return {
        "zero_rate_ok": bool(zero_rate_ok),
        "zero_rate_worst_dev": round(float(worst_dev), 5),
        "collision_free": bool(collision_free),
        "resident_vs_xla_rel": round(float(rel), 4),
        "pass": bool(zero_rate_ok and collision_free and rel < 0.05),
        "on_tpu": bool(on_tpu),
    }


def validate_dp_dropout() -> dict:
    """TPU validation of the DP resident dropout contract (VERDICT r2 item 6)
    with only ONE physical chip: the kernel's DP mask is BY CONSTRUCTION the
    device's row-slice of the single-chip global mask (same prng_seed, same
    bits, in-kernel slice) — sample_resident_masks runs that exact kernel
    code path on hardware, so asserting (a) each device slice equals the
    corresponding rows of the full mask (stream sharing) and (b) slices are
    pairwise distinct (devices do NOT reuse each other's rows) validates the
    semantics the multi-device run inherits."""
    import jax

    from tpu_sednn.ops.resident_chunk import sample_resident_masks

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        return {"pass": None, "on_tpu": False}
    shape = (BUNCH, 2048)
    slice_ok = True
    distinct_ok = True
    invariant_ok = True
    for b, l in ((0, 1), (7, 2), (255, 0)):
        omit = 0.1 if l == 0 else 0.2
        full = np.asarray(sample_resident_masks(2024, b, l, shape, omit))
        by_ndev = {}
        for n_dev in (2, 4):
            rows = BUNCH // n_dev
            parts = []
            for d in range(n_dev):
                part = np.asarray(sample_resident_masks(
                    2024, b, l, shape, omit, device_idx=d, n_dev=n_dev))
                if not np.array_equal(part, full[d * rows:(d + 1) * rows]):
                    slice_ok = False
                parts.append(part)
            # WITHIN one device count, devices must see disjoint/distinct rows
            if len({p.tobytes() for p in parts}) != n_dev:
                distinct_ok = False
            by_ndev[n_dev] = parts
        # ACROSS device counts the streams must coincide (invariance): the
        # first device's rows at n=4 are the first half of its rows at n=2
        if not np.array_equal(by_ndev[4][0], by_ndev[2][0][:BUNCH // 4]):
            invariant_ok = False
    return {"pass": bool(slice_ok and distinct_ok and invariant_ok),
            "slice_identity": bool(slice_ok),
            "per_device_distinct": bool(distinct_ok),
            "device_count_invariant": bool(invariant_ok), "on_tpu": True}


# The driver captures only the last 2000 chars of stdout and parses the final
# JSON line; round 4's line outgrew that window and the round recorded NO
# machine-readable numbers (BENCH_r04.json parsed:false).  The emitted line is
# therefore hard-bounded: compact separators, collapsed quality summaries
# (full detail goes to artifacts/bench_detail.json), and a guard that drops
# optional keys — least important first — until the line fits.
MAX_LINE_CHARS = 1800
_DROP_ORDER = (
    "noise_generalization", "train16k_hybrid_step_ms",
    "train16k_engine_kwargs", "demo_gate",
    "stream_step_ms_block1", "stream_latency_ms_block1", "stream_rtf_block1",
    "decode_fused16k_audio_s_per_s",
    "decode_int8_audio_s_per_s", "decode_irm_audio_s_per_s",
    "speed_of_light_step_ms", "megabatch4096_audio_s_per_s",
)


def render_line(payload: dict) -> str:
    """ONE compact JSON line guaranteed to fit the driver's capture window.

    Never drops the headline keys (metric/value/unit/vs_baseline); optional
    keys fall off in _DROP_ORDER if the line is somehow too long (each drop
    is recorded under "dropped" so truncation is visible, not silent)."""
    payload = dict(payload)
    line = json.dumps(payload, separators=(",", ":"))
    dropped = []
    for key in _DROP_ORDER:
        if len(line) <= MAX_LINE_CHARS:
            break
        if key in payload:
            payload.pop(key)
            dropped.append(key)
            payload["dropped"] = dropped
            line = json.dumps(payload, separators=(",", ":"))
    if len(line) > MAX_LINE_CHARS:  # belt and braces: keep headline keys only
        payload = {k: payload[k] for k in
                   ("metric", "value", "unit", "vs_baseline") if k in payload}
        payload["dropped"] = "all_optional"
        line = json.dumps(payload, separators=(",", ":"))
    return line


def main():
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    # 10 reps: single relay round-trips jitter by ~±15%; ~0.25 s of timed
    # device work per mode amortizes it (measured spread drops under 3%)
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import jax

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}", file=sys.stderr)

    # Headline: the parity path — exact reference semantics on the exact
    # canonical workload.  On TPU it runs the VMEM-resident megakernel
    # (ops/resident_chunk.py): whole model state pinned on-chip per chunk,
    # zero per-bunch HBM weight traffic, one fused fwd+bwd+update per bunch.
    parity = bench_mode("parity", n_samples, reps)
    clean = bench_mode("clean", n_samples, reps)
    xla_parity = bench_mode("parity_xla", n_samples, reps)
    # mega-batch scaling point: the ROW-TILED resident kernel — update batch
    # 4096, streamed through the kernel in 128-row tiles with in-kernel
    # gradient accumulation (the update cost amortizes 32x; activations stay
    # one tile)
    mega = bench_mode("clean", n_samples, reps, bunch=4096,
                      res_kwargs={"tile_rows": 128})
    # 16 kHz training through the production auto-engine (resident sr_delta)
    train16k = bench_train_16k(reps=reps)
    # the f32-exact hybrid rung (hbm_spill=1), tracked beside the auto pick
    train16k_hybrid = bench_train_16k(reps=reps, engine="resident",
                                      engine_kwargs={"hbm_spill": 1})
    # on-chip streaming decode (device-state step; scan-amortized + 1-step)
    stream8 = bench_stream(block_frames=8)
    stream1 = bench_stream(block_frames=1, n_blocks=512)
    decode = bench_decode(seconds=64.0, reps=reps)
    decode_16k = bench_decode(seconds=32.0, reps=reps, sample_rate=16000)
    decode_irm = bench_decode(seconds=64.0, reps=reps, head="irm")
    # int8 serving path (model/quant.py): w8a8 dynamic quant — MEASURED no
    # throughput win vs f32 on this chip (decode is not matmul-bound,
    # BASELINE.md); tracked for regressions, accuracy gated in tests/test_quant.py
    decode_int8 = bench_decode(seconds=64.0, reps=reps, quant="int8")
    # fused 16 kHz serving (PSM x lps blend in one jitted program)
    decode_fused = bench_decode_fused(seconds=32.0, reps=reps)
    dropout_check = validate_dropout()
    dp_dropout = validate_dp_dropout()
    print(f"# train 16k (auto engine): {train16k}", file=sys.stderr)
    print(f"# stream block8: {stream8}", file=sys.stderr)
    print(f"# stream block1: {stream1}", file=sys.stderr)
    print(f"# parity (resident megakernel on TPU): {parity}", file=sys.stderr)
    print(f"# clean bf16: {clean}", file=sys.stderr)
    print(f"# parity via plain XLA: {xla_parity}", file=sys.stderr)
    print(f"# mega-batch resident (bunch 512, clean): {mega}", file=sys.stderr)
    print(f"# decode 8k lps (wav->enhanced wav, serving): {decode}", file=sys.stderr)
    print(f"# decode 16k full-band: {decode_16k}", file=sys.stderr)
    print(f"# decode irm mask-head: {decode_irm}", file=sys.stderr)
    print(f"# decode int8 (w8a8 serving): {decode_int8}", file=sys.stderr)
    print(f"# decode fused 16k (PSM x lps head fusion): {decode_fused}", file=sys.stderr)
    print(f"# dropout validation: {dropout_check}", file=sys.stderr)
    print(f"# dp dropout validation: {dp_dropout}", file=sys.stderr)

    payload = build_payload(
        parity=parity, clean=clean, xla_parity=xla_parity, mega=mega,
        train16k=train16k, stream8=stream8, stream1=stream1, decode=decode,
        decode_16k=decode_16k, decode_irm=decode_irm, decode_int8=decode_int8,
        dropout_check=dropout_check, dp_dropout=dp_dropout,
        gate_detail=(gate_detail := _demo_gate_summary()),
        gen_detail=(gen_detail := _unseen_noise_summary()),
        train16k_hybrid=train16k_hybrid, decode_fused=decode_fused)
    # Full detail (per-gate rows, mtimes, dropout sub-checks, seen/unseen/gap
    # tables) goes to an artifact next to the compact line — the line itself
    # must stay inside the driver's 2000-char stdout capture window.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "artifacts", "bench_detail.json")
    try:
        with open(detail_path, "w") as f:
            json.dump({"payload": payload, "demo_gate_detail": gate_detail,
                       "noise_generalization_detail": gen_detail,
                       "dropout_check": dropout_check,
                       "dp_dropout_check": dp_dropout}, f, indent=1)
        print(f"# full detail -> {detail_path}", file=sys.stderr)
    except OSError as e:
        print(f"# detail artifact write failed: {e}", file=sys.stderr)
    print(render_line(payload))


def build_payload(*, parity, clean, xla_parity, mega, train16k, stream8,
                  stream1, decode, decode_16k, decode_irm, decode_int8,
                  dropout_check, dp_dropout, gate_detail, gen_detail,
                  train16k_hybrid=None, decode_fused=None) -> dict:
    """The exact dict main() emits — factored out so tests can assert the
    rendered line parses and fits the driver's capture window without a TPU
    (tests/test_bench_line.py, VERDICT r4 item 1)."""
    value = parity["audio_s_per_s"]
    sol_ms = (_train_flops_per_sample() * BUNCH / (PEAK_BF16_TFLOPS * 1e12)
              * 1000.0)
    return {
        "metric": "train_audio_seconds_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(value / REF_AUDIO_S_PER_S, 2),
        "clean_bf16_audio_s_per_s": round(clean["audio_s_per_s"], 1),
        "xla_parity_audio_s_per_s": round(xla_parity["audio_s_per_s"], 1),
        "megabatch4096_audio_s_per_s": round(mega["audio_s_per_s"], 1),
        "samples_per_sec": round(parity["samples_per_sec"]),
        "step_ms": round(parity["step_ms"], 3),
        "mfu": round(parity["mfu"], 3),
        "speed_of_light_step_ms": round(sol_ms, 4),
        "decode_audio_s_per_s": round(decode["audio_s_per_s"], 1),
        "decode_16k_audio_s_per_s": round(decode_16k["audio_s_per_s"], 1),
        "decode_irm_audio_s_per_s": round(decode_irm["audio_s_per_s"], 1),
        "decode_int8_audio_s_per_s": round(decode_int8["audio_s_per_s"], 1),
        "decode_fused16k_audio_s_per_s": (round(decode_fused["audio_s_per_s"], 1)
                                          if decode_fused else None),
        "train16k_audio_s_per_s": round(train16k["audio_s_per_s"], 1),
        "train16k_step_ms": round(train16k["step_ms"], 3),
        "train16k_engine": train16k["engine"],
        "train16k_engine_kwargs": train16k["engine_kwargs"],
        "train16k_hybrid_step_ms": (round(train16k_hybrid["step_ms"], 3)
                                    if train16k_hybrid else None),
        "stream_rtf_block8": round(stream8["rtf"], 5),
        "stream_step_ms_block8": round(stream8["step_ms"], 2),
        "stream_latency_ms_block8": round(stream8["algorithmic_latency_ms"], 1),
        "stream_rtf_block1": round(stream1["rtf"], 5),
        "stream_step_ms_block1": round(stream1["step_ms"], 2),
        "stream_latency_ms_block1": round(stream1["algorithmic_latency_ms"], 1),
        "dropout_ok": dropout_check.get("pass"),
        "dp_dropout_ok": dp_dropout.get("pass"),
        "demo_gate": _demo_gate_compact(gate_detail),
        "noise_generalization": _unseen_noise_compact(gen_detail),
    }


def _demo_gate_compact(detail):
    """Collapse the 9-gate table to pass counts + worst margins (VERDICT r4
    item 1); the per-gate rows live in artifacts/bench_detail.json."""
    rows = {k: v for k, v in (detail or {}).items() if isinstance(v, dict)}
    if not rows:
        return None
    lsd = [v["min_lsd_gain_db"] for v in rows.values()
           if v.get("min_lsd_gain_db") is not None]
    stoi = [v["min_stoi_gain"] for v in rows.values()
            if v.get("min_stoi_gain") is not None]
    return {"gates_pass": sum(1 for v in rows.values() if v.get("pass")),
            "gates_total": len(rows),
            "min_lsd": round(min(lsd), 2) if lsd else None,
            "min_stoi": round(min(stoi), 4) if stoi else None}


def _unseen_noise_compact(detail):
    """gap/unseen LSD + family counts only; full seen/unseen/gap tables are
    in the detail artifact."""
    if not detail:
        return None
    out = {}
    for grp in ("unseen", "gap"):
        if detail.get(grp) and "lsd_gain" in detail[grp]:
            out[f"{grp}_lsd"] = round(detail[grp]["lsd_gain"], 2)
    for k in ("n_seen_families", "n_unseen_families"):
        if k in detail:
            out[k] = detail[k]
    return out or None


def _demo_gate_summary():
    """Quality summary from the tracked demo-gate artifacts (produced by the
    full multi-condition TPU runs; see BASELINE.md) so the round's bench
    record carries the quality gate next to the throughput number.  Each
    entry records the producing artifact's mtime and the current commit so a
    stale artifact (older than the code under benchmark) is distinguishable
    from a fresh one (ADVICE r2)."""
    import subprocess
    import time as _time

    out = {}
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                                cwd=here, capture_output=True, text=True,
                                timeout=10).stdout.strip() or None
    except Exception:
        commit = None
    for tag, fn in (("psm", "demo_gate_psm.json"), ("lps", "demo_gate.json"),
                    ("irm", "demo_gate_irm.json"), ("16k", "demo_gate_16k.json"),
                    ("psm_16k", "demo_gate_psm_16k.json"),
                    ("irm_16k", "demo_gate_irm_16k.json"),
                    ("ibm", "demo_gate_ibm.json"),
                    ("psm_reverb", "demo_gate_psm_reverb.json"),
                    ("psm_reverb25", "demo_gate_psm_reverb25.json"),
                    ("16k_r5", "demo_gate_16k_r5.json"),
                    ("fusion_16k", "demo_gate_fusion_16k.json")):
        p = os.path.join(here, "artifacts", fn)
        if not os.path.exists(p):
            continue
        d = json.load(open(p))
        gains = [d[k]["lsd_gain"] for k in ("test1", "test2", "test3") if k in d]
        stoi_gains = [d[k]["stoi_gain"] for k in ("test1", "test2", "test3")
                      if k in d]
        out[tag] = {"pass": d.get("pass"),
                    "min_lsd_gain_db": round(min(gains), 2) if gains else None,
                    "min_stoi_gain": round(min(stoi_gains), 4) if stoi_gains else None,
                    "artifact_mtime": _time.strftime(
                        "%Y-%m-%dT%H:%M:%S", _time.gmtime(os.path.getmtime(p)))}
    if out:
        out["bench_commit"] = commit
    return out


def _unseen_noise_summary():
    """Seen/unseen/gap aggregates from the tracked unseen-noise artifact
    (produced by benchmarks/run_unseen_noise.py: flagship-protocol training
    on SEEN_NOISE_KINDS only, evaluated on all families)."""
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "artifacts", "unseen_noise.json")
    if not os.path.exists(p):
        return None
    d = json.load(open(p))
    gen = d.get("noise_generalization", d)
    out = {}
    for grp in ("seen", "unseen", "gap"):
        if gen.get(grp):
            out[grp] = {k: round(float(v), 4) for k, v in gen[grp].items()}
    per_kind = gen.get("per_kind") or {}
    if per_kind:
        out["n_seen_families"] = sum(1 for v in per_kind.values() if v.get("seen"))
        out["n_unseen_families"] = sum(1 for v in per_kind.values()
                                       if not v.get("seen"))
    return out or None


if __name__ == "__main__":
    main()
