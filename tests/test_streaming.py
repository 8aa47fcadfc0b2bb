"""Streaming enhancer (enhance/streaming.py): sample-exact equality with the
offline decode for arbitrary chunkings, plus API contract checks."""

import jax
import numpy as np
import pytest

from tpu_sednn.dsp.stft import StftConfig
from tpu_sednn.enhance.decode import EnhanceConfig, enhance_waveform
from tpu_sednn.enhance.streaming import StreamingEnhancer
from tpu_sednn.model.mlp import ModelConfig, init_params

SR = 8000
STFT = StftConfig.for_rate(SR)
D = STFT.n_bins


def _model(head="lps", seed=0):
    cfg = ModelConfig(layersizes=(D * 12, 256, 256, D), dropout_vis=0.1,
                      dropout_hid=0.2, dropout_mode="parity",
                      output="sigmoid" if head in ("irm", "ibm") else "linear")
    return init_params(jax.random.PRNGKey(seed), cfg), cfg


def _wav(n, seed=1):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    return (0.3 * np.sin(2 * np.pi * 440 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
            + 0.05 * rng.standard_normal(n)).astype(np.float32)


MEAN = np.zeros(D, np.float32)
ISTD = np.full(D, 0.2, np.float32)


def _chunks(x, sizes_seed):
    rng = np.random.default_rng(sizes_seed)
    chunks, i = [], 0
    while i < len(x):
        n = int(rng.integers(1, 900))
        chunks.append(x[i : i + n])
        i += n
    return chunks


@pytest.mark.parametrize("block_frames", [1, 8])
def test_streaming_matches_offline_lps(block_frames):
    params, cfg = _model()
    ecfg = EnhanceConfig(stft=STFT, head="lps", min_gain_db=-10.0, max_gain_db=0.0)
    wav = _wav(SR * 2 + 517)
    ref = enhance_waveform(params, cfg, ecfg, wav, MEAN, ISTD)
    se = StreamingEnhancer(params, cfg, ecfg, MEAN, ISTD, block_frames=block_frames)
    outs = [se.push(c) for c in _chunks(wav, 3)]
    outs.append(se.flush())
    got = np.concatenate(outs)
    assert got.shape == ref.shape
    assert float(np.max(np.abs(got - ref))) < 5e-5


def test_streaming_matches_offline_irm_with_target_norm():
    params, cfg = _model(head="irm", seed=4)
    ecfg = EnhanceConfig(stft=STFT, head="irm", mask_floor=0.05)
    tn = (np.full(D, 0.3, np.float32), np.full(D, 0.7, np.float32))
    wav = _wav(SR + 129, seed=9)
    ref = enhance_waveform(params, cfg, ecfg, wav, MEAN, ISTD, target_norm=tn)
    se = StreamingEnhancer(params, cfg, ecfg, MEAN, ISTD, target_norm=tn)
    got = np.concatenate([se.push(c) for c in _chunks(wav, 11)] + [se.flush()])
    assert got.shape == ref.shape
    assert float(np.max(np.abs(got - ref))) < 5e-5


def test_streaming_int8_close_to_f32_stream():
    params, cfg = _model(seed=6)
    ecfg = EnhanceConfig(stft=STFT, head="lps")
    wav = _wav(SR, seed=12)
    f32 = StreamingEnhancer(params, cfg, ecfg, MEAN, ISTD)
    q8 = StreamingEnhancer(params, cfg, ecfg, MEAN, ISTD, quant="int8")
    a = np.concatenate([f32.push(wav), f32.flush()])
    b = np.concatenate([q8.push(wav), q8.flush()])
    err = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-12)
    assert err < 0.05, err


def test_streaming_rejects_global_options():
    params, cfg = _model()
    with pytest.raises(ValueError):
        StreamingEnhancer(params, cfg,
                          EnhanceConfig(stft=STFT, gv_mode="global"), MEAN, ISTD)
    with pytest.raises(ValueError):
        StreamingEnhancer(params, cfg,
                          EnhanceConfig(stft=STFT, mask_smooth=5), MEAN, ISTD)


def test_streaming_latency_and_progressivity():
    """Output must begin well before the stream ends, within the documented
    latency bound, and reset() must rearm the instance."""
    params, cfg = _model()
    ecfg = EnhanceConfig(stft=STFT, head="lps")
    se = StreamingEnhancer(params, cfg, ecfg, MEAN, ISTD, block_frames=1)
    bound = se.algorithmic_latency_samples
    # NAT warmup needs nat_frames full windows on top of the bound
    warmup = (ecfg.nat_frames - 1) * STFT.hop + STFT.win_len
    wav = _wav(SR * 2)
    got_first_at = None
    fed = 0
    outs = []
    for i in range(0, len(wav), 160):
        out = se.push(wav[i : i + 160])
        fed += len(wav[i : i + 160])
        outs.append(out)
        if got_first_at is None and out.size:
            got_first_at = fed
    assert got_first_at is not None and got_first_at <= bound + warmup
    outs.append(se.flush())
    assert sum(o.size for o in outs) == len(wav)
    with pytest.raises(RuntimeError):
        se.push(wav[:10])
    se.reset()
    ref = enhance_waveform(params, cfg, ecfg, wav, MEAN, ISTD)
    got2 = np.concatenate([se.push(wav), se.flush()])
    assert float(np.max(np.abs(got2 - ref))) < 5e-5


def test_streaming_matches_offline_16k():
    """Full-band 257-bin config (the clips' native rate)."""
    sr16 = 16000
    stft16 = StftConfig.for_rate(sr16)
    d16 = stft16.n_bins
    cfg = ModelConfig(layersizes=(d16 * 12, 128, d16))
    params = init_params(jax.random.PRNGKey(8), cfg)
    ecfg = EnhanceConfig(stft=stft16, head="lps")
    mean16 = np.zeros(d16, np.float32)
    istd16 = np.full(d16, 0.2, np.float32)
    wav = _wav(sr16 + 333, seed=21)
    ref = enhance_waveform(params, cfg, ecfg, wav, mean16, istd16)
    se = StreamingEnhancer(params, cfg, ecfg, mean16, istd16)
    got = np.concatenate([se.push(c) for c in _chunks(wav, 5)] + [se.flush()])
    assert got.shape == ref.shape
    assert float(np.max(np.abs(got - ref))) < 5e-5


def test_streaming_short_stream():
    """A stream shorter than one analysis window yields silence of equal
    length (no frames exist to decode)."""
    params, cfg = _model()
    se = StreamingEnhancer(params, cfg, EnhanceConfig(stft=STFT), MEAN, ISTD)
    out1 = se.push(np.zeros(100, np.float32))
    out2 = se.flush()
    assert out1.size + out2.size == 100


# ---------------------------------------------------------------------------
# DeviceStreamingEnhancer: rolling state in device arrays inside one jitted
# step (the on-chip streaming path)
# ---------------------------------------------------------------------------

from tpu_sednn.enhance.streaming import DeviceStreamingEnhancer


@pytest.mark.parametrize("block_frames", [1, 8])
def test_device_streaming_matches_offline(block_frames):
    params, cfg = _model()
    ecfg = EnhanceConfig(stft=STFT, head="lps", min_gain_db=-10.0, max_gain_db=0.0)
    wav = _wav(SR * 2 + 517)
    ref = enhance_waveform(params, cfg, ecfg, wav, MEAN, ISTD)
    se = DeviceStreamingEnhancer(params, cfg, ecfg, MEAN, ISTD,
                                 block_frames=block_frames)
    outs = [se.push(c) for c in _chunks(wav, 3)]
    outs.append(se.flush())
    got = np.concatenate(outs)
    assert got.shape == ref.shape
    assert float(np.max(np.abs(got - ref))) < 5e-5


def test_device_streaming_matches_host_streaming_masks():
    """Mask head + target-norm plumbing through the device step."""
    params, cfg = _model(head="irm", seed=4)
    ecfg = EnhanceConfig(stft=STFT, head="irm", mask_floor=0.05)
    tn = (np.full(D, 0.3, np.float32), np.full(D, 0.7, np.float32))
    wav = _wav(SR + 129, seed=9)
    host = StreamingEnhancer(params, cfg, ecfg, MEAN, ISTD, target_norm=tn)
    dev = DeviceStreamingEnhancer(params, cfg, ecfg, MEAN, ISTD, target_norm=tn)
    a = np.concatenate([host.push(wav), host.flush()])
    b = np.concatenate([dev.push(wav), dev.flush()])
    assert a.shape == b.shape
    assert float(np.max(np.abs(a - b))) < 5e-5


def test_device_streaming_scan_blocks_equals_push():
    """N steps inside one lax.scan == N sequential push blocks."""
    params, cfg = _model(seed=2)
    ecfg = EnhanceConfig(stft=STFT, head="lps")
    wav = _wav(SR * 2, seed=13)
    B = 8
    step_in = B * STFT.hop

    se1 = DeviceStreamingEnhancer(params, cfg, ecfg, MEAN, ISTD, block_frames=B)
    se2 = DeviceStreamingEnhancer(params, cfg, ecfg, MEAN, ISTD, block_frames=B)
    # feed exactly prime + 2 whole step blocks so the internal buffer drains
    prime = se1._n_prime + 2 * step_in
    out1_head = se1.push(wav[:prime])
    out2_head = se2.push(wav[:prime])
    np.testing.assert_array_equal(out1_head, out2_head)
    rest = wav[prime:]
    n_blocks = rest.size // step_in
    blocks = rest[: n_blocks * step_in].reshape(n_blocks, step_in)
    assert n_blocks >= 5

    push_out = np.concatenate([se1.push(b) for b in blocks])
    scan_out = se2.scan_blocks(blocks)
    assert scan_out.shape == (n_blocks, step_in)
    np.testing.assert_allclose(scan_out.ravel(), push_out, atol=1e-6)
    # state advanced identically: flushing both gives identical tails
    tail_rest = rest[n_blocks * step_in :]
    a = np.concatenate([se1.push(tail_rest), se1.flush()])
    b = np.concatenate([se2.push(tail_rest), se2.flush()])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_device_streaming_short_stream_fallback():
    """Streams too short to prime fall back to the host path: same output."""
    params, cfg = _model()
    ecfg = EnhanceConfig(stft=STFT)
    for n in (100, 700, 1200):
        wav = _wav(n, seed=n)
        host = StreamingEnhancer(params, cfg, ecfg, MEAN, ISTD)
        dev = DeviceStreamingEnhancer(params, cfg, ecfg, MEAN, ISTD)
        a = np.concatenate([host.push(wav), host.flush()])
        b = np.concatenate([dev.push(wav), dev.flush()])
        assert a.shape == b.shape == (n,)
        np.testing.assert_allclose(a, b, atol=5e-5)


def test_device_streaming_guards():
    params, cfg = _model()
    # zero lookahead unsupported on the device path
    with pytest.raises(ValueError, match="lookahead"):
        DeviceStreamingEnhancer(params, cfg,
                                EnhanceConfig(stft=STFT, fea_context=11,
                                              targ_offset=10), MEAN, ISTD)
    se = DeviceStreamingEnhancer(params, cfg, EnhanceConfig(stft=STFT), MEAN, ISTD)
    with pytest.raises(RuntimeError, match="primed"):
        se.scan_blocks(np.zeros((2, 8 * STFT.hop), np.float32))
