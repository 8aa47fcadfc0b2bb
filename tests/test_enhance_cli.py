"""Enhance CLI end-to-end + determinism of the parity trainer."""

import os

import numpy as np
import pytest

from tpu_sednn.data.mixing import mix_at_snr, synth_noise, synth_speech
from tpu_sednn.dsp import StftConfig, stft_logpower
from tpu_sednn.io import compute_norm, save_norm, write_pfile, write_wav, read_wav
from tpu_sednn.io.wts import save_wts
from tpu_sednn.tools import gen_rand_net


def test_enhance_cli_runs(tmp_path):
    import jax.numpy as jnp

    from tpu_sednn.enhance.__main__ import main

    sr = 8000
    d = StftConfig.for_rate(sr).n_bins
    context, to = 3, 1
    sizes = [d * context + d, 64, d]
    ws, bs = gen_rand_net(sizes, seed=0)
    wts = str(tmp_path / "m.wts")
    save_wts(wts, ws, bs)

    rng = np.random.default_rng(0)
    noisy = mix_at_snr(synth_speech(rng, 2 * sr, sr), synth_noise(rng, 2 * sr, "white"), 5, rng)
    lps = np.asarray(stft_logpower(jnp.asarray(noisy), StftConfig.for_rate(sr)))
    mean, istd = compute_norm(lps)
    norm = str(tmp_path / "f.norm")
    save_norm(norm, mean, istd)
    wav_in = str(tmp_path / "in.wav")
    write_wav(wav_in, noisy, sr)

    out_dir = str(tmp_path / "out")
    rc = main([out_dir, wav_in, "--wts", wts, "--norm", norm,
               "--context", str(context), "--targ-offset", str(to)])
    assert rc == 0
    out = os.path.join(out_dir, "in_enh.wav")
    y, sr2 = read_wav(out)
    assert sr2 == sr and len(y) == len(noisy) and np.isfinite(y).all()

    # streaming and int8 variants of the same decode through the CLI
    rc = main([out_dir, wav_in, "--wts", wts, "--norm", norm,
               "--context", str(context), "--targ-offset", str(to),
               "--stream", "4"])
    assert rc == 0
    y_stream, _ = read_wav(out)
    np.testing.assert_allclose(y_stream, y, atol=2e-4)
    rc = main([out_dir, wav_in, "--wts", wts, "--norm", norm,
               "--context", str(context), "--targ-offset", str(to),
               "--stream", "4", "--stream-device"])
    assert rc == 0
    y_dev, _ = read_wav(out)
    np.testing.assert_allclose(y_dev, y, atol=2e-4)
    rc = main([out_dir, wav_in, "--wts", wts, "--norm", norm,
               "--context", str(context), "--targ-offset", str(to),
               "--quant", "int8"])
    assert rc == 0
    y_q, _ = read_wav(out)
    assert np.isfinite(y_q).all() and len(y_q) == len(y)

    # wrong-rate input without --sr must fail with a pointed message
    wav16 = str(tmp_path / "in16.wav")
    write_wav(wav16, noisy, 16000)
    with pytest.raises(SystemExit, match="bins"):
        main([out_dir, wav16, "--wts", wts, "--norm", norm,
              "--context", str(context)])


def test_parity_trainer_is_deterministic(tmp_path):
    """Same seed + same files -> byte-identical output weights."""
    from tpu_sednn.cli import run_epoch
    from tpu_sednn.config import TrainFlags

    rng = np.random.default_rng(0)
    utts = [rng.standard_normal((int(rng.integers(20, 50)), 5)).astype(np.float32)
            for _ in range(8)]
    targs = [u * 0.5 for u in utts]
    fp, tp = str(tmp_path / "f.pfile"), str(tmp_path / "t.pfile")
    write_pfile(fp, utts)
    write_pfile(tp, targs)
    mean, istd = compute_norm(np.concatenate(utts))
    norm = str(tmp_path / "a.norm")
    save_norm(norm, mean, istd)

    def go(out):
        flags = TrainFlags.from_argv([
            f"fea_file={fp}", f"targ_file={tp}", f"norm_file={norm}",
            f"outwts_file={out}", "train_sent_range=0-5", "cv_sent_range=6-7",
            "fea_dim=5", "fea_context=3", "targ_offset=1", "traincache=100",
            "bunchsize=16", "init_randem_seed=99", "momentum=0.5", "lrate=0.2",
            "dropoutflag=1", "visible_omit=0.1", "hid_omit=0.2",
            "layersizes=20,32,5",
        ])
        return run_epoch(flags)

    cv_a = go(str(tmp_path / "a.wts"))
    cv_b = go(str(tmp_path / "b.wts"))
    assert cv_a == cv_b
    assert (tmp_path / "a.wts").read_bytes() == (tmp_path / "b.wts").read_bytes()


def test_serving_decoder_matches_enhance_waveform(tmp_path):
    """make_serving_decoder (keep-prob folded once, batched) must reproduce
    the per-utterance enhance_waveform path exactly."""
    import jax
    import jax.numpy as jnp

    from tpu_sednn.dsp import StftConfig
    from tpu_sednn.enhance.decode import (
        EnhanceConfig, enhance_waveform, make_serving_decoder,
    )
    from tpu_sednn.model import ModelConfig, init_params

    sr = 8000
    stft = StftConfig.for_rate(sr)
    d = stft.n_bins
    context, to = 3, 1
    mcfg = ModelConfig(layersizes=(d * context + d, 32, d),
                       dropout_vis=0.1, dropout_hid=0.2, dropout_mode="parity")
    ecfg = EnhanceConfig(stft=stft, fea_context=context, targ_offset=to, nat=True)
    params = init_params(jax.random.key(0), mcfg, scheme="glorot")

    rng = np.random.default_rng(1)
    mean = rng.standard_normal(d).astype(np.float32)
    istd = (0.5 + rng.random(d)).astype(np.float32)
    wavs = rng.standard_normal((3, sr)).astype(np.float32) * 0.1

    decode = make_serving_decoder(params, mcfg, ecfg, mean, istd)
    batch_out = np.asarray(decode(wavs))
    assert batch_out.shape == wavs.shape
    for i in range(len(wavs)):
        single = enhance_waveform(params, mcfg, ecfg, wavs[i], mean, istd)
        np.testing.assert_allclose(batch_out[i], single, rtol=1e-5, atol=1e-6)


def test_bucketed_decoder_ragged_lengths():
    """make_bucketed_decoder: ragged utterances through length buckets match
    the per-utterance decode everywhere except the trailing edge region
    (zero-padding vs utterance-edge framing + splice lookahead), order and
    lengths preserved."""
    import jax

    from tpu_sednn.dsp import StftConfig
    from tpu_sednn.enhance.decode import (
        EnhanceConfig, enhance_waveform, make_bucketed_decoder,
    )
    from tpu_sednn.model import ModelConfig, init_params

    sr = 8000
    stft = StftConfig.for_rate(sr)
    d = stft.n_bins
    mcfg = ModelConfig(layersizes=(d * 4, 32, d))
    ecfg = EnhanceConfig(stft=stft, fea_context=3, targ_offset=1, nat=True)
    params = init_params(jax.random.key(0), mcfg, scheme="glorot")
    rng = np.random.default_rng(2)
    mean = np.zeros(d, np.float32)
    istd = np.full(d, 0.3, np.float32)
    lengths = [3000, 15500, 7900, 3000, 70000]  # two buckets + one oversize
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.1 for n in lengths]

    decode_many = make_bucketed_decoder(
        params, mcfg, ecfg, mean, istd, bucket_seconds=(0.5, 2.0), batch=2)
    outs = decode_many(wavs)
    assert [o.size for o in outs] == lengths
    for w, o in zip(wavs, outs):
        ref = enhance_waveform(params, mcfg, ecfg, w, mean, istd)
        edge = stft.win_len + (ecfg.fea_context - ecfg.targ_offset) * stft.hop
        interior = max(0, w.size - edge)
        np.testing.assert_allclose(o[:interior], ref[:interior],
                                   rtol=1e-4, atol=1e-5)
        assert np.isfinite(o).all()


def test_enhance_cli_fusion(tmp_path):
    """--fuse-with: alpha=1 reproduces the primary model's decode exactly;
    an interior alpha produces a distinct finite blend; stream/quant combos
    and rate mismatches are rejected."""
    import json

    import jax.numpy as jnp

    from tpu_sednn.enhance.__main__ import main

    sr = 8000
    d = StftConfig.for_rate(sr).n_bins
    context, to = 3, 1
    sizes = [d * context + d, 64, d]
    ws, bs = gen_rand_net(sizes, seed=0)
    wts = str(tmp_path / "m.wts")
    save_wts(wts, ws, bs)

    rng = np.random.default_rng(0)
    noisy = mix_at_snr(synth_speech(rng, 2 * sr, sr),
                       synth_noise(rng, 2 * sr, "white"), 5, rng)
    lps = np.asarray(stft_logpower(jnp.asarray(noisy), StftConfig.for_rate(sr)))
    mean, istd = compute_norm(lps)
    norm = str(tmp_path / "f.norm")
    save_norm(norm, mean, istd)
    wav_in = str(tmp_path / "in.wav")
    write_wav(wav_in, noisy, sr)

    # a second trained run dir (different weights) to fuse with
    run_b = tmp_path / "run_b"
    run_b.mkdir()
    ws2, bs2 = gen_rand_net(sizes, seed=1)
    save_wts(str(run_b / "mlp.final.wts"), ws2, bs2)
    save_norm(str(run_b / "fea.norm"), mean, istd)
    (run_b / "run.json").write_text(json.dumps({
        "head": "lps", "sample_rate": sr, "fea_context": context,
        "targ_offset": to, "dropout": [0.0, 0.0], "gv_mode": "off",
        "nat": True, "mask_floor": 0.0}))

    out_dir = str(tmp_path / "out")
    base = [out_dir, wav_in, "--wts", wts, "--norm", norm,
            "--context", str(context), "--targ-offset", str(to)]
    assert main(base) == 0
    y_plain, _ = read_wav(os.path.join(out_dir, "in_enh.wav"))

    assert main(base + ["--fuse-with", str(run_b), "--fuse-alpha", "1.0"]) == 0
    y_a1, _ = read_wav(os.path.join(out_dir, "in_enh.wav"))
    np.testing.assert_allclose(y_a1, y_plain, atol=2e-4)  # wav int16 quantum

    assert main(base + ["--fuse-with", str(run_b), "--fuse-alpha", "0.5"]) == 0
    y_mix, _ = read_wav(os.path.join(out_dir, "in_enh.wav"))
    assert np.isfinite(y_mix).all()
    assert np.max(np.abs(y_mix - y_plain)) > 1e-4  # model B actually blended

    with pytest.raises(SystemExit):
        main(base + ["--fuse-with", str(run_b), "--stream", "4"])
    with pytest.raises(SystemExit):
        main(base + ["--fuse-with", str(run_b), "--quant", "int8"])
