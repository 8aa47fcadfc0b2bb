"""int8 serving quantization (model/quant.py): numerical accuracy vs the f32
eval forward, and end-to-end decode quality on a real demo clip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_sednn.model.mlp import (
    ModelConfig,
    fold_eval_params,
    forward_eval,
    init_params,
)
from tpu_sednn.model.quant import (
    forward_eval_int8,
    quantize_params_int8,
)

CFG = ModelConfig(layersizes=(264, 512, 512, 65), dropout_vis=0.1,
                  dropout_hid=0.2, dropout_mode="parity")


def _setup(key):
    params = init_params(key, CFG)
    folded, eval_cfg = fold_eval_params(params, CFG)
    return params, folded, eval_cfg


def test_forward_int8_close_to_f32():
    params, folded, eval_cfg = _setup(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (128, CFG.layersizes[0]))
    ref = forward_eval(params, x, CFG)
    qp = quantize_params_int8(folded)
    out = forward_eval_int8(qp, x, eval_cfg)
    # w8a8 dynamic quant on 2 hidden layers: relative error well under 2%
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_quant_last_layer_optional():
    _, folded, eval_cfg = _setup(jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (16, CFG.layersizes[0]))
    ref = forward_eval_int8(quantize_params_int8(folded), x, eval_cfg)
    full = forward_eval_int8(quantize_params_int8(folded, quant_last=True), x, eval_cfg)
    # quantizing the head too stays in the same ballpark but differs
    rel = float(jnp.linalg.norm(full - ref) / jnp.linalg.norm(ref))
    assert 0.0 < rel < 0.05, rel


def test_quantparams_is_pytree():
    _, folded, _ = _setup(jax.random.PRNGKey(4))
    qp = quantize_params_int8(folded)
    qp2 = jax.device_put(qp)
    assert qp2.wq[0].dtype == jnp.int8
    assert qp2.wq[-1] is None and qp2.w_f32[-1].dtype == jnp.float32
    # jit through the pytree boundary
    x = jnp.ones((8, CFG.layersizes[0]), jnp.float32)
    eval_cfg = ModelConfig(layersizes=CFG.layersizes)
    out = jax.jit(lambda q, a: forward_eval_int8(q, a, eval_cfg))(qp2, x)
    assert out.shape == (8, CFG.layersizes[-1])


def test_int8_decoder_end_to_end_quality():
    """Quantized serving decode stays within a small LSD of the f32 decode
    on a real reference demo clip (the serving accuracy gate)."""
    import os

    from tpu_sednn.dsp import stft_logpower
    from tpu_sednn.dsp.stft import StftConfig
    from tpu_sednn.enhance.decode import EnhanceConfig, make_serving_decoder
    from tpu_sednn.io.wav import read_wav
    from tpu_sednn.metrics.quality import lsd

    clip = "/root/reference/enh_wav_example/test1_org_noisy.wav"
    if not os.path.exists(clip):
        pytest.skip("reference demo clips unavailable")
    wav, sr = read_wav(clip)
    wav = np.asarray(wav, np.float32)[: sr * 2]  # 2 s is plenty

    stft = StftConfig.for_rate(sr)
    d = stft.n_bins
    cfg = ModelConfig(layersizes=(d * 12, 512, 512, d), dropout_vis=0.1,
                      dropout_hid=0.2, dropout_mode="parity")
    params = init_params(jax.random.PRNGKey(7), cfg)
    enh_cfg = EnhanceConfig(stft=stft, head="lps")
    mean, istd = np.zeros(d, np.float32), np.ones(d, np.float32) * 0.1

    f32_dec = make_serving_decoder(params, cfg, enh_cfg, mean, istd)
    q_dec = make_serving_decoder(params, cfg, enh_cfg, mean, istd, quant="int8")
    batch = np.stack([wav, wav])
    ref_out = np.asarray(f32_dec(batch))
    q_out = np.asarray(q_dec(batch))
    assert ref_out.shape == q_out.shape
    d_lsd = lsd(
        np.asarray(stft_logpower(jnp.asarray(ref_out[0]), stft)),
        np.asarray(stft_logpower(jnp.asarray(q_out[0]), stft)),
    )
    assert d_lsd < 0.5, f"int8 decode diverges from f32: LSD {d_lsd:.3f} dB"
