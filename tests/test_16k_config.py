"""The 257-bin / 16 kHz configuration (BASELINE.json config[0] analog):
sigmoid hiddens, 257-bin LPS mapping, CPU-runnable."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_sednn.data import build_training_arrays
from tpu_sednn.data.mixing import synth_corpus
from tpu_sednn.dsp import StftConfig, stft_logpower
from tpu_sednn.io import compute_norm
from tpu_sednn.model import ModelConfig, init_params
from tpu_sednn.train import init_train_state
from tpu_sednn.train.loop import train_epochs_arrays
from tpu_sednn.train.step import OptConfig
from tpu_sednn.utils.logging import Logger


def test_257bin_sigmoid_config_trains():
    sr = 16000
    cfg_stft = StftConfig.for_rate(sr)
    assert cfg_stft.n_bins == 257
    cleans, noisys = synth_corpus(0, 10, sr=sr, min_s=0.8, max_s=1.5,
                                  snrs=(5.0,), noise_kinds=("white",))
    clps = [np.asarray(stft_logpower(jnp.asarray(c), cfg_stft)) for c in cleans]
    nlps = [np.asarray(stft_logpower(jnp.asarray(n), cfg_stft)) for n in noisys]
    mean, istd = compute_norm(np.concatenate(nlps))
    tm, tis = compute_norm(np.concatenate(clps))
    # the sigmoid-net config trains WITHOUT NAT (the pre-NAT .bak variant)
    x, t = build_training_arrays(nlps, clps, 3, 1, nat=False, mean=mean,
                                 inv_std=istd, targ_mean=tm, targ_inv_std=tis)
    ncv = len(x) // 8
    mcfg = ModelConfig(layersizes=(257 * 3, 256, 257), hidden="sigmoid")
    st = init_train_state(init_params(jax.random.key(0), mcfg, "glorot"))
    sched = lambda e: OptConfig(lrate=3.0, momentum=0.5, weightcost=0.0, bunchsize=64)
    st, res = train_epochs_arrays(st, mcfg, sched, x[:-ncv], t[:-ncv],
                                  x[-ncv:], t[-ncv:], n_epochs=6, seed=1,
                                  traincache=len(x), logger=Logger(stream=None))
    assert res[-1].cv_mse < res[0].cv_mse, [r.cv_mse for r in res]
    assert np.isfinite(res[-1].cv_mse)
