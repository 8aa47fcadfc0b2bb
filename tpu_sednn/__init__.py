"""tpu_sednn — TPU-native speech-enhancement DNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
yongxuUSTC/DNN-for-speech-enhancement (CUDA `BPtrain` + Perl recipe + offline
Perl/Matlab tooling): regression DNNs mapping noisy log-power-spectrum (LPS)
frames (context splicing + noise-aware-training estimate) to clean LPS or
IRM/IBM mask targets, with on-device feature extraction, fused training steps,
and data-parallel scaling over TPU meshes.

Subpackages
-----------
io        byte-exact codecs for the reference file formats (pfile/.wts/.norm/HTK/wav)
dsp       framing, STFT, log-power spectrum, overlap-add ISTFT
data      input pipeline: chunk planning, splicing, NAT, noise mixing
model     MLP definition, init schemes, dropout semantics
train     fused train/eval steps (reference-parity + clean modes), epoch loop
parallel  device mesh + sharding (DP over ICI; optional model axis)
enhance   decode: forward pass + noisy-phase overlap-add reconstruction
ops       Pallas TPU kernels (fused MLP layer chain, matmul STFT)
metrics   CV-MSE, STOI/SegSNR/LSD quality metrics, throughput accounting
recipes   epoch-schedule drivers replacing the Perl recipe
tools     gen_rand_net / extend_net / weight exporters
"""

__version__ = "0.1.0"

import os as _os

# Platform override for the CLI tools: this environment's sitecustomize pins
# jax_platforms to the TPU plugin, which (a) the JAX_PLATFORMS env var cannot
# undo and (b) makes every tool invocation claim the (single) chip — offline
# tools like make_pfile/netgen/lenscp then fail or block whenever a training
# process holds it.  TPU_SEDNN_PLATFORM=cpu forces the CPU backend in-process
# before first backend use (the only mechanism that works here).
_plat = _os.environ.get("TPU_SEDNN_PLATFORM")
if _plat:
    import jax as _jax

    try:  # the override only works BEFORE first backend use; detect and warn
        from jax._src import xla_bridge as _xb

        _initialized = _xb.backends_are_initialized()
    except Exception:  # pragma: no cover - private-API drift across versions
        _initialized = False
    if _initialized:
        import warnings as _warnings

        _warnings.warn(
            f"TPU_SEDNN_PLATFORM={_plat!r} is set, but a JAX backend was "
            "already initialized before `import tpu_sednn`; the platform "
            "override has NO effect. Import tpu_sednn before any JAX "
            "computation (or start a fresh process).",
            RuntimeWarning,
            stacklevel=2,
        )
    else:
        _jax.config.update("jax_platforms", _plat)
del _os, _plat
