"""Literal NumPy transcription of the reference's fused train/cv bunch.

This is the test oracle for the parity-mode JAX step: a direct, loop-faithful
re-statement of BP_GPU::train_bunch_single (/root/reference/BP_GPU.cu:484-673)
and cv_bunch_single (:676-773) in row-major numpy, written from the math (not
copied code).  Weight convention: W[l] has shape (prev, cur), y = x @ W + b.
"""

from __future__ import annotations

import numpy as np


def act(name, x):
    if name == "relu":
        return np.maximum(x, 0.0)
    if name == "sigmoid":
        return 1.0 / (1.0 + np.exp(-x))
    raise ValueError(name)


def dact(name, y):
    # derivative expressed in terms of the activation output, as the
    # reference does (DevDsigmoid on layer_y: BP_GPU.cu:614-615)
    if name == "relu":
        return (y > 0).astype(y.dtype)
    if name == "sigmoid":
        return y * (1.0 - y)
    raise ValueError(name)


def train_bunch(ws, bs, dws, dbs, x, t, lrate, momentum, weightcost,
                hidden="relu", masks=None):
    """One bunch; mutates nothing, returns (ws, bs, dws, dbs) updated copies.

    masks: optional list of per-layer 0/1 dropout masks applied to each
    layer's input (mask[0] on x, mask[l] on hidden activation l), no rescale.
    """
    L = len(ws)
    n = x.shape[0]

    # forward
    ys = []  # layer inputs actually fed to each GEMM (post-dropout)
    h = x.astype(np.float32)
    for l in range(L):
        if masks is not None and masks[l] is not None:
            h = h * masks[l]
        ys.append(h)
        z = h @ ws[l] + bs[l]
        if l < L - 1:
            h = act(hidden, z)
        else:
            h = z  # linear output head (BP_GPU.cu:570)
    out = h

    # backward
    new_ws, new_bs, new_dws, new_dbs = list(ws), list(bs), list(dws), list(dbs)
    dedx = (2.0 / n) * (out - t)  # kernSubClean
    for l in range(L - 1, -1, -1):
        g_w = ys[l].T @ dedx            # SgemmNT: raw sum over bunch
        g_b = dedx.sum(axis=0)          # DevAccSumrow
        if l > 0:
            dedy = dedx @ ws[l].T       # SgemmTN (uses pre-update weights)
            # dact is evaluated on the MASKED activation, exactly like the
            # reference (layer_y was masked in place, BP_GPU.cu:536-551);
            # for 0/1 masks this equals the true chain rule through the mask.
            dedx = dact(hidden, ys[l]) * dedy
        new_dws[l] = momentum * dws[l] - (1.0 - momentum) * lrate * (g_w / n + weightcost * ws[l])
        new_ws[l] = ws[l] + new_dws[l]
        new_dbs[l] = momentum * dbs[l] - (1.0 - momentum) * lrate * (g_b / n)
        new_bs[l] = bs[l] + new_dbs[l]
    return new_ws, new_bs, new_dws, new_dbs


def cv_forward(ws, bs, x, hidden="relu", dropout=None):
    """Inference with parity weight-scaling (cv_bunch_single BP_GPU.cu:726-746).

    dropout: None or (visible_omit, hid_omit).
    """
    L = len(ws)
    h = x.astype(np.float32)
    for l in range(L):
        w = ws[l]
        if dropout is not None:
            keep = (1.0 - dropout[0]) if l == 0 else (1.0 - dropout[1])
            w = w * keep
        z = h @ w + bs[l]
        h = act(hidden, z) if l < L - 1 else z
    return h
