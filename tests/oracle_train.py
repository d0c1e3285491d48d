"""Independent float64 numpy oracle of ONE TRAINING UPDATE.

Forward, manual analytic backward, the exact Keras 2.2.4 optimizer
formulations (SGD velocity form, Adam with eps outside sqrt on the
uncorrected second moment) and the BatchNorm moving-statistics update
(momentum 0.99, biased batch variance) — everything the jitted train step
in `train/engine.py` must reproduce numerically.  Mirrors the reference's
training math: SGD(lr, momentum=0.9)/Adam(1e-3) at train.py:1874-1885,
l2(1e-4) kernels at train.py:1292-1293, Keras-default BN at train.py:665
and train.py:1278-1281.

Imports nothing from the framework package (pure numpy), like
oracle_c3d.py / oracle_i3d.py for the forward pass.
"""

from __future__ import annotations

import numpy as np

# ----------------------------------------------------------------------
# layer forward/backward (all float64, stride-1 SAME convs)
# ----------------------------------------------------------------------


def conv3d_same(x, w, b=None):
    """x: (B,T,H,W,Ci), w: (kt,kh,kw,Ci,Co) — SAME padding, stride 1."""
    kt, kh, kw, ci, co = w.shape
    pt, ph, pw = (kt - 1) // 2, (kh - 1) // 2, (kw - 1) // 2
    xpad = np.pad(
        x,
        (
            (0, 0),
            (pt, kt - 1 - pt),
            (ph, kh - 1 - ph),
            (pw, kw - 1 - pw),
            (0, 0),
        ),
    )
    B, T, H, W, _ = x.shape
    y = np.zeros((B, T, H, W, co), np.float64)
    for a in range(kt):
        for c in range(kh):
            for d in range(kw):
                xs = xpad[:, a : a + T, c : c + H, d : d + W, :]
                y += np.einsum("bthwi,io->bthwo", xs, w[a, c, d])
    if b is not None:
        y = y + b
    return y


def conv3d_same_bwd(x, w, dy):
    """Gradients (dx, dw, db) of conv3d_same."""
    kt, kh, kw, ci, co = w.shape
    pt, ph, pw = (kt - 1) // 2, (kh - 1) // 2, (kw - 1) // 2
    pads = (
        (0, 0),
        (pt, kt - 1 - pt),
        (ph, kh - 1 - ph),
        (pw, kw - 1 - pw),
        (0, 0),
    )
    xpad = np.pad(x, pads)
    B, T, H, W, _ = x.shape
    dxpad = np.zeros_like(xpad)
    dw = np.zeros_like(w)
    for a in range(kt):
        for c in range(kh):
            for d in range(kw):
                xs = xpad[:, a : a + T, c : c + H, d : d + W, :]
                dw[a, c, d] = np.einsum("bthwi,bthwo->io", xs, dy)
                dxpad[:, a : a + T, c : c + H, d : d + W, :] += np.einsum(
                    "bthwo,io->bthwi", dy, w[a, c, d]
                )
    dx = dxpad[
        :,
        pt : pt + T,
        ph : ph + H,
        pw : pw + W,
        :,
    ]
    db = dy.sum(axis=(0, 1, 2, 3))
    return dx, dw, db


def conv1x1_valid(x, w, b=None):
    """1×1×1 VALID projection conv, stride 1 (R3D `_shortcut3d`)."""
    y = np.einsum("bthwi,io->bthwo", x, w[0, 0, 0])
    if b is not None:
        y = y + b
    return y


def conv1x1_valid_bwd(x, w, dy):
    dw = np.zeros_like(w)
    dw[0, 0, 0] = np.einsum("bthwi,bthwo->io", x, dy)
    dx = np.einsum("bthwo,io->bthwi", dy, w[0, 0, 0])
    db = dy.sum(axis=(0, 1, 2, 3))
    return dx, dw, db


def maxpool3d_valid(x, window, strides):
    B, T, H, W, C = x.shape
    wt, wh, ww = window
    st, sh, sw = strides
    To, Ho, Wo = (T - wt) // st + 1, (H - wh) // sh + 1, (W - ww) // sw + 1
    y = np.full((B, To, Ho, Wo, C), -np.inf, np.float64)
    for a in range(wt):
        for c in range(wh):
            for d in range(ww):
                y = np.maximum(
                    y,
                    x[
                        :,
                        a : a + To * st : st,
                        c : c + Ho * sh : sh,
                        d : d + Wo * sw : sw,
                        :,
                    ],
                )
    return y


def maxpool3d_valid_bwd(x, y, dy, window, strides):
    """Routes dy to each window's argmax (unique for continuous inputs)."""
    B, To, Ho, Wo, C = y.shape
    wt, wh, ww = window
    st, sh, sw = strides
    dx = np.zeros_like(x)
    for a in range(wt):
        for c in range(wh):
            for d in range(ww):
                xs = x[
                    :,
                    a : a + To * st : st,
                    c : c + Ho * sh : sh,
                    d : d + Wo * sw : sw,
                    :,
                ]
                m = (xs == y).astype(np.float64)
                dx[
                    :,
                    a : a + To * st : st,
                    c : c + Ho * sh : sh,
                    d : d + Wo * sw : sw,
                    :,
                ] += m * dy
    return dx


def bn_train(x, params, stats, eps=1e-3, momentum=0.99):
    """Train-mode BatchNorm (Flax/Keras: biased batch variance; running
    stats ← m·ra + (1−m)·batch).  params: {'bias': β[, 'scale': γ]};
    stats: {'mean', 'var'}.  Returns (y, cache, new_stats)."""
    axes = (0, 1, 2, 3)
    n = float(np.prod([x.shape[i] for i in axes]))
    mu = x.mean(axis=axes)
    var = (x * x).mean(axis=axes) - mu * mu
    inv = 1.0 / np.sqrt(var + eps)
    xhat = (x - mu) * inv
    gamma = params.get("scale")
    y = xhat * gamma if gamma is not None else xhat
    y = y + params["bias"]
    new_stats = {
        "mean": momentum * stats["mean"] + (1.0 - momentum) * mu,
        "var": momentum * stats["var"] + (1.0 - momentum) * var,
    }
    cache = {"xhat": xhat, "inv": inv, "gamma": gamma, "n": n}
    return y, cache, new_stats


def bn_train_bwd(dy, cache):
    """Returns (dx, dparams) for bn_train."""
    xhat, inv, gamma, n = cache["xhat"], cache["inv"], cache["gamma"], cache["n"]
    axes = (0, 1, 2, 3)
    dparams = {"bias": dy.sum(axis=axes)}
    if gamma is not None:
        dparams["scale"] = (dy * xhat).sum(axis=axes)
        dxhat = dy * gamma
    else:
        dxhat = dy
    # standard batch-stat backward: dx = inv/n · (n·dxhat − Σdxhat − xhat·Σ(dxhat·xhat))
    s1 = dxhat.sum(axis=axes)
    s2 = (dxhat * xhat).sum(axis=axes)
    dx = (inv / n) * (n * dxhat - s1 - xhat * s2)
    return dx, dparams


def dense(x, w, b):
    return x @ w + b


def dense_bwd(x, w, dy):
    return dy @ w.T, x.T @ dy, dy.sum(axis=0)


def relu(x):
    return np.maximum(x, 0.0)


def relu_bwd(x, dy):
    return dy * (x > 0)


def softmax(z):
    z = z - z.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


def masked_weighted_ce(logits, labels, mask, class_weights):
    """The engine's loss (train/engine.py _make_apply_update): mean over
    VALID samples of ce·(mask·class_weight[label]).  Returns
    (loss, dlogits)."""
    p = softmax(logits)
    B, C = logits.shape
    onehot = np.zeros((B, C), np.float64)
    onehot[np.arange(B), labels] = 1.0
    ce = -np.log(p[np.arange(B), labels])
    w = mask * class_weights[labels]
    denom = max(mask.sum(), 1.0)
    loss = (ce * w).sum() / denom
    dlogits = (p - onehot) * (w / denom)[:, None]
    return loss, dlogits


# ----------------------------------------------------------------------
# Keras 2.2.4 optimizer updates (keras/optimizers.py)
# ----------------------------------------------------------------------


def keras_sgd_update(params, grads, velocity, lr, momentum=0.9):
    """v ← momentum·v − lr·g ;  p ← p + v  (velocity form)."""
    new_v = {k: momentum * velocity[k] - lr * grads[k] for k in params}
    new_p = {k: params[k] + new_v[k] for k in params}
    return new_p, new_v


def keras_adam_update(params, grads, m, v, t, lr, b1=0.9, b2=0.999, eps=1e-7):
    """Keras Adam: lr_t = lr·sqrt(1−b2^t)/(1−b1^t);
    p ← p − lr_t·m/(sqrt(v)+eps) — eps OUTSIDE sqrt, on the UNCORRECTED v.
    t is the 1-based step number of THIS update."""
    lr_t = lr * np.sqrt(1.0 - b2**t) / (1.0 - b1**t)
    new_m = {k: b1 * m[k] + (1.0 - b1) * grads[k] for k in params}
    new_v = {k: b2 * v[k] + (1.0 - b2) * grads[k] ** 2 for k in params}
    new_p = {k: params[k] - lr_t * new_m[k] / (np.sqrt(new_v[k]) + eps) for k in params}
    return new_p, new_m, new_v
