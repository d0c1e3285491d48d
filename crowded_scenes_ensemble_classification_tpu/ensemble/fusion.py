"""Score-fusion core + the five weighting schemes.

Reference semantics (evaluate_ensemble.py):
- fusion: stack member softmax matrices (M, N, C); ndarray weights →
  `tensordot(yhats, w, axes=(0,0))` then argmax (ensemble_predictions
  :343-370); the string sentinel "MAXIMUM" → argmax over the flattened M·C
  scores mod C (:356-359).
- L1 normalize with all-zero passthrough (:282-289).
- SUM = ones (:1249-1250); VALIDATION_ERROR_INVERSE = normalized 1/min
  val-loss per member (:33-62); GRID_SEARCH = cartesian {0,0.1,…,1}^M,
  skip all-equal, L1-normalized, first-strictly-better wins (:322-339);
  DIFFERENTIAL_EVOLUTION = scipy DE, bounds [0,1], maxiter 20, tol 1e-7,
  loss = 1 − ensemble accuracy (:293-311).

TPU-first: fusion is one einsum; grid search evaluates ALL candidate
weightings in a single device pass (an (K, M) × (M, N·C) matmul + argmax)
instead of the reference's 11^M-iteration Python loop.
"""

from __future__ import annotations

import itertools
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

MAXIMUM = "MAXIMUM"
GRID_VALUES = np.round(np.arange(0.0, 1.01, 0.1), 1)


def normalize_l1(weights) -> np.ndarray:
    w = np.asarray(weights, np.float64)
    n = np.linalg.norm(w, 1)
    if n == 0.0:
        return w
    return w / n


@jax.jit
def _fuse_weighted(yhats: jax.Array, weights: jax.Array) -> jax.Array:
    summed = jnp.einsum("mnc,m->nc", yhats, weights)
    return jnp.argmax(summed, axis=-1)


@jax.jit
def _fuse_maximum(yhats: jax.Array) -> jax.Array:
    m, n, c = yhats.shape
    flat = jnp.transpose(yhats, (1, 0, 2)).reshape(n, m * c)
    return jnp.mod(jnp.argmax(flat, axis=-1), c)


def fuse_predictions(yhats, weights: Union[str, np.ndarray]) -> np.ndarray:
    """(M, N, C) member probabilities → (N,) class predictions."""
    yhats = jnp.asarray(yhats, jnp.float32)
    if isinstance(weights, str):
        if weights != MAXIMUM:
            raise ValueError(f"unknown weights sentinel {weights!r}")
        return np.asarray(_fuse_maximum(yhats))
    return np.asarray(_fuse_weighted(yhats, jnp.asarray(weights, jnp.float32)))


def ensemble_accuracy(yhats, weights, labels) -> float:
    preds = fuse_predictions(yhats, weights)
    return float(np.mean(preds == np.asarray(labels)))


def single_model_predictions(yhat: np.ndarray) -> np.ndarray:
    """(N, C) → argmax predictions (reference evaluate_single_model,
    evaluate_ensemble.py:86-100)."""
    return np.argmax(np.asarray(yhat), axis=1)


# ------------------------------------------------------------------
# Weighting schemes
# ------------------------------------------------------------------


def sum_weights(n_members: int) -> np.ndarray:
    return np.ones(n_members)


def validation_error_inverse_weights(min_val_losses: Sequence[float]) -> np.ndarray:
    """w_i = (1/min_val_loss_i) / Σ(1/min_val_loss_j)
    (evaluate_ensemble.py:33-62)."""
    inv = 1.0 / np.asarray(min_val_losses, np.float64)
    return inv / inv.sum()


def _grid_candidates(n_members: int) -> np.ndarray:
    """All {0,0.1,…,1}^M rows in itertools.product order, all-equal rows
    removed, L1-normalized — bit-matching the reference's iteration and
    skip rule (evaluate_ensemble.py:322-339)."""
    rows = []
    for combo in itertools.product(GRID_VALUES, repeat=n_members):
        if len(set(combo)) == 1:
            continue
        rows.append(normalize_l1(combo))
    return np.asarray(rows, np.float32)


@jax.jit
def _grid_scores(yhats: jax.Array, cands: jax.Array, labels: jax.Array):
    """Accuracy of every candidate weighting in one fused pass."""
    m, n, c = yhats.shape
    flat = yhats.reshape(m, n * c)
    summed = (cands @ flat).reshape(-1, n, c)  # (K, N, C) — MXU matmul
    preds = jnp.argmax(summed, axis=-1)
    return jnp.mean(preds == labels[None, :], axis=-1)


def grid_search_weights(yhats, labels) -> np.ndarray:
    """Exhaustive grid search, fully on device.  First-strictly-better
    tie-breaking matches the reference's sequential `score > best_score`
    update over itertools.product order."""
    yhats = jnp.asarray(yhats, jnp.float32)
    cands = _grid_candidates(int(yhats.shape[0]))
    scores = np.asarray(
        _grid_scores(yhats, jnp.asarray(cands), jnp.asarray(labels, jnp.int32))
    )
    best = int(np.argmax(scores))  # argmax returns FIRST max == reference rule
    return cands[best].astype(np.float64)


def differential_evolution_weights(
    yhats,
    labels,
    maxiter: int = 20,
    tol: float = 1e-7,
    seed: Optional[int] = None,
) -> np.ndarray:
    """scipy DE over the device-side accuracy (evaluate_ensemble.py:293-311).
    The reference left DE unseeded (non-reproducible); pass `seed` for
    deterministic runs."""
    from scipy.optimize import differential_evolution

    yhats_d = jnp.asarray(yhats, jnp.float32)
    labels_d = jnp.asarray(labels, jnp.int32)
    m = int(yhats_d.shape[0])

    @jax.jit
    def acc(w):
        preds = _fuse_weighted(yhats_d, w)
        return jnp.mean(preds == labels_d)

    def loss(w):
        return 1.0 - float(acc(jnp.asarray(normalize_l1(w), jnp.float32)))

    result = differential_evolution(
        loss, [(0.0, 1.0)] * m, maxiter=maxiter, tol=tol, seed=seed, disp=False
    )
    return normalize_l1(result["x"])


def compute_weights(
    scheme: str,
    n_members: int,
    *,
    yhats_trainval=None,
    labels_trainval=None,
    min_val_losses=None,
    de_seed: Optional[int] = None,
) -> Union[str, np.ndarray]:
    """Dispatch table mirroring evaluate_ensemble.py:1206-1256.  GRID_SEARCH
    and DIFFERENTIAL_EVOLUTION score candidates on train+val probabilities
    (the reference's selection set)."""
    if scheme == "SUM":
        return sum_weights(n_members)
    if scheme == "MAXIMUM":
        return MAXIMUM
    if scheme == "VALIDATION_ERROR_INVERSE":
        if min_val_losses is None:
            raise ValueError("VALIDATION_ERROR_INVERSE needs min_val_losses")
        return validation_error_inverse_weights(min_val_losses)
    if scheme == "GRID_SEARCH":
        return grid_search_weights(yhats_trainval, labels_trainval)
    if scheme == "DIFFERENTIAL_EVOLUTION":
        return differential_evolution_weights(
            yhats_trainval, labels_trainval, seed=de_seed
        )
    raise ValueError(f"unknown weighting scheme {scheme!r}")
