"""Ensemble evaluators: homogeneous, global heterogeneous, combination search.

Reference behaviour being reproduced:
- homogeneous (evaluate_ensembles, evaluate_ensemble.py:1112-1273): per test
  fold t, the k−1 per-val-fold members are fused with the chosen weighting
  scheme; GRID_SEARCH / DIFFERENTIAL_EVOLUTION select weights on the
  *train+val* probability tensor (:1206-1248); per-member accuracies are
  recorded alongside; predictions go to
  `weighted_prediction_results_{name}.csv` (:1266-1268) and learned weights
  to `.npy` (:1270-1272).
- global heterogeneous (global_evaluate_ensembles :1329-1474): concat the
  (k−1) member tensors of every architecture config and fuse with equal
  weights `ones(M·(k−1))` (:1455); returns mean accuracy over folds (:1474).
- combination search (combine_ensembles :1298-1326 + compute_combinations
  :1280-1295): every non-empty subset of the config list, global-evaluated,
  sorted by mean accuracy.

Data flows through probability tensors (probability_store), not model
re-execution: the evaluators are pure fusion math and run in milliseconds.
"""

from __future__ import annotations

import dataclasses
import itertools
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import pandas as pd

from .fusion import (
    MAXIMUM,
    compute_weights,
    ensemble_accuracy,
    fuse_predictions,
    single_model_predictions,
)

# (test_index, subset) -> {"probs": (M, N, C), "labels": (N,)}
ProbProvider = Callable[[int, str], Dict[str, np.ndarray]]


@dataclasses.dataclass
class FoldResult:
    test_index: int
    accuracy: float
    predictions: np.ndarray
    weights: Union[str, np.ndarray]
    member_accuracies: List[float]


@dataclasses.dataclass
class EnsembleResults:
    name: str
    scheme: str
    folds: List[FoldResult]

    @property
    def mean_accuracy(self) -> float:
        return float(np.mean([f.accuracy for f in self.folds]))

    def predictions_dataframe(self) -> pd.DataFrame:
        rows = [
            {
                "path": f"Ensemble_{self.name}_split_test{f.test_index}",
                "predictions": repr(np.asarray(f.predictions).tolist()),
            }
            for f in self.folds
        ]
        return pd.DataFrame(rows, columns=["path", "predictions"])

    def save_predictions_csv(self, results_folder: str) -> str:
        os.makedirs(results_folder, exist_ok=True)
        path = os.path.join(
            results_folder, f"weighted_prediction_results_{self.name}.csv"
        )
        self.predictions_dataframe().to_csv(path, index=False)
        return path

    def save_weights_npy(self, results_folder: str) -> Optional[str]:
        if self.scheme not in ("GRID_SEARCH", "DIFFERENTIAL_EVOLUTION"):
            return None
        os.makedirs(results_folder, exist_ok=True)
        path = os.path.join(results_folder, f"{self.scheme}_{self.name}.npy")
        np.save(path, np.stack([np.asarray(f.weights) for f in self.folds]))
        return path


def evaluate_ensembles(
    prob_provider: ProbProvider,
    folds_number: int,
    scheme: str,
    name: str = "ensemble",
    min_val_losses_provider: Optional[Callable[[int], Sequence[float]]] = None,
    de_seed: Optional[int] = None,
    precomputed_weights: Optional[np.ndarray] = None,
) -> EnsembleResults:
    """Homogeneous k-fold ensemble evaluation."""
    folds: List[FoldResult] = []
    for t in range(folds_number):
        test = prob_provider(t, "test")
        probs, labels = test["probs"], test["labels"]
        m = probs.shape[0]

        if precomputed_weights is not None:
            weights = precomputed_weights[t]
        elif scheme in ("GRID_SEARCH", "DIFFERENTIAL_EVOLUTION"):
            trainval = prob_provider(t, "train_val")
            weights = compute_weights(
                scheme,
                m,
                yhats_trainval=trainval["probs"],
                labels_trainval=trainval["labels"],
                de_seed=de_seed,
            )
        elif scheme == "VALIDATION_ERROR_INVERSE":
            weights = compute_weights(
                scheme, m, min_val_losses=min_val_losses_provider(t)
            )
        else:
            weights = compute_weights(scheme, m)

        preds = fuse_predictions(probs, weights)
        acc = float(np.mean(preds == labels))
        member_accs = [
            float(np.mean(single_model_predictions(probs[i]) == labels))
            for i in range(m)
        ]
        folds.append(FoldResult(t, acc, preds, weights, member_accs))
    return EnsembleResults(name=name, scheme=scheme, folds=folds)


# ------------------------------------------------------------------
# Global (heterogeneous) ensembles
# ------------------------------------------------------------------


def global_evaluate_ensembles(
    prob_providers: Dict[str, ProbProvider],
    folds_number: int,
    name: str = "global",
) -> EnsembleResults:
    """Equal-weight fusion of ALL members of every config
    (evaluate_ensemble.py:1329-1474)."""
    folds: List[FoldResult] = []
    for t in range(folds_number):
        tensors, labels = [], None
        for cfg_name, provider in prob_providers.items():
            d = provider(t, "test")
            tensors.append(d["probs"])
            if labels is None:
                labels = d["labels"]
            elif not np.array_equal(labels, d["labels"]):
                raise ValueError(
                    f"label mismatch between configs on test fold {t} "
                    f"(config {cfg_name})"
                )
        probs = np.concatenate(tensors, axis=0)
        weights = np.ones(probs.shape[0])
        preds = fuse_predictions(probs, weights)
        acc = float(np.mean(preds == labels))
        folds.append(FoldResult(t, acc, preds, weights, []))
    res = EnsembleResults(name=name, scheme="SUM", folds=folds)
    return res


def save_global_predictions_csv(results: EnsembleResults, results_folder: str) -> str:
    """`global_ensemble_summed_prediction_results_… .csv`
    (evaluate_ensemble.py:1468-1471)."""
    os.makedirs(results_folder, exist_ok=True)
    path = os.path.join(
        results_folder,
        f"global_ensemble_summed_prediction_results_{results.name}.csv",
    )
    results.predictions_dataframe().to_csv(path, index=False)
    return path


def compute_combinations(items: Sequence[str]) -> List[Tuple[str, ...]]:
    """All non-empty subsets, shortest first (evaluate_ensemble.py:1280-1295)."""
    out: List[Tuple[str, ...]] = []
    for r in range(1, len(items) + 1):
        out.extend(itertools.combinations(items, r))
    return out


def combine_ensembles(
    prob_providers: Dict[str, ProbProvider],
    folds_number: int,
) -> List[Tuple[Tuple[str, ...], float]]:
    """Global-evaluate every subset; return [(subset, mean_acc)] sorted by
    accuracy descending (evaluate_ensemble.py:1298-1326)."""
    results = []
    for subset in compute_combinations(list(prob_providers.keys())):
        sub = {k: prob_providers[k] for k in subset}
        res = global_evaluate_ensembles(sub, folds_number, name="+".join(subset))
        results.append((subset, res.mean_accuracy))
    results.sort(key=lambda x: x[1], reverse=True)
    return results
