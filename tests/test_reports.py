"""Reporting math unit tests (rendering covered by test_end_to_end)."""

import numpy as np
import pytest

from crowded_scenes_ensemble_classification_tpu.reports import (
    CROWD11_CLASS_NAMES,
    agreement_histogram,
    confusion_matrix,
    difference_matrix,
    members_correct_per_clip,
    per_fold_confusions,
    row_normalize,
)


def test_confusion_matrix_counts():
    labels = [0, 0, 1, 2, 2, 2]
    preds = [0, 1, 1, 2, 2, 0]
    cm = confusion_matrix(labels, preds, 3)
    assert cm[0, 0] == 1 and cm[0, 1] == 1
    assert cm[1, 1] == 1
    assert cm[2, 2] == 2 and cm[2, 0] == 1
    assert cm.sum() == 6


def test_row_normalize_handles_empty_rows():
    cm = np.array([[2, 2], [0, 0]])
    norm = row_normalize(cm)
    np.testing.assert_allclose(norm[0], [0.5, 0.5])
    np.testing.assert_allclose(norm[1], [0.0, 0.0])  # no division blowup


def test_difference_matrix():
    ens = np.array([[0.9, 0.1], [0.2, 0.8]])
    mem = np.array([[0.7, 0.3], [0.4, 0.6]])
    d = difference_matrix(ens, mem)
    np.testing.assert_allclose(d, [[0.2, -0.2], [-0.2, 0.2]])


def test_per_fold_confusions_shapes():
    rng = np.random.default_rng(0)
    labels = [rng.integers(0, 4, 20) for _ in range(3)]
    preds = [rng.integers(0, 4, 20) for _ in range(3)]
    cms = per_fold_confusions(labels, preds, 4)
    assert len(cms) == 3
    for cm in cms:
        assert cm.shape == (4, 4)
        assert (cm <= 1.0).all() and (cm >= 0.0).all()


def test_members_correct_and_histogram():
    # 3 members, 4 clips, 2 classes
    probs = np.zeros((3, 4, 2))
    probs[:, :, 0] = 1.0  # all members predict class 0
    probs[0, 1, :] = [0.0, 1.0]  # member 0 predicts class 1 on clip 1
    labels = np.array([0, 0, 1, 0])
    counts = members_correct_per_clip(probs, labels)
    np.testing.assert_array_equal(counts, [3, 2, 0, 3])
    hist = agreement_histogram(counts, 3)
    np.testing.assert_array_equal(hist, [1, 0, 1, 2])


def test_crowd11_class_names():
    assert len(CROWD11_CLASS_NAMES) == 11
